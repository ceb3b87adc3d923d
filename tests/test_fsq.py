import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mqgan_tpu.quant.fsq import (
    FSQ,
    FSQSpec,
    bound,
    codes_to_indices,
    implicit_codebook,
    indices_to_codes,
    indices_to_level_indices,
    quantize,
    round_ste,
)

SPEC = FSQSpec(levels=(8, 5, 5, 5))


def test_spec_basics():
    assert SPEC.codebook_dim == 4
    assert SPEC.codebook_size == 1000  # reference configs: 8*5*5*5
    np.testing.assert_array_equal(SPEC.basis, [1, 8, 40, 200])
    np.testing.assert_array_equal(SPEC.half_width, [4, 2, 2, 2])


def test_bound_matches_reference_formula(rng):
    """bound(z) = tanh(z + shift) * half_l - offset (quantizer.py:109-114)."""
    z = rng.standard_normal((16, 4)).astype(np.float32)
    lv = np.array([8, 5, 5, 5], np.float32)
    eps = 1e-3
    half_l = (lv - 1) * (1 + eps) / 2
    offset = np.where(lv % 2 == 0, 0.5, 0.0)
    shift = np.arctanh(offset / half_l)
    want = np.tanh(z + shift) * half_l - offset
    np.testing.assert_allclose(np.asarray(bound(jnp.asarray(z), SPEC.levels)), want, atol=1e-5)


def test_quantize_on_grid_and_range(rng):
    z = (rng.standard_normal((32, 7, 4)) * 3).astype(np.float32)
    q = np.asarray(quantize(jnp.asarray(z), SPEC))
    half = SPEC.half_width
    # codes are on the grid: q * half integer-valued
    np.testing.assert_allclose(q * half, np.round(q * half), atol=1e-5)
    # even levels: values in {-4,...,3}/4 shifted grid; all |q| <= 1
    assert np.abs(q).max() <= 1.0 + 1e-6


def test_index_roundtrip():
    idx = jnp.arange(SPEC.codebook_size)
    codes = indices_to_codes(idx, SPEC)
    back = codes_to_indices(codes, SPEC)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(idx))

    cb = implicit_codebook(SPEC)
    assert cb.shape == (1000, 4)
    np.testing.assert_allclose(cb, np.asarray(codes), atol=1e-6)

    lvl = np.asarray(indices_to_level_indices(jnp.asarray([0, 1, 8, 999]), SPEC))
    np.testing.assert_array_equal(lvl[0], [0, 0, 0, 0])
    np.testing.assert_array_equal(lvl[1], [1, 0, 0, 0])
    np.testing.assert_array_equal(lvl[2], [0, 1, 0, 0])
    np.testing.assert_array_equal(lvl[3], [7, 4, 4, 4])


def test_quantize_then_pack_consistent(rng):
    z = (rng.standard_normal((8, 16, 4)) * 2).astype(np.float32)
    q = quantize(jnp.asarray(z), SPEC)
    idx = codes_to_indices(q, SPEC)
    assert int(jnp.min(idx)) >= 0 and int(jnp.max(idx)) < 1000
    q2 = indices_to_codes(idx, SPEC)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q2), atol=1e-5)


def test_ste_gradient_passthrough():
    """d quantize / dz == d (bound(z)/half) / dz — the round is transparent
    (reference round_ste, quantizer.py:39-42)."""
    z = jnp.asarray(np.linspace(-2, 2, 12).reshape(3, 4).astype(np.float32))

    def f_q(z):
        return jnp.sum(quantize(z, SPEC) ** 2 * 0.5 + quantize(z, SPEC))

    def f_b(z):
        b = bound(z, SPEC.levels) / jnp.asarray(SPEC.half_width)
        q = jax.lax.stop_gradient(quantize(z, SPEC) - b) + b
        return jnp.sum(q ** 2 * 0.5 + q)

    g_q = jax.grad(f_q)(z)
    g_b = jax.grad(f_b)(z)
    np.testing.assert_allclose(np.asarray(g_q), np.asarray(g_b), atol=1e-5)
    assert np.abs(np.asarray(g_q)).max() > 0


def test_round_ste_grad_identity():
    g = jax.grad(lambda z: jnp.sum(round_ste(z) * 3.0))(jnp.ones((4,)) * 0.3)
    np.testing.assert_allclose(np.asarray(g), 3.0 * np.ones(4), atol=1e-6)


def test_noise_dropout_paths(rng):
    spec = FSQSpec(levels=(8, 5, 5, 5), noise_dropout=1.0)
    z = jnp.asarray(rng.standard_normal((6, 10, 4)).astype(np.float32))
    # p=1.0: offset branch always wins (applied after skip, quantizer.py:151-160)
    out = quantize(z, spec, training=True, rng=jax.random.key(0))
    # result == z + uniform offset, not on grid, but close to z
    assert np.abs(np.asarray(out - z)).max() <= (0.5 / 2) + 1e-6

    spec0 = FSQSpec(levels=(8, 5, 5, 5), noise_dropout=0.0)
    out0 = quantize(z, spec0, training=True, rng=jax.random.key(0))
    np.testing.assert_allclose(np.asarray(out0), np.asarray(quantize(z, spec0)), atol=1e-6)


def test_fsq_module(rng):
    z = jnp.asarray(rng.standard_normal((2, 12, 4)).astype(np.float32))
    mod = FSQ(levels=(8, 5, 5, 5))
    params = mod.init(jax.random.key(0), z)
    codes, idx = mod.apply(params, z)
    assert codes.shape == z.shape and idx.shape == z.shape[:-1]
    assert codes.dtype == z.dtype

    # bf16 in -> quantization still exact (fp32 internally), codes cast back
    zb = z.astype(jnp.bfloat16)
    codes_b, idx_b = mod.apply(params, zb)
    assert codes_b.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(idx_b), np.asarray(
        codes_to_indices(quantize(zb.astype(jnp.float32), SPEC), SPEC)))


def test_noise_dropout_indices_stay_clean(rng):
    """With noise dropout active, the module's indices must come from the
    clean grid quantization (valid range, matching eval) even though the
    returned codes are noisy."""
    mod = FSQ(levels=(8, 5, 5, 5), noise_dropout=1.0)
    z = jnp.asarray(rng.standard_normal((4, 10, 4)).astype(np.float32) * 2)
    params = mod.init(jax.random.key(0), z)
    codes, idx = mod.apply(
        params, z, True, rngs={"fsq_noise": jax.random.key(1)}
    )
    assert int(jnp.min(idx)) >= 0 and int(jnp.max(idx)) < 1000
    # indices equal the eval-mode (clean) indices
    _, idx_eval = mod.apply(params, z)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_eval))
    # but the codes themselves are noisy (off-grid)
    half = np.asarray(SPEC.half_width)
    on_grid = np.allclose(np.asarray(codes) * half,
                          np.round(np.asarray(codes) * half), atol=1e-5)
    assert not on_grid
