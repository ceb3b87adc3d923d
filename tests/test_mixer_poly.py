"""Accuracy + wiring tests for the polynomial mixer fast path.

The deterministic mixer MLP is the scalar map
g(z) = sum_f w2[f] aptx(w1[f] z + b1[f]) + b2 (the pointwise expansion
reads a single plane — reference ConvBlock2D, preencoder.py:252-268);
ops/mixer_poly.py replaces the per-element expansion with a per-batch-range
Chebyshev interpolant of g. These tests bound the approximation error and
prove the opt-in changes no param trees.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mqgan_tpu.nn.mixer2d import MelMixer2D
from mqgan_tpu.ops.mixer_poly import mixer_scalar_g, poly_mixer_apply


def _realistic_mlp(rng, features=512):
    # pw kernel has fan_in 1 (single input plane) => O(1) weights, like the
    # flagship init; conv_out has fan_in `features`.
    w1 = rng.standard_normal(features).astype(np.float32)
    b1 = rng.standard_normal(features).astype(np.float32)
    w2 = (rng.standard_normal(features) / np.sqrt(features)).astype(np.float32)
    b2 = np.float32(rng.standard_normal())
    return map(jnp.asarray, (w1, b1, w2, b2))


def test_scalar_fit_accuracy(rng):
    w1, b1, w2, b2 = _realistic_mlp(rng)
    z = jnp.asarray(rng.standard_normal((4, 64, 32)).astype(np.float32) * 3.0)
    exact = mixer_scalar_g(z, w1, b1, w2, b2)
    approx = poly_mixer_apply(z, None, w1, b1, w2, b2)
    scale = float(jnp.max(jnp.abs(exact)))
    err = float(jnp.max(jnp.abs(approx - exact)))
    assert err < 2e-4 * max(scale, 1.0), (err, scale)


def test_scalar_fit_wide_range(rng):
    # outliers widen the fit interval; the interpolant must stay accurate
    w1, b1, w2, b2 = _realistic_mlp(rng)
    z = rng.standard_normal((2, 32, 16)).astype(np.float32)
    z[0, 0, 0] = 25.0
    z[1, -1, -1] = -25.0
    z = jnp.asarray(z)
    exact = mixer_scalar_g(z, w1, b1, w2, b2)
    approx = poly_mixer_apply(z, None, w1, b1, w2, b2)
    scale = float(jnp.max(jnp.abs(exact)))
    err = float(jnp.max(jnp.abs(approx - exact)))
    assert err < 3e-3 * max(scale, 1.0), (err, scale)


@pytest.mark.parametrize("use_wn", [True, False])
def test_module_poly_matches_exact(rng, use_wn):
    b, t, c = 2, 48, 24
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    lengths = np.array([t, t - 9])
    pad = jnp.asarray(np.arange(t)[None, :] >= lengths[:, None])

    exact_m = MelMixer2D(features=96, use_weight_norm=use_wn)
    poly_m = MelMixer2D(features=96, use_weight_norm=use_wn, poly_approx=True)
    params = exact_m.init(jax.random.key(0), x, pad)
    # identical param trees: the opt-in is flippable on a trained checkpoint
    params_poly = poly_m.init(jax.random.key(0), x, pad)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_poly)

    exact = exact_m.apply(params, x, pad, True)
    approx = poly_m.apply(params, x, pad, True)
    assert exact.shape == approx.shape
    scale = float(jnp.max(jnp.abs(exact)))
    err = float(jnp.max(jnp.abs(approx - exact)))
    assert err < 1e-3 * max(scale, 1.0), (err, scale)
    # padded frames are exactly the conv_out bias on both paths
    np.testing.assert_allclose(
        np.asarray(approx[1, t - 9:]), np.asarray(exact[1, t - 9:]),
        rtol=0, atol=1e-6)


def test_non_deterministic_falls_back_to_exact(rng):
    # dropout breaks the scalar-map identity; training calls must ignore
    # the flag (exact path, consuming the dropout rng)
    x = jnp.asarray(rng.standard_normal((2, 16, 8)).astype(np.float32))
    m_poly = MelMixer2D(features=32, poly_approx=True, dropout=0.5)
    m_exact = MelMixer2D(features=32, dropout=0.5)
    params = m_exact.init(jax.random.key(0), x)
    d = jax.random.key(7)
    out_p = m_poly.apply(params, x, None, False, rngs={"dropout": d})
    out_e = m_exact.apply(params, x, None, False, rngs={"dropout": d})
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_e))


def test_preencoder_poly_mixers_decode_parity(rng):
    from mqgan_tpu.models.preencoder import PreEncoder

    kw = dict(mel_channels=16, channels=(32, 48), kernel_sizes=(3, 3),
              fsq_levels=(5, 4), refiner_base_channels=8, refiner_depth=1)
    from mqgan_tpu.core.masking import sequence_mask

    gen = PreEncoder(**kw)
    gen_poly = PreEncoder(**kw, poly_mixers=True)
    mel = jnp.asarray(rng.standard_normal((2, 40, 16)).astype(np.float32))
    lengths = jnp.asarray([40, 29])
    pad = sequence_mask(40, lengths)
    params = jax.jit(gen.init)(jax.random.key(0), mel, lengths)

    idx = gen.apply(params, mel, pad, method="encode")
    dec = gen.apply(params, idx, pad, method="decode")
    dec_p = gen_poly.apply(params, idx, pad, method="decode")
    scale = float(jnp.max(jnp.abs(dec)))
    err = float(jnp.max(jnp.abs(dec_p - dec)))
    assert err < 2e-3 * max(scale, 1.0), (err, scale)
    # the pre-mixer approximation may flip FSQ rounding only at code
    # boundaries: token agreement must be near-total
    idx_p = gen_poly.apply(params, mel, pad, method="encode")
    agree = float(np.mean(np.asarray(idx) == np.asarray(idx_p)))
    assert agree > 0.98, agree


def test_preencoder_poly_mixers_decode_mode(rng):
    """poly_mixers='decode' approximates only the post mixer: encode is the
    exact graph (tokens bit-identical), decode carries interpolation-level
    error only."""
    from mqgan_tpu.core.masking import sequence_mask
    from mqgan_tpu.models.preencoder import PreEncoder

    kw = dict(mel_channels=16, channels=(32, 48), kernel_sizes=(3, 3),
              fsq_levels=(5, 4), refiner_base_channels=8, refiner_depth=1)
    gen = PreEncoder(**kw)
    gen_dec = PreEncoder(**kw, poly_mixers="decode")
    mel = jnp.asarray(rng.standard_normal((2, 40, 16)).astype(np.float32))
    lengths = jnp.asarray([40, 29])
    pad = sequence_mask(40, lengths)
    params = jax.jit(gen.init)(jax.random.key(0), mel, lengths)

    idx = gen.apply(params, mel, pad, method="encode")
    idx_d = gen_dec.apply(params, mel, pad, method="encode")
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_d))

    dec = gen.apply(params, idx, pad, method="decode")
    dec_d = gen_dec.apply(params, idx, pad, method="decode")
    scale = float(jnp.max(jnp.abs(dec)))
    err = float(jnp.max(jnp.abs(dec_d - dec)))
    assert err < 2e-3 * max(scale, 1.0), (err, scale)
