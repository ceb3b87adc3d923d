"""Moment-matching tests for the fast-dropout (Gaussian) mixer path.

fast_dropout replaces Bernoulli masks on the (B, T, C, features) hidden
with per-output Gaussian noise carrying the exact dropout mean/variance
(nn/mixer2d.py::_fast_dropout_contract). These tests verify the moments
against both the analytic formulas and the real Bernoulli path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mqgan_tpu.nn.mixer2d import MelMixer2D


def _sample(module, params, x, n, seed=0):
    outs = []
    for i in range(n):
        outs.append(np.asarray(module.apply(
            params, x, None, False,
            rngs={"dropout": jax.random.key(seed * 10_000 + i)})))
    return np.stack(outs)


def test_fast_dropout_moments_match_bernoulli(rng):
    b, t, c, feats = 2, 8, 4, 64
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    exact_m = MelMixer2D(features=feats, dropout=0.3)
    fast_m = MelMixer2D(features=feats, dropout=0.3, fast_dropout=True)
    params = exact_m.init(jax.random.key(0), x)
    # identical param trees — the flag is flippable on any checkpoint
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(fast_m.init(jax.random.key(0), x))

    n = 400
    se = _sample(exact_m, params, x, n, seed=1)
    sf = _sample(fast_m, params, x, n, seed=2)

    det = np.asarray(exact_m.apply(params, x, None, True))
    # both estimators are unbiased around the deterministic output
    tol = 6 * np.abs(se).std() / np.sqrt(n)
    np.testing.assert_allclose(se.mean(0), det, atol=tol)
    np.testing.assert_allclose(sf.mean(0), det, atol=tol)
    # per-element standard deviations agree (the moment-matching claim);
    # sampling error of a std estimate at n=400 is ~3.5%, allow 25%
    std_e = se.std(0)
    std_f = sf.std(0)
    mask = std_e > 0.05 * std_e.max()  # skip near-deterministic elements
    ratio = std_f[mask] / std_e[mask]
    assert 0.75 < ratio.mean() < 1.25, ratio.mean()


def test_fast_dropout_chunked_path_runs_and_grads_flow(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 4)).astype(np.float32))
    m = MelMixer2D(features=32, dropout=0.2, fast_dropout=True,
                   hidden_chunk_t=8)
    params = m.init(jax.random.key(0), x)

    def loss(p):
        out = m.apply(p, x, None, False,
                      rngs={"dropout": jax.random.key(3)})
        return jnp.sum(jnp.square(out))

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)
    # chunked and plain fast paths share the same moments: same key =>
    # both are Gaussian around the same mean; just check finiteness and
    # that deterministic calls ignore the flag entirely
    det_fast = m.apply(params, x, None, True)
    det_exact = MelMixer2D(features=32, dropout=0.2,
                           hidden_chunk_t=8).apply(params, x, None, True)
    np.testing.assert_array_equal(np.asarray(det_fast), np.asarray(det_exact))


def test_fast_dropout_padded_batch_grads_finite(rng):
    """Regression: padded positions have exactly-zero hiddens, so the noise
    variance is 0 there and an unguarded sqrt poisons the backward with
    inf * 0 = NaN (caught live: epoch went NaN with --fast_dropout)."""
    t = 16
    x = jnp.asarray(rng.standard_normal((2, t, 4)).astype(np.float32))
    pad = jnp.asarray(np.arange(t)[None, :] >= np.array([[t], [5]]))
    for chunk in (None, 8):
        m = MelMixer2D(features=32, dropout=0.2, fast_dropout=True,
                       hidden_chunk_t=chunk)
        params = m.init(jax.random.key(0), x, pad)

        def loss(p):
            out = m.apply(p, x, pad, False,
                          rngs={"dropout": jax.random.key(3)})
            return jnp.sum(jnp.square(out))

        g = jax.grad(loss)(params)
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.isfinite(np.asarray(leaf)).all(), f"chunk={chunk}"


def test_fast_dropout_preencoder_train_step_smoke(rng):
    from mqgan_tpu.models.preencoder import PreEncoder

    gen = PreEncoder(
        mel_channels=8, channels=(16, 16), kernel_sizes=(3, 3),
        fsq_levels=(3, 3), refiner_base_channels=8, refiner_depth=1,
        fast_dropout=True)
    mel = jnp.asarray(rng.standard_normal((2, 32, 8)).astype(np.float32))
    lens = jnp.full((2,), 32, jnp.int32)
    params = jax.jit(gen.init)(jax.random.key(0), mel, lens)

    def loss(p):
        pre, post, _ = gen.apply(
            p, mel, lens, deterministic=False,
            rngs={"dropout": jax.random.key(1),
                  "fsq_noise": jax.random.key(2)})
        return jnp.mean(jnp.square(pre - mel)) + jnp.mean(jnp.square(post))

    val, g = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))
