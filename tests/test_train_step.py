"""End-to-end train-step tests on a tiny config: loss finiteness, gradient
flow contracts, LeCam evolution, phase variants, and the generator-forward
vjp factorization."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mqgan_tpu.core.config import (
    DataConfig,
    GeneratorConfig,
    LossWeights,
    ModelConfig,
    MultiBinDiscriminatorConfig,
    PatchDiscriminatorConfig,
    TrainConfig,
    TrainingConfig,
)
from mqgan_tpu.train.state import create_train_state
from mqgan_tpu.train.step import build_models, make_eval_step, make_train_step

MEL = 16
T = 32
B = 4


def tiny_config(use_fm=False):
    # patch D needs >= 4 hidden layers for feature-matching taps to exist
    # (ret_features_map skips layers 0, 1 and the last,
    # reference discriminators.py:104-108)
    patch_hidden = (4, 4, 8) if use_fm else (4, 8)
    patch_ks = (3,) * (len(patch_hidden) + 1)
    patch_strides = tuple([(1, 2)] + [(2, 2)] * (len(patch_hidden) - 1) + [(1, 1)])
    mb_hidden = (4, 4, 4) if use_fm else (4, 4)
    return TrainConfig(
        data=DataConfig(crop_len=(T,), batch_size=B),
        model=ModelConfig(
            mel_channels=MEL,
            generator=GeneratorConfig(
                channels=(8, 12), kernel_sizes=(3,), dropout=0.1,
                fsq_levels=(8, 5, 5, 5), refiner_base_channels=4,
                refiner_depth=2,
            ),
            discriminator_patch=PatchDiscriminatorConfig(
                hidden_channels=patch_hidden, kernel_sizes=patch_ks,
                strides=patch_strides,
            ),
            discriminator_multibin=MultiBinDiscriminatorConfig(
                hidden_channels=mb_hidden, kernel_sizes=(3,) * (len(mb_hidden) + 1),
                n_bins=2, n_no_strides=1,
            ),
        ),
        training=TrainingConfig(
            warmup_steps=10, use_fm_loss=use_fm,
            discriminator_train_start_epoch=2,
            loss_weights=LossWeights(),
        ),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    gen, patch, mb = build_models(cfg)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((B, T, MEL)).astype(np.float32))
    lengths = jnp.asarray(np.array([T, T - 5, T, T - 1], np.int32))

    k = jax.random.key(0)
    gv = gen.init(k, mel, lengths)
    pv = patch.init(k, mel, lengths)
    mv = mb.init(k, mel, lengths)
    state, _, _ = create_train_state(
        gen_variables=gv, patch_variables=pv, multibin_variables=mv,
        training_cfg=cfg.training, rng=jax.random.key(1),
    )
    return cfg, state, mel, lengths


def _tree_equal(a, b):
    return all(
        np.allclose(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def test_warmup_step(setup):
    cfg, state, mel, lengths = setup
    step = make_train_step(cfg, train_d=False, donate=False)
    new_state, metrics = step(state, mel, lengths)

    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert float(metrics["loss_d"]) == 0.0
    assert float(metrics["loss_gan"]) == 0.0
    assert float(metrics["loss_recon_pre"]) > 0
    assert int(new_state.step) == 1
    assert 0 < float(metrics["codebook_usage"]) <= 1.0
    cb = 1
    for lv in cfg.model.generator.fsq_levels:
        cb *= lv
    assert 1.0 <= float(metrics["codebook_perplexity"]) <= cb + 1e-3

    # G params moved, D params untouched, lecam untouched
    assert not _tree_equal(new_state.gen_params, state.gen_params)
    assert _tree_equal(new_state.disc_params, state.disc_params)
    assert not bool(new_state.lecam.initialized)

    # warmup lr: step 0 -> lr * 1/10
    np.testing.assert_allclose(
        float(metrics["learning_rate"]), cfg.training.lr * 0.1, rtol=1e-6
    )


def test_gan_step(setup):
    cfg, state, mel, lengths = setup
    step = make_train_step(cfg, train_d=True, donate=False)
    new_state, metrics = step(state, mel, lengths)

    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert float(metrics["loss_d"]) > 0.0
    assert float(metrics["loss_gan"]) > 0.0
    assert not _tree_equal(new_state.disc_params, state.disc_params)
    assert not _tree_equal(new_state.gen_params, state.gen_params)
    assert bool(new_state.lecam.initialized)
    # spectral-norm power iteration advanced
    assert not _tree_equal(new_state.disc_stats, state.disc_stats)

    # multiple steps keep losses finite and lecam evolving
    s2, m2 = step(new_state, mel, lengths)
    assert np.isfinite(float(m2["loss_d"]))
    assert float(s2.lecam.ema_real) != float(new_state.lecam.ema_real)


def test_fm_loss_step(setup):
    _, _, mel, lengths = setup
    cfg = tiny_config(use_fm=True)
    gen, patch, mb = build_models(cfg)
    k = jax.random.key(0)
    state, _, _ = create_train_state(
        gen_variables=gen.init(k, mel, lengths),
        patch_variables=patch.init(k, mel, lengths),
        multibin_variables=mb.init(k, mel, lengths),
        training_cfg=cfg.training, rng=jax.random.key(1),
    )
    step = make_train_step(cfg, train_d=True, donate=False)
    _, metrics = step(state, mel, lengths)
    assert float(metrics["loss_fm"]) > 0.0


def test_gradient_contracts(setup):
    """hidden_proj is detached from every loss path (reference
    preencoder.py:413-414 comment/contract) => receives zero gradient and
    never moves; the refiner itself DOES move (recon_post loss)."""
    cfg, state, mel, lengths = setup
    step = make_train_step(cfg, train_d=True, donate=False)
    new_state, _ = step(state, mel, lengths)

    assert _tree_equal(
        new_state.gen_params["hidden_proj"], state.gen_params["hidden_proj"]
    )
    assert not _tree_equal(
        new_state.gen_params["refiner"], state.gen_params["refiner"]
    )
    # encoder/decoder move through recon losses
    assert not _tree_equal(
        new_state.gen_params["encoder_blocks_0"], state.gen_params["encoder_blocks_0"]
    )
    assert not _tree_equal(
        new_state.gen_params["out_proj"], state.gen_params["out_proj"]
    )


def test_eval_step(setup):
    cfg, state, mel, lengths = setup
    eval_step = make_eval_step(cfg)
    pre, post, idx, metrics = eval_step(state.gen_params, mel, lengths)
    assert pre.shape == (B, T, MEL) and post.shape == (B, T, MEL)
    assert idx.shape == (B, T)
    assert np.isfinite(float(metrics["eval_recon_pre_mse"]))

    # determinism: eval twice gives identical results
    pre2, post2, idx2, _ = eval_step(state.gen_params, mel, lengths)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx2))
    np.testing.assert_allclose(np.asarray(post), np.asarray(post2), atol=0)


def test_zero_length_pad_rows_contribute_nothing(setup):
    """Zero-length fill rows (MelLoader's static-shape batch padding) must
    carry zero loss weight and zero gradient: the updated state is
    identical whatever garbage sits in a zero-length row's mel."""
    cfg, state, mel, lengths = setup
    step = make_train_step(cfg, train_d=True, donate=False)

    lens_padded = jnp.asarray(np.array([T, T - 5, 0, 0], np.int32))
    mel_zeros = mel.at[2:].set(0.0)
    mel_garbage = mel.at[2:].set(1e3)

    s_a, m_a = step(state, mel_zeros, lens_padded)
    s_b, m_b = step(state, mel_garbage, lens_padded)

    for k in m_a:
        np.testing.assert_allclose(float(m_a[k]), float(m_b[k]), rtol=1e-6,
                                   err_msg=f"metric {k}")
        assert np.isfinite(float(m_a[k])), k
    la = jax.tree_util.tree_leaves(s_a.gen_params)
    lb = jax.tree_util.tree_leaves(s_b.gen_params)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(s_a.disc_params),
                    jax.tree_util.tree_leaves(s_b.disc_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grad_norm_metrics(setup):
    """log_grad_norms adds finite per-component gradient norms (the
    in-graph half of the wandb.watch equivalent, reference train.py:333)."""
    cfg, state, mel, lengths = setup
    step = make_train_step(cfg, train_d=True, donate=False,
                           log_grad_norms=True)
    _, metrics = step(state, mel, lengths)
    assert "grad_norm/gen" in metrics and "grad_norm/disc" in metrics
    comp_keys = [k for k in metrics if k.startswith("grad_norm/gen/")]
    assert len(comp_keys) >= 5  # proj, pre, post, encoder/decoder blocks...
    for k in ["grad_norm/gen", "grad_norm/disc", *comp_keys]:
        v = float(metrics[k])
        assert np.isfinite(v) and v >= 0, k
    assert float(metrics["grad_norm/gen"]) > 0


def test_remat_generator_matches_plain(setup):
    """remat=True (checkpoint-chunked mixer hiddens) keeps the param tree
    identical and the deterministic forward/gradient numerics equal up to
    reduction reordering — it only changes what the backward pass stores
    (training dropout draws differ bitwise, iid either way)."""
    import dataclasses

    cfg, state, mel, lengths = setup
    cfg_r = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, generator=dataclasses.replace(
            cfg.model.generator, remat=True)))
    gen_plain, _, _ = build_models(cfg)
    gen_remat, _, _ = build_models(cfg_r)
    p2 = jax.jit(gen_remat.init)(jax.random.key(0), mel, lengths)
    assert (jax.tree_util.tree_structure(state.gen_params)
            == jax.tree_util.tree_structure(p2["params"]))

    def loss(gp, gen):
        _, post, _ = gen.apply({"params": gp}, mel, lengths,
                               deterministic=True)
        return jnp.sum(post.astype(jnp.float32) ** 2)

    l0, g0 = jax.value_and_grad(loss)(state.gen_params, gen_plain)
    l1, g1 = jax.value_and_grad(loss)(state.gen_params, gen_remat)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4), g0, g1)


def test_remat_refiner_matches_plain(setup):
    """remat_refiner=True (refiner ConvBlock recompute — the hifimusic
    B=64 enabler) keeps the param tree identical and the deterministic
    forward/gradient numerics equal up to reduction reordering."""
    import dataclasses

    cfg, state, mel, lengths = setup
    cfg_r = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, generator=dataclasses.replace(
            cfg.model.generator, remat_refiner=True)))
    gen_plain, _, _ = build_models(cfg)
    gen_remat, _, _ = build_models(cfg_r)
    p2 = jax.jit(gen_remat.init)(jax.random.key(0), mel, lengths)
    assert (jax.tree_util.tree_structure(state.gen_params)
            == jax.tree_util.tree_structure(p2["params"]))

    def loss(gp, gen):
        _, post, _ = gen.apply({"params": gp}, mel, lengths,
                               deterministic=True)
        return jnp.sum(post.astype(jnp.float32) ** 2)

    l0, g0 = jax.value_and_grad(loss)(state.gen_params, gen_plain)
    l1, g1 = jax.value_and_grad(loss)(state.gen_params, gen_remat)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4), g0, g1)


def test_tree_stats_summaries():
    from mqgan_tpu.utils.logging import tree_stats

    tree = {"block": {"kernel": np.ones((4, 4), np.float32),
                      "bias": np.zeros((4,), np.float32)},
            "proj": {"kernel": np.full((2, 2), -2.0, np.float32)}}
    s = tree_stats(tree, prefix="param")
    assert s["param/block/l2"] == pytest.approx(4.0)
    assert s["param/proj/mean"] == pytest.approx(-2.0)
    assert len(s["param/block/hist"]) == 16
    assert sum(s["param/block/hist"]) == 20


@pytest.mark.parametrize("impl", ["rbg", "threefry2x32"])
def test_rng_impl_variants(impl):
    """The training key tree works under both PRNG impls (rbg is the
    shipped default — dropout masks are ~7.6x cheaper on TPU; threefry is
    kept for backend-bit-identical streams and old-checkpoint resume)."""
    cfg = tiny_config()
    assert TrainingConfig().rng_impl == "rbg"  # shipped default
    gen, patch, mb = build_models(cfg)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((B, T, MEL)).astype(np.float32))
    lengths = jnp.full((B,), T, jnp.int32)

    k = jax.random.key(0, impl=impl)
    state, _, _ = create_train_state(
        gen_variables=jax.jit(gen.init)(k, mel, lengths),
        patch_variables=jax.jit(patch.init)(k, mel, lengths),
        multibin_variables=jax.jit(mb.init)(k, mel, lengths),
        training_cfg=cfg.training,
        rng=jax.random.key(1, impl=impl),
    )
    step = make_train_step(cfg, train_d=True, donate=False)
    new_state, metrics = step(state, mel, lengths)
    for name, v in metrics.items():
        assert np.isfinite(float(v)), (impl, name)
    assert not _tree_equal(new_state.gen_params, state.gen_params)
    # the per-step key advances and keeps its impl (checkpoint contract:
    # a resumed run must keep the impl it was trained with)
    assert jax.random.key_impl(new_state.rng) == jax.random.key_impl(state.rng)


def _no_dropout(cfg):
    import dataclasses

    return dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, generator=dataclasses.replace(
            cfg.model.generator, dropout=0.0, fsq_noise_dropout=0.0)))


@pytest.mark.parametrize("train_d,use_fm", [(True, True), (False, False)])
def test_grad_accum_matches_plain(train_d, use_fm, monkeypatch):
    """grad_accum=N (scanned microbatches, one optimizer update) equals the
    one-pass step exactly on pad-free batches: per-term masked means agree
    when valid counts match across microbatches, and the LeCam EMA chain is
    rebuilt from sums aggregated over ALL microbatches. Dropout must be
    inert for the comparison (with dropout on, the draws are iid either way
    but not bitwise comparable): config rates go to 0 AND nn.Dropout is
    patched to identity, because the mel mixers carry a hardcoded
    reference-parity rate of 0.1 (models/preencoder.py)."""
    import flax.linen as fnn

    monkeypatch.setattr(
        fnn.Dropout, "__call__",
        lambda self, x, deterministic=None, rng=None: x)
    cfg = _no_dropout(tiny_config(use_fm=use_fm))
    gen, patch, mb = build_models(cfg)
    big_b = 8
    rng = np.random.default_rng(7)
    mel = jnp.asarray(rng.standard_normal((big_b, T, MEL)).astype(np.float32))
    lengths = jnp.full((big_b,), T, jnp.int32)  # pad-free

    k = jax.random.key(0)
    gv = gen.init(k, mel, lengths)
    pv = patch.init(k, mel, lengths)
    mv = mb.init(k, mel, lengths)

    def fresh_state():
        state, _, _ = create_train_state(
            gen_variables=gv, patch_variables=pv, multibin_variables=mv,
            training_cfg=cfg.training, rng=jax.random.key(1),
        )
        return state

    plain = make_train_step(cfg, train_d=train_d, donate=False)
    accum = make_train_step(cfg, train_d=train_d, donate=False,
                            grad_accum=2)

    s_plain, s_accum = fresh_state(), fresh_state()
    for _ in range(2):  # two steps: the 2nd exercises the EMA decay branch
        s_plain, m_plain = plain(s_plain, mel, lengths)
        s_accum, m_accum = accum(s_accum, mel, lengths)

    for key in m_plain:
        np.testing.assert_allclose(
            float(m_plain[key]), float(m_accum[key]), rtol=5e-4, atol=1e-5,
            err_msg=f"metric {key}")
    for name, a, b in (("gen", s_plain.gen_params, s_accum.gen_params),
                       ("disc", s_plain.disc_params, s_accum.disc_params),
                       ("gen_opt", s_plain.gen_opt, s_accum.gen_opt),
                       ("lecam", s_plain.lecam, s_accum.lecam),
                       ("stats", s_plain.disc_stats, s_accum.disc_stats)):
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_allclose(
                np.asarray(x, np.float32), np.asarray(y, np.float32),
                rtol=5e-4, atol=1e-5, err_msg=name), a, b)


def test_grad_accum_fill_rows_match_plain(monkeypatch):
    """A short final batch (zero-length fill rows at the END, as
    train/data.py builds them) must not distort accumulated gradients:
    rows are striped over microbatches, so each microbatch carries the
    same number of real rows and the accumulated step stays exactly equal
    to the one-pass step. Without striping, one microbatch would be
    all-fill (zero loss, zero grads) and the update would be halved."""
    import flax.linen as fnn

    monkeypatch.setattr(
        fnn.Dropout, "__call__",
        lambda self, x, deterministic=None, rng=None: x)
    cfg = _no_dropout(tiny_config())
    gen, patch, mb = build_models(cfg)
    big_b = 8
    rng = np.random.default_rng(11)
    mel = rng.standard_normal((big_b, T, MEL)).astype(np.float32)
    lengths = np.full((big_b,), T, np.int32)
    # last 4 rows: zero-length fill (zero mel, length 0) — the loader's
    # short-final-batch layout
    mel[4:] = 0.0
    lengths[4:] = 0
    mel, lengths = jnp.asarray(mel), jnp.asarray(lengths)

    k = jax.random.key(0)
    gv = gen.init(k, mel, lengths)
    pv = patch.init(k, mel, lengths)
    mv = mb.init(k, mel, lengths)

    def fresh_state():
        state, _, _ = create_train_state(
            gen_variables=gv, patch_variables=pv, multibin_variables=mv,
            training_cfg=cfg.training, rng=jax.random.key(1),
        )
        return state

    plain = make_train_step(cfg, train_d=True, donate=False)
    accum = make_train_step(cfg, train_d=True, donate=False, grad_accum=2)
    s_plain, m_plain = plain(fresh_state(), mel, lengths)
    s_accum, m_accum = accum(fresh_state(), mel, lengths)

    assert float(m_plain["loss_g_total"]) > 0.1  # real rows DO contribute
    np.testing.assert_allclose(
        float(m_plain["loss_g_total"]), float(m_accum["loss_g_total"]),
        rtol=5e-4, atol=1e-5)
    for name, a, b in (("gen", s_plain.gen_params, s_accum.gen_params),
                       ("disc", s_plain.disc_params, s_accum.disc_params),
                       ("lecam", s_plain.lecam, s_accum.lecam)):
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_allclose(
                np.asarray(x, np.float32), np.asarray(y, np.float32),
                rtol=5e-4, atol=1e-5, err_msg=name), a, b)
