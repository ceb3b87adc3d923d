"""Generator weight EMA (--ema): in-step update formula for both step
variants, eval/deploy consumers, and checkpoint compatibility across the
flag boundary."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mqgan_tpu.train.state import create_train_state
from mqgan_tpu.train.step import build_models, make_train_step
from tests.test_train_step import B, MEL, T, tiny_config

DECAY = 0.9


@pytest.fixture(scope="module")
def setup_ema():
    cfg = tiny_config()
    gen, patch, mb = build_models(cfg)
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal((B, T, MEL)).astype(np.float32))
    lengths = jnp.full((B,), T, jnp.int32)  # pad-free: accum path is exact

    k = jax.random.key(0)
    state, _, _ = create_train_state(
        gen_variables=gen.init(k, mel, lengths),
        patch_variables=patch.init(k, mel, lengths),
        multibin_variables=mb.init(k, mel, lengths),
        training_cfg=cfg.training, rng=jax.random.key(1),
    )
    state = state.replace(gen_ema=state.gen_params)
    return cfg, state, mel, lengths


@pytest.mark.parametrize("grad_accum", [1, 2])
def test_ema_matches_update_formula(setup_ema, grad_accum):
    """After each step, gen_ema must equal decay*prev_ema +
    (1-decay)*new_params — checked over 2 steps for both the one-pass and
    the scanned-microbatch step."""
    cfg, state, mel, lengths = setup_ema
    step = make_train_step(cfg, train_d=True, donate=False,
                           grad_accum=grad_accum, ema_decay=DECAY)
    ema = state.gen_ema
    for _ in range(2):
        state, _ = step(state, mel, lengths)
        ema = jax.tree.map(
            lambda e, p: e * DECAY + (1.0 - DECAY) * p, ema,
            state.gen_params)
        diffs = jax.tree.leaves(jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), ema,
            state.gen_ema))
        assert max(diffs) < 1e-6, max(diffs)
    # and the EMA genuinely lags the live params after training steps
    gaps = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.gen_ema,
        state.gen_params))
    assert max(gaps) > 0


def test_ema_disabled_stays_none(setup_ema):
    cfg, state, mel, lengths = setup_ema
    state = state.replace(gen_ema=None)
    step = make_train_step(cfg, train_d=False, donate=False)
    state, _ = step(state, mel, lengths)
    assert state.gen_ema is None


def test_trainer_ema_end_to_end(tmp_path):
    """Trainer --ema: eval/keep_best consume the EMA weights; the
    checkpoint roundtrips the EMA subtree; a checkpoint written WITHOUT
    --ema resumes under --ema (EMA seeded from the restored params)."""
    from mqgan_tpu.train.trainer import Trainer
    import dataclasses

    rng = np.random.default_rng(0)
    data_dir = tmp_path / "mels"
    data_dir.mkdir()
    for i in range(6):
        np.save(data_dir / f"m{i}.npy",
                rng.standard_normal((T + 8 * i, MEL)).astype(np.float32))

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(
            cfg.data, data_dir=str(data_dir), batch_size=8,
            output_dir=str(tmp_path / "run"), validation_split=0.3),
        training=dataclasses.replace(cfg.training, num_epochs=1),
    )

    # epoch 1 without --ema, checkpoint written
    tr = Trainer(cfg, use_wandb=False, dtype=jnp.float32,
                 max_steps_per_epoch=2)
    tr.train_epoch(1)
    tr.save(1)
    assert tr.state.gen_ema is None
    tr.logger.close()

    # resume WITH --ema: old checkpoint lacks the subtree -> EMA is seeded
    # from the restored params
    tr2 = Trainer(cfg, use_wandb=False, dtype=jnp.float32,
                  max_steps_per_epoch=2, ema_decay=0.5, keep_best=True)
    assert tr2.start_epoch == 2
    assert tr2.state.gen_ema is not None
    seed_gap = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        tr2.state.gen_ema, tr2.state.gen_params)))
    assert seed_gap == 0.0
    tr2.train_epoch(2)
    # after steps the EMA lags the live params, and eval consumers get it
    gap = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        tr2.state.gen_ema, tr2.state.gen_params)))
    assert gap > 0
    ema_leaf = jax.tree.leaves(tr2._local_gen_params(use_ema=True))[0]
    live_leaf = jax.tree.leaves(tr2._local_gen_params())[0]
    np.testing.assert_array_equal(
        np.asarray(ema_leaf), np.asarray(jax.tree.leaves(tr2.state.gen_ema)[0]))
    assert not np.array_equal(np.asarray(ema_leaf), np.asarray(live_leaf))
    tr2.save(2)
    tr2.logger.close()

    # resume again WITH --ema: the saved EMA subtree roundtrips exactly
    tr3 = Trainer(cfg, use_wandb=False, dtype=jnp.float32,
                  max_steps_per_epoch=2, ema_decay=0.5)
    assert tr3.start_epoch == 3
    rt_gap = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(np.asarray(a) - np.asarray(b)))),
        jax.device_get(tr3.state.gen_ema), jax.device_get(tr2.state.gen_ema))))
    assert rt_gap == 0.0
    tr3.logger.close()

    # and resume WITHOUT --ema: the stale EMA is dropped, params restored
    tr4 = Trainer(cfg, use_wandb=False, dtype=jnp.float32,
                  max_steps_per_epoch=2)
    assert tr4.start_epoch == 3
    assert tr4.state.gen_ema is None
    p_gap = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(np.asarray(a) - np.asarray(b)))),
        jax.device_get(tr4.state.gen_params),
        jax.device_get(tr2.state.gen_params))))
    assert p_gap == 0.0
    tr4.logger.close()
