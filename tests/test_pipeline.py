"""Pipeline parallelism (parallel/pipeline.py): a GPipe-scheduled,
ppermute-wired LSTM stack equals the serial forward exactly — values AND
gradients — on a 4-stage pipe mesh. Net-new over the reference
(single-GPU train_music_lstm_v2.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from mqgan_tpu.models.music_lstm import MusicLSTM, masked_ce_loss
from mqgan_tpu.parallel.pipeline import (
    music_lstm_pipelined_logits,
    pipeline_map,
)

VOCAB, GENRES, EMB, HID, LAYERS = 50, 3, 16, 32, 4
B, L = 8, 12


@pytest.fixture(scope="module")
def lm_setup():
    model = MusicLSTM(vocab_size=VOCAB, num_genres=GENRES, emb_dim=EMB,
                      lstm_hid=HID, lstm_layers=LAYERS)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(1, VOCAB, (B, L)), jnp.int32)
    # right-pad two rows so the pad-embedding zeroing path is exercised
    tokens = tokens.at[0, 9:].set(0).at[3, 6:].set(0)
    genres = jnp.asarray(rng.integers(0, GENRES, (B,)), jnp.int32)
    variables = model.init(jax.random.key(0), tokens, genres)
    mesh = Mesh(np.array(jax.devices()[:LAYERS]), ("pipe",))
    return model, variables, tokens, genres, mesh


def test_pipelined_logits_match_serial(lm_setup):
    model, variables, tokens, genres, mesh = lm_setup
    serial = model.apply(variables, tokens, genres, deterministic=True)

    @jax.jit
    def piped(variables):
        return music_lstm_pipelined_logits(
            variables, tokens, genres, mesh, n_micro=4, n_layers=LAYERS)

    np.testing.assert_allclose(np.asarray(piped(variables)),
                               np.asarray(serial), atol=1e-5, rtol=1e-5)


def test_pipelined_grads_match_serial(lm_setup):
    model, variables, tokens, genres, mesh = lm_setup
    targets = jnp.roll(tokens, -1, axis=1).at[:, -1].set(0)

    def loss_serial(v):
        logits = model.apply(v, tokens, genres, deterministic=True)
        return masked_ce_loss(logits, targets)[0]

    def loss_piped(v):
        logits = music_lstm_pipelined_logits(
            v, tokens, genres, mesh, n_micro=4, n_layers=LAYERS)
        return masked_ce_loss(logits, targets)[0]

    g_s = jax.grad(loss_serial)(variables)
    g_p = jax.jit(jax.grad(loss_piped))(variables)
    flat_s = jax.tree_util.tree_leaves_with_path(g_s)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(g_p))
    assert len(flat_s) == len(flat_p)
    for path, leaf in flat_s:
        np.testing.assert_allclose(
            np.asarray(flat_p[path]), np.asarray(leaf),
            atol=2e-5, rtol=2e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_pipeline_map_generic_stage_chain(lm_setup):
    """pipeline_map composes arbitrary shape-preserving stages: y = x
    processed by S distinct affine stages in order, vs the serial loop.
    Also checks M > S and M == S microbatch counts."""
    _, _, _, _, mesh = lm_setup
    s = mesh.shape["pipe"]
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((s, 6, 6)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((s, 6)), jnp.float32)

    def stage(params, x):
        return jnp.tanh(x @ params["w"] + params["b"])

    for m in (s, 2 * s, 7):
        xs = jnp.asarray(rng.standard_normal((m, 3, 6)), jnp.float32)
        got = pipeline_map(stage, {"w": w, "b": b}, xs, mesh)
        want = xs
        for i in range(s):
            want = stage({"w": w[i], "b": b[i]}, want)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6, rtol=1e-6)


def test_pipelined_train_step_matches_serial(lm_setup):
    """The LSTM trainer's actual train step (make_lstm_step) with a pipe
    mesh equals the serial step: 2 AdamW updates on the same batch give
    the same params (dropout=0 so the different rng plumbing — module
    make_rng vs raw bernoulli on the pipelined path — is inert)."""
    import optax

    from mqgan_tpu.train.lstm_trainer import make_lstm_step

    _, _, tokens, genres, mesh = lm_setup
    model = MusicLSTM(vocab_size=VOCAB, num_genres=GENRES, emb_dim=EMB,
                      lstm_hid=HID, lstm_layers=LAYERS, dropout=0.0)
    lengths = jnp.sum((tokens != 0).astype(jnp.int32), axis=1)
    variables = model.init(jax.random.key(0), tokens, genres)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))

    def run(pipe_mesh):
        params = variables["params"]
        opt = tx.init(params)
        step = make_lstm_step(model, tx, 0, train=True,
                              pipe_mesh=pipe_mesh, pipe_micro=4)
        rng = jax.random.key(7)
        losses = []
        for _ in range(2):
            params, opt, loss, rng = step(params, opt, tokens, genres,
                                          lengths, rng)
            losses.append(float(loss))
        return params, losses

    p_serial, l_serial = run(None)
    p_piped, l_piped = run(mesh)
    np.testing.assert_allclose(l_piped, l_serial, rtol=1e-5, atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        p_piped, p_serial)


def test_pipelined_dropout_moments(lm_setup):
    """The pipelined path's training dropout (raw inverted bernoulli on
    the stack output) preserves the mean like flax's nn.Dropout: the
    expected logits equal the deterministic ones."""
    model, variables, tokens, genres, mesh = lm_setup
    det = music_lstm_pipelined_logits(
        variables, tokens, genres, mesh, n_micro=4, n_layers=LAYERS)
    keys = jax.random.split(jax.random.key(3), 64)

    @jax.jit
    def one(k):
        return music_lstm_pipelined_logits(
            variables, tokens, genres, mesh, n_micro=4, n_layers=LAYERS,
            dropout_rate=0.5, dropout_rng=k)

    avg = np.mean([np.asarray(one(k)) for k in keys], axis=0)
    # 64 draws of 0.5-dropout: loose tolerance, mean must track
    np.testing.assert_allclose(avg, np.asarray(det), atol=0.25)


def test_pipelined_logits_bf16_match_serial(lm_setup):
    """--bf16 must apply to the pipelined path too: with dtype=bfloat16
    the pipelined logits match the serial module-dtype forward (same cast
    points: embeddings, gate matmuls, carry, vocab head)."""
    _, _, tokens, genres, mesh = lm_setup
    model = MusicLSTM(vocab_size=VOCAB, num_genres=GENRES, emb_dim=EMB,
                      lstm_hid=HID, lstm_layers=LAYERS,
                      dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), tokens, genres)
    serial = model.apply(variables, tokens, genres, deterministic=True)

    piped = music_lstm_pipelined_logits(
        variables, tokens, genres, mesh, n_micro=4, n_layers=LAYERS,
        dtype=jnp.bfloat16)
    assert piped.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(piped, np.float32), np.asarray(serial, np.float32),
        rtol=2e-2, atol=2e-2)
