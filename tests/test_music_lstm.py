"""Token-LM tests: model shapes/causality, masked CE, end-to-end trainer CLI
on synthetic token data."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mqgan_tpu.models.music_lstm import MusicLSTM, masked_ce_loss


def test_lstm_shapes_and_pad_embedding(rng):
    model = MusicLSTM(vocab_size=50, num_genres=4, emb_dim=16, lstm_hid=32,
                      lstm_layers=2, pad_id=0, dropout=0.0)
    tokens = jnp.asarray(rng.integers(0, 50, (3, 12)))
    genres = jnp.asarray([0, 1, 3])
    lengths = jnp.asarray([12, 8, 5])
    params = model.init(jax.random.key(0), tokens, genres, lengths)
    logits = model.apply(params, tokens, genres, lengths)
    assert logits.shape == (3, 12, 50)
    assert np.isfinite(np.asarray(logits)).all()


def test_lstm_causality(rng):
    """Changing future tokens must not change past logits (recurrence is
    strictly left-to-right)."""
    model = MusicLSTM(vocab_size=30, num_genres=2, emb_dim=8, lstm_hid=16,
                      lstm_layers=2, dropout=0.0)
    tokens = jnp.asarray(rng.integers(1, 30, (2, 10)))
    genres = jnp.asarray([0, 1])
    params = model.init(jax.random.key(0), tokens, genres, None)
    base = np.asarray(model.apply(params, tokens, genres, None))

    tokens2 = np.asarray(tokens).copy()
    tokens2[:, 6:] = 1 + (tokens2[:, 6:] % 28)
    out2 = np.asarray(model.apply(params, jnp.asarray(tokens2), genres, None))
    np.testing.assert_allclose(out2[:, :6], base[:, :6], atol=1e-5)


def test_genre_conditioning_matters(rng):
    model = MusicLSTM(vocab_size=30, num_genres=3, emb_dim=8, lstm_hid=16,
                      lstm_layers=1, dropout=0.0)
    tokens = jnp.asarray(rng.integers(1, 30, (1, 8)))
    params = model.init(jax.random.key(0), tokens, jnp.asarray([0]), None)
    a = np.asarray(model.apply(params, tokens, jnp.asarray([0]), None))
    b = np.asarray(model.apply(params, tokens, jnp.asarray([2]), None))
    assert not np.allclose(a, b)


def test_masked_ce_matches_torch(rng):
    import torch

    logits = rng.standard_normal((2, 6, 10)).astype(np.float32)
    targets = rng.integers(0, 10, (2, 6))
    targets[0, 4:] = 0  # pad

    want = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits).reshape(-1, 10),
        torch.from_numpy(targets).reshape(-1),
        ignore_index=0,
    ).item()
    got, n = masked_ce_loss(jnp.asarray(logits), jnp.asarray(targets), pad_id=0)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)
    assert int(n) == int((targets != 0).sum())


def test_zero_length_pad_rows_contribute_nothing(rng):
    """Short final batches are filled with zero-length all-pad rows
    (train/lstm_trainer.batches): loss AND gradients must equal the
    unpadded batch exactly, in both train and eval use."""
    model = MusicLSTM(vocab_size=20, num_genres=2, emb_dim=8, lstm_hid=12,
                      lstm_layers=1, pad_id=0, dropout=0.0)
    tokens = np.asarray(rng.integers(1, 20, (2, 7)), np.int64)
    genres = np.asarray([0, 1], np.int64)
    params = model.init(jax.random.key(0), jnp.asarray(tokens),
                        jnp.asarray(genres), None)["params"]

    def loss_of(params, toks, gens):
        logits = model.apply({"params": params}, toks[:, :-1], gens)
        loss, n = masked_ce_loss(logits, toks[:, 1:], pad_id=0)
        return loss, n

    # batch padded with 2 zero-length (all-pad) fill rows, genre 0
    toks_pad = np.zeros((4, 7), np.int64)
    toks_pad[:2] = tokens
    gens_pad = np.asarray([0, 1, 0, 0], np.int64)

    (l_ref, n_ref), g_ref = jax.value_and_grad(loss_of, has_aux=True)(
        params, jnp.asarray(tokens), jnp.asarray(genres))
    (l_pad, n_pad), g_pad = jax.value_and_grad(loss_of, has_aux=True)(
        params, jnp.asarray(toks_pad), jnp.asarray(gens_pad))
    assert int(n_ref) == int(n_pad)
    np.testing.assert_allclose(float(l_pad), float(l_ref), rtol=1e-6)
    for (ka, a), (_kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_pad)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6,
                                   err_msg=f"grad {jax.tree_util.keystr(ka)} differs")


def test_batches_fill_rows_are_zero_length(rng):
    """batches() fills short final batches with all-pad rows, never
    duplicates (the reference's repeat-pad double-counts them)."""
    from mqgan_tpu.train.lstm_trainer import batches

    class _DS:
        def __init__(self, seqs):
            self.seqs = seqs

        def __len__(self):
            return len(self.seqs)

        def load(self, i):
            return self.seqs[i], i % 2

    seqs = [np.asarray(rng.integers(1, 9, int(rng.integers(4, 12))), np.int64)
            for _ in range(5)]
    out = list(batches(_DS(seqs), range(5), batch_size=4, pad_id=0, rng=None))
    assert len(out) == 2
    tokens, genres, lengths = out[1]
    assert tokens.shape[0] == 4
    # row 0 is the real 5th sequence, rows 1-3 are all-pad with length 0
    assert (lengths[1:] == 0).all()
    assert (tokens[1:] == 0).all()
    assert lengths[0] == len(seqs[4])


@pytest.mark.slow
def test_lstm_trainer_cli(tmp_path, rng):
    from mqgan_tpu.train.lstm_trainer import main as lstm_main

    chunks = tmp_path / "chunks"
    chunks.mkdir()
    mapping = {}
    for i in range(12):
        seq = rng.integers(3, 40, size=int(rng.integers(10, 50))).astype(np.int64)
        fname = f"track{i:02d}_chunk{i:03d}.npy"
        np.save(chunks / fname, seq)
        mapping[fname] = int(i % 3)
    mpath = tmp_path / "fname_to_id.json"
    mpath.write_text(json.dumps(mapping))

    out = tmp_path / "run"
    lstm_main([
        "--chunks_dir", str(chunks), "--mapping_json", str(mpath),
        "--vocab_size", "40", "--num_genres", "3",
        "--emb_dim", "8", "--lstm_hid", "16", "--lstm_layers", "1",
        "--epochs", "2", "--batch_size", "4", "--log_every", "1",
        "--out_dir", str(out),
    ])

    assert (out / "best.json").exists()
    best = json.loads((out / "best.json").read_text())
    assert np.isfinite(best["val_loss"])
    with open(out / "lstm_metrics.jsonl") as f:
        recs = [json.loads(l) for l in f]
    assert any("val/perplexity" in r for r in recs)
    losses = [r["train/loss_step"] for r in recs if "train/loss_step" in r]
    assert losses and all(np.isfinite(l) for l in losses)
    # training reduces loss on this trivial dataset
    assert losses[-1] < losses[0] + 0.5


def test_torch_lstm_checkpoint_import(rng):
    """Reference MusicLSTM weights -> ours: identical logits (full-length
    sequences so torch's packing is a no-op)."""
    import torch

    from mqgan_tpu.utils.torch_import import import_music_lstm_params
    from tests.reference_loader import load_reference_modules

    load_reference_modules()
    import train_music_lstm_v2 as ref_lm

    torch.manual_seed(0)
    tmodel = ref_lm.MusicLSTM(vocab_size=40, num_genres=3, emb_dim=8,
                              lstm_hid=12, lstm_layers=2, pad_id=0, drop=0.0)
    tmodel.eval()

    params = import_music_lstm_params(tmodel.state_dict(), lstm_layers=2)
    ours = MusicLSTM(vocab_size=40, num_genres=3, emb_dim=8, lstm_hid=12,
                     lstm_layers=2, pad_id=0, dropout=0.0)

    tokens = rng.integers(1, 40, (3, 9))
    genres = np.array([0, 2, 1])
    lengths = np.array([9, 9, 9])

    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(tokens),
                          torch.from_numpy(genres),
                          torch.from_numpy(lengths))

    j_logits = ours.apply({"params": params}, jnp.asarray(tokens),
                          jnp.asarray(genres), jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(),
                               atol=2e-5, rtol=1e-4)


def test_hoisted_lstm_matches_flax_cell_rollout(rng):
    """HoistedLSTMLayer (input projections hoisted out of the scan) is
    numerically equivalent to nn.RNN(nn.OptimizedLSTMCell) on the SAME
    param tree — old checkpoints load unchanged."""
    from flax import linen as nn

    from mqgan_tpu.models.music_lstm import HoistedLSTMLayer

    class CellRollout(nn.Module):
        @nn.compact
        def __call__(self, x):
            cell = nn.OptimizedLSTMCell(12, name="lstm_0")
            return nn.RNN(cell, name="rnn_0")(x)

    class Hoisted(nn.Module):
        @nn.compact
        def __call__(self, x):
            return HoistedLSTMLayer(12, name="lstm_0")(x)

    x = jnp.asarray(rng.standard_normal((3, 17, 8)).astype(np.float32))
    ref = CellRollout()
    params = jax.jit(ref.init)(jax.random.key(0), x)
    fast = Hoisted()
    p2 = jax.jit(fast.init)(jax.random.key(0), x)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))

    out_ref = ref.apply(params, x)
    out_fast = fast.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_ref),
                               atol=1e-5, rtol=1e-5)

    # gradients agree too (the scan body is what training differentiates)
    def loss(p, m):
        return jnp.sum(m.apply(p, x) ** 2)

    g_ref = jax.grad(loss)(params, ref)
    g_fast = jax.grad(loss)(params, fast)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4),
        g_ref, g_fast)
