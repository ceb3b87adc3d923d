"""Causal Transformer token LM (net-new model family): masking/causality,
KV-cache parity with the batch forward, sampling, and the shared trainer
path via --arch transformer."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mqgan_tpu.models.lm_sampling import generate_tokens_transformer
from mqgan_tpu.models.token_transformer import (MusicTransformer,
                                                init_cache)

V, G = 30, 3


def make_model(**kw):
    base = dict(vocab_size=V, num_genres=G, emb_dim=16, n_layers=2,
                n_heads=4, mlp_ratio=2, pad_id=0, dropout=0.0)
    base.update(kw)
    return MusicTransformer(**base)


@pytest.fixture(scope="module")
def model_and_params():
    model = make_model()
    tokens = jnp.asarray(np.random.default_rng(0).integers(1, V, (2, 6)))
    genres = jnp.asarray([0, 2])
    variables = model.init(jax.random.key(0), tokens, genres, None)
    return model, variables["params"]


def test_shapes_and_pad_embedding(model_and_params, rng):
    model, params = model_and_params
    tokens = jnp.asarray(rng.integers(1, V, (3, 8)))
    logits = model.apply({"params": params}, tokens, jnp.asarray([0, 1, 2]),
                         None)
    assert logits.shape == (3, 8, V)
    # pad rows embed to the genre vector alone (zeroed token row), same
    # padding_idx semantics as MusicLSTM
    emb = model.apply({"params": params}, jnp.zeros((1, 4), jnp.int32),
                      jnp.asarray([1]), method=MusicTransformer._embed)
    genre_only = params["genre_emb"]["embedding"][1]
    np.testing.assert_allclose(np.asarray(emb[0, 0]),
                               np.asarray(genre_only), atol=1e-6)


def test_causality(model_and_params, rng):
    """Changing token t+1.. must not change logits at positions <= t."""
    model, params = model_and_params
    tokens = jnp.asarray(rng.integers(1, V, (2, 10)))
    genres = jnp.asarray([0, 1])
    base = model.apply({"params": params}, tokens, genres, None)
    mutated = tokens.at[:, 6:].set((tokens[:, 6:] % (V - 2)) + 1)
    out = model.apply({"params": params}, mutated, genres, None)
    np.testing.assert_allclose(np.asarray(out[:, :6]),
                               np.asarray(base[:, :6]), atol=1e-5)
    assert not np.allclose(np.asarray(out[:, 6:]), np.asarray(base[:, 6:]))


def test_genre_conditioning_matters(model_and_params, rng):
    model, params = model_and_params
    tokens = jnp.asarray(rng.integers(1, V, (1, 7)))
    a = model.apply({"params": params}, tokens, jnp.asarray([0]), None)
    b = model.apply({"params": params}, tokens, jnp.asarray([2]), None)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_prefill_step_match_batch_forward(model_and_params, rng):
    """KV-cache decode (prefill a prefix, then single-token steps) must
    reproduce the training forward's logits — the correctness pin for
    generate_tokens_transformer's scan."""
    model, params = model_and_params
    t = 9
    tokens = jnp.asarray(rng.integers(1, V, (2, t)))
    genres = jnp.asarray([1, 2])
    full = model.apply({"params": params}, tokens, genres, None)

    p = 4
    caches = init_cache(model, 2, t)
    lg, caches = model.apply({"params": params}, tokens[:, :p], genres,
                             caches, method=MusicTransformer.prefill)
    outs = [lg]
    for i in range(p, t):
        lg, caches = model.apply({"params": params}, tokens[:, i], genres,
                                 caches, jnp.int32(i),
                                 method=MusicTransformer.step)
        outs.append(lg)
    step_logits = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(step_logits),
                               np.asarray(full[:, p - 1:]), atol=1e-4)


def test_generate_shapes_determinism_and_support(model_and_params):
    model, params = model_and_params
    genres = jnp.asarray([0, 1, 2])
    out = generate_tokens_transformer(model, params, genres,
                                      jax.random.key(7), max_len=12,
                                      forbidden_tokens=(0, 1, 2))
    assert out.shape == (3, 12)
    assert int(out.min()) >= 3 and int(out.max()) < V
    out2 = generate_tokens_transformer(model, params, genres,
                                       jax.random.key(7), max_len=12,
                                       forbidden_tokens=(0, 1, 2))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = generate_tokens_transformer(model, params, genres,
                                       jax.random.key(8), max_len=12,
                                       forbidden_tokens=(0, 1, 2))
    assert not np.array_equal(np.asarray(out), np.asarray(out3))


def test_generate_top_k_1_is_greedy(model_and_params, rng):
    """top_k=1 generation must equal an explicit argmax rollout through
    the batch forward — ties the sampler to the model end-to-end."""
    model, params = model_and_params
    genres = jnp.asarray([0, 2])
    prompt = jnp.asarray(rng.integers(3, V, (2, 5)))
    out = generate_tokens_transformer(model, params, genres,
                                      jax.random.key(0), max_len=6,
                                      top_k=1, prompt=prompt)
    seq = jnp.concatenate([jnp.ones((2, 1), jnp.int32), prompt], axis=1)
    for _ in range(6):
        logits = model.apply({"params": params}, seq, genres, None)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        seq = jnp.concatenate([seq, nxt[:, None]], axis=1)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(seq[:, 6:]))


def test_score_tokens_works_for_transformer(model_and_params, rng):
    from mqgan_tpu.models.lm_sampling import score_tokens
    from mqgan_tpu.models.music_lstm import masked_ce_loss

    model, params = model_and_params
    tokens = jnp.asarray(rng.integers(1, V, (3, 8)))
    tokens = tokens.at[2, 5:].set(0)  # padded row
    genres = jnp.asarray([0, 1, 2])
    nll, n = score_tokens(model, params, tokens, genres)
    logits = model.apply({"params": params}, tokens[:, :-1], genres, None)
    loss, n_valid = masked_ce_loss(logits, tokens[:, 1:], 0)
    np.testing.assert_allclose(float(jnp.sum(nll) / jnp.sum(n)),
                               float(loss), rtol=1e-5)
    assert float(jnp.sum(n)) == float(n_valid)


def test_remat_grads_equal_plain(model_and_params, rng):
    """remat=True (long-context memory relief) is numerics-neutral: same
    param tree, bit-equal gradients vs the plain forward."""
    from mqgan_tpu.models.music_lstm import masked_ce_loss

    model, params = model_and_params
    rm = make_model(remat=True)
    toks = jnp.asarray(rng.integers(1, V, (4, 24)), jnp.int32)
    genres = jnp.asarray(rng.integers(0, G, (4,)), jnp.int32)
    assert (jax.tree.structure(
        rm.init(jax.random.key(0), toks, genres, None)["params"])
        == jax.tree.structure(params))

    def loss(m, p):
        logits = m.apply({"params": p}, toks[:, :-1], genres, None)
        return masked_ce_loss(logits, toks[:, 1:], 0)[0]

    g_plain = jax.jit(jax.grad(lambda p: loss(model, p)))(params)
    g_remat = jax.jit(jax.grad(lambda p: loss(rm, p)))(params)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_remat)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_forward_finite(rng):
    model = make_model(dtype=jnp.bfloat16)
    tokens = jnp.asarray(rng.integers(1, V, (2, 8)))
    genres = jnp.asarray([0, 1])
    params = model.init(jax.random.key(0), tokens, genres, None)["params"]
    logits = model.apply({"params": params}, tokens, genres, None)
    assert bool(jnp.all(jnp.isfinite(logits.astype(jnp.float32))))


@pytest.mark.slow
def test_trainer_cli_transformer(tmp_path, rng):
    """--arch transformer drives the shared lstm_trainer CLI end-to-end:
    loss decreases, val perplexity logged, best checkpoint saved."""
    from mqgan_tpu.train.lstm_trainer import main as lm_main

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
    lm_main([
        "--chunks_dir", str(chunks), "--mapping_json", str(mpath),
        "--vocab_size", "40", "--num_genres", "3",
        "--arch", "transformer", "--emb_dim", "16", "--n_layers", "2",
        "--n_heads", "4", "--mlp_ratio", "2",
        "--epochs", "2", "--batch_size", "4", "--log_every", "1",
        "--out_dir", str(out),
    ])

    assert (out / "best.json").exists()
    best = json.loads((out / "best.json").read_text())
    assert np.isfinite(best["val_loss"])
    with open(out / "lstm_metrics.jsonl") as f:
        recs = [json.loads(line) for line in f]
    assert any("val/perplexity" in r for r in recs)
    losses = [r["train/loss_step"] for r in recs if "train/loss_step" in r]
    assert losses and all(np.isfinite(x) for x in losses)
    assert losses[-1] < losses[0] + 0.5


def test_pipe_rejected_for_transformer(tmp_path):
    from mqgan_tpu.train.lstm_trainer import main as lm_main

    with pytest.raises(SystemExit):
        lm_main([
            "--chunks_dir", str(tmp_path), "--mapping_json", "/nonexistent",
            "--vocab_size", "40", "--num_genres", "3",
            "--arch", "transformer", "--pipe", "2",
        ])
