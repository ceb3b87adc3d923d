"""Autoregressive LM sampling: recurrence parity with the batch forward,
sampling properties, prompt continuation, and the served samplers'
per-row solo-equality contract (both archs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mqgan_tpu.models.lm_sampling import (generate_tokens,
                                          generate_tokens_served,
                                          generate_tokens_transformer,
                                          generate_tokens_transformer_served,
                                          greedy_next_logits, score_tokens)
from mqgan_tpu.models.music_lstm import MusicLSTM
from mqgan_tpu.models.token_transformer import MusicTransformer

V, G = 30, 3


@pytest.fixture(scope="module")
def model_and_params():
    model = MusicLSTM(vocab_size=V, num_genres=G, emb_dim=8, lstm_hid=12,
                      lstm_layers=2, pad_id=0, dropout=0.0)
    tokens = jnp.asarray(np.random.default_rng(0).integers(1, V, (2, 6)))
    genres = jnp.asarray([0, 2])
    variables = model.init(jax.random.key(0), tokens, genres, None)
    return model, variables["params"]


@pytest.fixture(scope="module")
def transformer_and_params():
    model = MusicTransformer(vocab_size=V, num_genres=G, emb_dim=16,
                             n_layers=2, n_heads=2, mlp_ratio=2, pad_id=0,
                             dropout=0.0)
    tokens = jnp.asarray(np.random.default_rng(0).integers(1, V, (2, 6)))
    genres = jnp.asarray([0, 2])
    variables = model.init(jax.random.key(0), tokens, genres, None)
    return model, variables["params"]


@pytest.fixture(params=["lstm", "transformer"])
def arch_kit(request, model_and_params, transformer_and_params):
    """(model, params, static sampler, served sampler) per architecture —
    the served tests run identically over both (models/token_lm.py's
    shared-signature contract)."""
    if request.param == "lstm":
        return (*model_and_params, generate_tokens, generate_tokens_served)
    return (*transformer_and_params, generate_tokens_transformer,
            generate_tokens_transformer_served)


def test_stepwise_matches_batch_forward(model_and_params, rng):
    """The sampler's cell recurrence reproduces the training forward's
    logits exactly (same params, same prefix)."""
    model, params = model_and_params
    tokens = jnp.asarray(rng.integers(1, V, (2, 7)))
    genres = jnp.asarray([1, 2])
    batch_logits = model.apply({"params": params}, tokens, genres, None)
    step_logits = greedy_next_logits(model, params, tokens, genres)
    np.testing.assert_allclose(np.asarray(step_logits),
                               np.asarray(batch_logits), atol=1e-5)


def test_generate_shapes_and_determinism(model_and_params):
    model, params = model_and_params
    genres = jnp.asarray([0, 1, 2])
    out = generate_tokens(model, params, genres, jax.random.key(7),
                          max_len=15, temperature=1.0)
    assert out.shape == (3, 15)
    assert int(out.min()) >= 0 and int(out.max()) < V
    out2 = generate_tokens(model, params, genres, jax.random.key(7),
                           max_len=15, temperature=1.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = generate_tokens(model, params, genres, jax.random.key(8),
                           max_len=15, temperature=1.0)
    assert not np.array_equal(np.asarray(out), np.asarray(out3))


def test_top_k_restricts_support(model_and_params):
    model, params = model_and_params
    genres = jnp.asarray([0])
    # top_k=1 == greedy: deterministic regardless of rng
    a = generate_tokens(model, params, genres, jax.random.key(1),
                        max_len=12, top_k=1)
    b = generate_tokens(model, params, genres, jax.random.key(2),
                        max_len=12, top_k=1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_top_p_nucleus(model_and_params):
    model, params = model_and_params
    genres = jnp.asarray([0, 1])
    # a vanishing nucleus keeps only the argmax -> greedy, rng-invariant,
    # and equal to top_k=1
    a = generate_tokens(model, params, genres, jax.random.key(1),
                        max_len=12, top_p=1e-9)
    b = generate_tokens(model, params, genres, jax.random.key(2),
                        max_len=12, top_p=1e-9)
    g = generate_tokens(model, params, genres, jax.random.key(3),
                        max_len=12, top_k=1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(g))
    # top_p >= 1 disables the restriction: identical stream to unrestricted
    # sampling under the same key
    u = generate_tokens(model, params, genres, jax.random.key(4), max_len=12)
    p1 = generate_tokens(model, params, genres, jax.random.key(4),
                         max_len=12, top_p=1.0)
    np.testing.assert_array_equal(np.asarray(u), np.asarray(p1))


def test_prompt_continuation(model_and_params, rng):
    model, params = model_and_params
    genres = jnp.asarray([1])
    prompt = jnp.asarray(rng.integers(1, V, (1, 5)))
    out = generate_tokens(model, params, genres, jax.random.key(3),
                          max_len=10, prompt=prompt, top_k=1)
    assert out.shape == (1, 10)
    # the carried LSTM state depends on the prompt: the NEXT-token logits
    # after consuming two different prompts must differ. (Comparing greedy
    # TOKEN continuations instead is luck-of-init dependent — a random
    # model can collapse both onto the same argmax fixed point.)
    prompt2 = jnp.asarray(rng.integers(1, V, (1, 5)))
    l1 = np.asarray(greedy_next_logits(model, params, prompt, genres)[:, -1])
    l2 = np.asarray(greedy_next_logits(model, params, prompt2, genres)[:, -1])
    assert not np.allclose(l1, l2)
    # and the continuation is reproducible given prompt + key
    out2 = generate_tokens(model, params, genres, jax.random.key(3),
                           max_len=10, prompt=prompt, top_k=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def _served(served_fn, model, params, genres, seeds, *, max_len,
            prompts=None, temperature=1.0, top_k=0, top_p=0.0,
            forbidden=(), p_bucket=None):
    """Call a served sampler the way the exported runtime / http batcher
    does: per-row seeds, per-row (mixed-length) prompts right-padded to
    one bucket, every control traced."""
    b = genres.shape[0]
    prompts = prompts if prompts is not None else [None] * b
    p_lens = np.asarray([0 if p is None else len(p) for p in prompts],
                        np.int32)
    p_bucket = p_bucket or max(1, int(p_lens.max()))
    prompt_arr = np.zeros((b, p_bucket), np.int32)
    for i, p in enumerate(prompts):
        if p is not None:
            prompt_arr[i, : len(p)] = np.asarray(p, np.int32)
    mask = np.ones((V,), bool)
    for t in forbidden:
        mask[t] = False
    return served_fn(
        model, params, genres, jnp.asarray(seeds, jnp.int32),
        jnp.asarray(prompt_arr), jnp.asarray(p_lens),
        jnp.float32(temperature), jnp.int32(top_k),
        jnp.float32(top_p), jnp.asarray(mask), max_len=max_len)


def test_served_rows_match_solo_unconditional(arch_kit):
    """The served sampler's per-row contract: row b of a batched call is
    token-exact with a SOLO static-sampler run at rng=key(seeds[b]) —
    the invariant that makes continuous batching invisible to clients.
    Checked across the sampling-control grid (the dynamic top-k/top-p
    gates reduce to the static filters' exact thresholds)."""
    model, params, static_fn, served_fn = arch_kit
    genres = jnp.asarray([0, 1, 2])
    seeds = [11, 12, 13]
    for kwargs in (
        dict(temperature=1.0),
        dict(temperature=0.7, top_k=5),
        dict(temperature=1.3, top_p=0.9),
        dict(temperature=0.9, top_k=8, top_p=0.8),
        dict(temperature=1.0, forbidden=(0, 1, 2, V - 1)),
    ):
        forbidden = kwargs.pop("forbidden", ())
        out = np.asarray(_served(served_fn, model, params, genres, seeds,
                                 max_len=20, forbidden=forbidden, **kwargs))
        for b, s in enumerate(seeds):
            ref = static_fn(model, params, genres[b: b + 1],
                            jax.random.key(s), max_len=20,
                            forbidden_tokens=forbidden, **kwargs)
            np.testing.assert_array_equal(
                out[b], np.asarray(ref)[0], err_msg=f"{kwargs} row {b}")


def test_served_mixed_prompts_match_solo(arch_kit, rng):
    """ONE dispatch mixing unconditional, short-prompt, and long-prompt
    rows (all padded to one prompt bucket) reproduces each row's solo
    continuation exactly — mixed-length prompts share a batch."""
    model, params, static_fn, served_fn = arch_kit
    genres = jnp.asarray([1, 0, 2])
    seeds = [5, 9, 21]
    prompts = [None, rng.integers(1, V, (3,)).astype(np.int32),
               rng.integers(1, V, (7,)).astype(np.int32)]
    out = np.asarray(_served(served_fn, model, params, genres, seeds,
                             max_len=12, prompts=prompts, temperature=0.8,
                             top_k=6, p_bucket=9))
    for b, s in enumerate(seeds):
        p = (None if prompts[b] is None
             else jnp.asarray(prompts[b][None]))
        ref = static_fn(model, params, genres[b: b + 1], jax.random.key(s),
                        max_len=12, prompt=p, temperature=0.8, top_k=6)
        np.testing.assert_array_equal(out[b], np.asarray(ref)[0],
                                      err_msg=f"row {b}")


def test_served_batch_invariance(arch_kit, rng):
    """Coalescing cannot change a row's tokens: the same (seed, genre,
    prompt) row produces identical output whether dispatched alone or
    inside a batch of unrelated rows."""
    model, params, _, served_fn = arch_kit
    prompt = rng.integers(1, V, (4,)).astype(np.int32)
    solo = np.asarray(_served(served_fn, model, params,
                              jnp.asarray([2]), [17], max_len=10,
                              prompts=[prompt], p_bucket=6,
                              temperature=0.9, top_k=4))
    batched = np.asarray(_served(
        served_fn, model, params, jnp.asarray([0, 2, 1]), [3, 17, 8],
        max_len=10, prompts=[None, prompt, rng.integers(1, V, (6,))],
        p_bucket=6, temperature=0.9, top_k=4))
    np.testing.assert_array_equal(batched[1], solo[0])


def test_served_vocab_mask_restricts_support(arch_kit):
    model, params, _, served_fn = arch_kit
    genres = jnp.asarray([0, 1])
    forbidden = tuple(range(0, V, 2))  # ban every even token
    out = np.asarray(_served(served_fn, model, params, genres, [3, 4],
                             max_len=25, forbidden=forbidden))
    assert (out % 2 == 1).all()


def test_score_tokens_matches_masked_ce(model_and_params, rng):
    """The exported scoring head reproduces the trainer's masked CE when
    aggregated over the batch."""
    from mqgan_tpu.models.music_lstm import masked_ce_loss

    model, params = model_and_params
    tokens = jnp.asarray(rng.integers(1, V, (3, 9)))
    tokens = tokens.at[1, 6:].set(0).at[2, 4:].set(0)  # right-pad rows
    genres = jnp.asarray([0, 1, 2])
    nll, n = score_tokens(model, params, tokens, genres)
    assert nll.shape == (3,) and n.shape == (3,)
    logits = model.apply({"params": params}, tokens[:, :-1], genres, None)
    ref_loss, ref_n = masked_ce_loss(logits, tokens[:, 1:], model.pad_id)
    np.testing.assert_allclose(float(nll.sum() / n.sum()), float(ref_loss),
                               rtol=1e-6)
    assert float(n.sum()) == float(ref_n)


def test_bf16_kv_cache_rows_match_solo(transformer_and_params):
    """kv_dtype=bf16 halves the decode loop's attention reads (VERDICT r4
    #4); the per-row solo-exactness contract holds WITHIN the dtype: row b
    of a bf16-cache batch equals a bf16-cache B=1 run of the static
    sampler. Default (kv_dtype=None) stays bit-identical to fp32."""
    from functools import partial

    model, params = transformer_and_params
    genres = jnp.asarray([0, 1, 2])
    seeds = [21, 22, 23]
    served_bf16 = partial(generate_tokens_transformer_served,
                          kv_dtype=jnp.bfloat16)
    out = np.asarray(_served(served_bf16, model, params, genres, seeds,
                             max_len=16, temperature=0.9, top_k=8))
    for b, s in enumerate(seeds):
        ref = generate_tokens_transformer(
            model, params, genres[b: b + 1], jax.random.key(s),
            max_len=16, temperature=0.9, top_k=8, kv_dtype=jnp.bfloat16)
        np.testing.assert_array_equal(out[b], np.asarray(ref)[0],
                                      err_msg=f"bf16 row {b}")

    # default path unchanged: explicit fp32 == None
    a = _served(generate_tokens_transformer_served, model, params, genres,
                seeds, max_len=16, temperature=0.9, top_k=8)
    c = _served(partial(generate_tokens_transformer_served,
                        kv_dtype=jnp.float32), model, params, genres,
                seeds, max_len=16, temperature=0.9, top_k=8)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_kv_dtype_export_roundtrip(transformer_and_params, tmp_path):
    """export_music_lm(kv_dtype="bfloat16") bakes the bf16 cache into the
    serialized programs (manifest-recorded) and rejects the flag for the
    LSTM arch (no KV cache)."""
    import json

    from mqgan_tpu.deploy.export_lm import ExportedMusicLM, export_music_lm
    from mqgan_tpu.models.music_lstm import MusicLSTM

    model, params = transformer_and_params
    out = str(tmp_path / "kvexp")
    export_music_lm(model, params, out, gen_buckets=(16,),
                    prompt_buckets=(1,), score_buckets=(12,),
                    lm_args={"note": "t"}, verify=False,
                    kv_dtype="bfloat16")
    with open(f"{out}/lm_manifest.json") as f:
        assert json.load(f)["kv_dtype"] == "bfloat16"
    rt = ExportedMusicLM(out)
    toks = rt.generate_rows(np.zeros((2,), np.int32),
                            np.asarray([5, 6], np.int32), 16, top_k=8)
    # exported bf16 program rows equal the in-process bf16 sampler
    for b, s in enumerate((5, 6)):
        ref = generate_tokens_transformer(
            model, params, jnp.zeros((1,), jnp.int32), jax.random.key(s),
            max_len=16, top_k=8, kv_dtype=jnp.bfloat16)
        np.testing.assert_array_equal(toks[b], np.asarray(ref)[0])

    lstm = MusicLSTM(vocab_size=V, num_genres=G, emb_dim=8, lstm_hid=12,
                     lstm_layers=2, pad_id=0, dropout=0.0)
    lp = lstm.init(jax.random.key(0), jnp.zeros((1, 4), jnp.int32),
                   jnp.zeros((1,), jnp.int32), None)["params"]
    with pytest.raises(ValueError, match="transformer"):
        export_music_lm(lstm, lp, str(tmp_path / "bad"), gen_buckets=(16,),
                        prompt_buckets=(1,), score_buckets=(12,),
                        verify=False, kv_dtype="bfloat16")
