"""Autoregressive sampling from the token LM (net-new capability — the
reference trains the LSTM LM but ships no generation code at all).

Functional sampler: runs the MusicLSTM cells step-by-step under lax.scan
with temperature / top-k sampling, carrying the per-layer LSTM states. The
produced FSQ token stream feeds PreEncoder.decode for audio continuation.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mqgan_tpu.models.music_lstm import MusicLSTM


def _cell(model: MusicLSTM) -> nn.OptimizedLSTMCell:
    return nn.OptimizedLSTMCell(model.lstm_hid)


def _step_logits(model: MusicLSTM, params, carries, token, genre_vec):
    """One LM step: token (B,) -> (new_carries, logits (B, V))."""
    x = jnp.take(params["tok_emb"]["embedding"], token, axis=0)
    x = jnp.where((token == model.pad_id)[:, None], jnp.zeros_like(x), x)
    x = x + genre_vec
    cell = _cell(model)
    new_carries = []
    for i in range(model.lstm_layers):
        carry, x = cell.apply({"params": params[f"lstm_{i}"]}, carries[i], x)
        new_carries.append(carry)
    logits = x @ params["proj"]["kernel"] + params["proj"]["bias"]
    return new_carries, logits


def sample_filtered(
    logits: jax.Array,  # (B, V)
    key: jax.Array,
    *,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
    forbid: jax.Array | None = None,  # (F,) int32 ids masked to -inf
) -> jax.Array:
    """Temperature / forbid / top-k / top-p filtering + categorical draw —
    the STATIC-control sampling core shared by `generate_tokens` (LSTM)
    and `generate_tokens_transformer`. top_k keeps the k highest logits;
    top_p (nucleus) keeps the smallest descending-prob prefix whose mass
    reaches p (0 or >=1 disables); both compose (top_k first)."""
    logits = logits.astype(jnp.float32) / max(temperature, 1e-6)
    if forbid is not None:
        logits = logits.at[:, forbid].set(-jnp.inf)
    if top_k and top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p and 0.0 < top_p < 1.0:
        # nucleus: keep the smallest descending-prob prefix reaching
        # top_p of the mass (a token stays iff the mass BEFORE it is
        # still < top_p, so the top-1 token always stays)
        desc = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(desc, axis=-1)
        before = jnp.cumsum(probs, axis=-1) - probs
        kept = jnp.where(before < top_p, desc, jnp.inf)
        kth = jnp.min(kept, axis=-1, keepdims=True)
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def generate_tokens(
    model: MusicLSTM,
    params,  # params['params'] tree of MusicLSTM
    genre_ids: jax.Array,  # (B,)
    rng: jax.Array,
    max_len: int,
    *,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
    bos_id: int = 1,
    prompt: jax.Array | None = None,  # (B, P) optional token prefix
    forbidden_tokens: tuple = (),  # ids masked out of every sample (e.g.
    # pad/BOS/EOS specials that must not reach a codec decode)
) -> jax.Array:
    """Returns (B, max_len) sampled tokens (excluding the BOS).

    top_k keeps the k highest logits; top_p (nucleus sampling) keeps the
    smallest logit prefix whose probability mass reaches p (0 or >=1
    disables). Both restrictions compose (top_k first).
    """
    b = genre_ids.shape[0]
    genre_vec = jnp.take(params["genre_emb"]["embedding"], genre_ids, axis=0)
    cell = _cell(model)
    carries = [
        cell.initialize_carry(jax.random.key(0), (b, model.emb_dim))
        for _ in range(model.lstm_layers)
    ]
    top_k = min(top_k, model.vocab_size) if top_k else 0

    token = jnp.full((b,), bos_id, jnp.int32)
    # feed the prompt (teacher forcing) under a scan, ending with the last
    # prompt token as the next sampling input
    if prompt is not None:
        shifted = jnp.concatenate(
            [token[:, None], prompt[:, :-1].astype(jnp.int32)], axis=1
        )

        def prompt_body(carries, tok):
            carries, _ = _step_logits(model, params, carries, tok, genre_vec)
            return carries, None

        carries, _ = jax.lax.scan(prompt_body, carries,
                                  jnp.transpose(shifted, (1, 0)))
        token = prompt[:, -1].astype(jnp.int32)

    forbid = jnp.asarray(sorted(set(int(t) for t in forbidden_tokens)),
                         jnp.int32) if forbidden_tokens else None

    def sample(logits, key):
        return sample_filtered(logits, key, temperature=temperature,
                               top_k=top_k, top_p=top_p, forbid=forbid)

    def body(carry, key):
        carries, token = carry
        carries, logits = _step_logits(model, params, carries, token, genre_vec)
        nxt = sample(logits, key)
        return (carries, nxt), nxt

    keys = jax.random.split(rng, max_len)
    (_, _), tokens = jax.lax.scan(body, (carries, token), keys)
    return jnp.transpose(tokens, (1, 0))  # (B, max_len)


def filter_logits_traced(
    logits: jax.Array,  # (B, V)
    temperature: jax.Array,  # () f32 (pre-clamped > 0)
    top_k: jax.Array,  # () int32 in [0, V]; 0 disables
    top_p: jax.Array,  # () f32; 0 or >=1 disables
    vocab_mask: jax.Array,  # (V,) bool; True = sampleable
) -> jax.Array:
    """`sample_filtered`'s filter math with every control a TRACED value
    (no categorical draw) — shared by both archs' served samplers. The
    dynamic top-k/top-p gates reduce to the static versions' exact
    thresholds, and disabled filters become `-inf` thresholds (no-ops)
    instead of skipped branches."""
    v = logits.shape[-1]
    logits = logits.astype(jnp.float32) / temperature
    logits = jnp.where(vocab_mask[None, :], logits, -jnp.inf)
    # dynamic top-k: ascending sort, threshold at rank V-k; k=0 means
    # a -inf threshold (keep everything)
    srt = jnp.sort(logits, axis=-1)
    idx = jnp.full((logits.shape[0], 1), v, jnp.int32) - jnp.maximum(
        top_k, 1)
    kth_k = jnp.take_along_axis(srt, idx, axis=-1)
    kth_k = jnp.where(top_k > 0, kth_k, -jnp.inf)
    logits = jnp.where(logits < kth_k, -jnp.inf, logits)
    # dynamic nucleus: keep the smallest descending-prob prefix whose
    # mass-before is < top_p (top-1 always stays); re-sorts AFTER the
    # top-k filter exactly like generate_tokens
    desc = jnp.sort(logits, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(desc, axis=-1)
    before = jnp.cumsum(probs, axis=-1) - probs
    kept = jnp.where(before < top_p, desc, jnp.inf)
    kth_p = jnp.min(kept, axis=-1, keepdims=True)
    enabled = (top_p > 0.0) & (top_p < 1.0)
    kth_p = jnp.where(enabled, kth_p, -jnp.inf)
    return jnp.where(logits < kth_p, -jnp.inf, logits)


def _row_sampling_keys(seeds: jax.Array, max_len: int) -> jax.Array:
    """(B,) int32 seeds -> (B, max_len, KD) raw key data: row b's draw
    at post-prompt step s uses `split(key(seeds[b]), max_len)[s]` — the
    SAME chain `generate_tokens` / `generate_tokens_transformer` use at
    B=1 with rng=key(seeds[b]), which is what makes a coalesced serving
    batch row-for-row bit-identical to solo runs."""

    def chain(s):
        return jax.random.key_data(
            jax.random.split(jax.random.key(s), max_len))

    return jax.vmap(chain)(seeds.astype(jnp.int32))


def _rowwise_categorical(keys_data: jax.Array, logits: jax.Array) -> jax.Array:
    """Per-row categorical draw: keys_data (B, KD), logits (B, V). Row b
    draws with its own key — bit-identical to the B=1 batch draw
    `jax.random.categorical(key_b, logits[b:b+1])` (the uniform bits for
    shapes (1, V) and (V,) coincide), so batched rows equal solo runs."""

    def draw(kd, lg):
        return jax.random.categorical(jax.random.wrap_key_data(kd), lg)

    return jax.vmap(draw)(keys_data, logits).astype(jnp.int32)


def generate_tokens_served(
    model: MusicLSTM,
    params,  # params['params'] tree of MusicLSTM
    genre_ids: jax.Array,  # (B,)
    seeds: jax.Array,  # (B,) int32 — PER-ROW PRNG seeds (keys in-graph)
    prompt: jax.Array,  # (B, P) int32, P >= 1 static (pad region arbitrary)
    prompt_lens: jax.Array,  # (B,) int32 in [0, P]; 0 = unconditional
    temperature: jax.Array,  # () f32
    top_k: jax.Array,  # () int32; 0 disables
    top_p: jax.Array,  # () f32; 0 or >=1 disables
    vocab_mask: jax.Array,  # (V,) bool; True = sampleable
    *,
    max_len: int,
    bos_id: int = 1,
) -> jax.Array:
    """`generate_tokens` with every sampling control a TRACED value and
    PER-ROW (seed, prompt_len) — the AOT-export / continuous-batching
    variant (deploy/export_lm.py, deploy/http_lm.py): one serialized
    program per (prompt-bucket P, generation-bucket max_len) serves any
    temperature / top-k / top-p / forbidden-token set, and a batch may
    mix prompt lengths and seeds freely.

    Row b is token-exact with `generate_tokens` at B=1 called with
    rng=key(seeds[b]) and prompt=row b's prompt (pinned in
    tests/test_lm_sampling.py): same recurrence, same per-row key chain
    (`split(key(seed), max_len)` indexed by the post-prompt step), same
    filter math (`filter_logits_traced`). That row-for-row solo equality
    is the continuous-batching invariant — coalescing requests cannot
    change any client's tokens.

    Returns the (B, max_len) continuation AFTER each row's prompt.
    """
    b = genre_ids.shape[0]
    p_bucket = prompt.shape[1]
    v = model.vocab_size
    genre_vec = jnp.take(params["genre_emb"]["embedding"], genre_ids, axis=0)
    cell = _cell(model)
    carries = [
        cell.initialize_carry(jax.random.key(0), (b, model.emb_dim))
        for _ in range(model.lstm_layers)
    ]
    keys_data = _row_sampling_keys(seeds, max_len)  # (B, max_len, KD)
    prompt = prompt.astype(jnp.int32)
    prompt_lens = jnp.clip(prompt_lens.astype(jnp.int32), 0, p_bucket)
    temperature = jnp.maximum(temperature.astype(jnp.float32), 1e-6)
    top_k = jnp.clip(top_k.astype(jnp.int32), 0, v)
    top_p = top_p.astype(jnp.float32)

    def body(carry, t):
        carries, token = carry
        carries, logits = _step_logits(model, params, carries, token,
                                       genre_vec)
        # per-row sampling key by post-prompt position: at step t row b
        # samples its token number (t - prompt_lens[b]); draws in the
        # prompt region are discarded
        s = jnp.clip(t - prompt_lens, 0, max_len - 1)  # (B,)
        kd_t = jnp.take_along_axis(
            keys_data, s[:, None, None], axis=1)[:, 0]
        flt = filter_logits_traced(logits, temperature, top_k, top_p,
                                   vocab_mask)
        nxt = _rowwise_categorical(kd_t, flt)
        # next input: teacher-force prompt[t] while t+1 <= prompt_len
        p_idx = jnp.clip(t, 0, p_bucket - 1)
        in_next = jnp.where(t + 1 <= prompt_lens, prompt[:, p_idx], nxt)
        return (carries, in_next), nxt

    total = p_bucket + max_len
    token0 = jnp.full((b,), bos_id, jnp.int32)
    (_, _), outs = jax.lax.scan(body, (carries, token0),
                                jnp.arange(total, dtype=jnp.int32))
    # row b's continuation = samples at steps
    # [prompt_lens[b], prompt_lens[b] + max_len)
    outs = jnp.transpose(outs, (1, 0))  # (B, total)
    gather = prompt_lens[:, None] + jnp.arange(max_len, dtype=jnp.int32)
    return jnp.take_along_axis(outs, gather, axis=1)  # (B, max_len)


def generate_tokens_transformer_served(
    model,  # MusicTransformer
    params,  # params['params'] tree of MusicTransformer
    genre_ids: jax.Array,  # (B,)
    seeds: jax.Array,  # (B,) int32 — PER-ROW PRNG seeds
    prompt: jax.Array,  # (B, P) int32, P >= 1 static (pad region arbitrary)
    prompt_lens: jax.Array,  # (B,) int32 in [0, P]; 0 = unconditional
    temperature: jax.Array,  # () f32
    top_k: jax.Array,  # () int32; 0 disables
    top_p: jax.Array,  # () f32; 0 or >=1 disables
    vocab_mask: jax.Array,  # (V,) bool; True = sampleable
    *,
    max_len: int,
    bos_id: int = 1,
    kv_dtype=None,
) -> jax.Array:
    """The transformer twin of `generate_tokens_served` — SAME signature
    and per-row solo-equality contract, so deploy/export_lm.py and the
    http_lm batcher dispatch on arch without caring which model runs.

    ``kv_dtype`` overrides the KV-cache storage dtype (default: the
    module dtype, fp32 for deploy rebuilds). bf16 halves the
    attention-read bytes per decode step — the decode loop is
    HBM-traffic-bound, not FLOPs-bound — while scores/softmax stay fp32
    (the cache is cast up after the read, token_transformer.step_rows).
    Sampled streams can differ from the fp32 cache by rounding; the
    per-row solo-exactness contract holds WITHIN a dtype (a bf16-cache
    batch row equals a bf16-cache solo row, test-pinned).

    The prefix ([BOS] + each row's prompt, right-padded to the P bucket)
    prefills every layer's KV cache in one MXU pass; per-row logits are
    gathered at each row's last valid position (prompt_lens[b]), then
    max_len tokens extend the cache via `step_rows` — each row writes and
    attends at its OWN absolute position prompt_lens[b]+t, overwriting
    the prefill's pad-region garbage before any valid query can see it
    (step t writes position prompt_lens[b]+t, then attends positions
    <= it, all of which are BOS/prompt or already-regenerated).

    Row b is token-exact with `generate_tokens_transformer` at B=1 with
    rng=key(seeds[b]) (pinned in tests/test_lm_sampling.py).
    """
    from mqgan_tpu.models.token_transformer import (MusicTransformer,
                                                    init_cache)

    b = genre_ids.shape[0]
    p_bucket = prompt.shape[1]
    v = model.vocab_size
    prompt = prompt.astype(jnp.int32)
    prompt_lens = jnp.clip(prompt_lens.astype(jnp.int32), 0, p_bucket)
    temperature = jnp.maximum(temperature.astype(jnp.float32), 1e-6)
    top_k = jnp.clip(top_k.astype(jnp.int32), 0, v)
    top_p = top_p.astype(jnp.float32)
    keys_data = _row_sampling_keys(seeds, max_len)  # (B, max_len, KD)

    prefix = jnp.concatenate(
        [jnp.full((b, 1), bos_id, jnp.int32), prompt], axis=1)  # (B, P+1)
    # positions written: prefill [0, P+1), steps up to
    # prompt_lens[b] + max_len - 1 <= P + max_len - 1
    caches = init_cache(model, b, p_bucket + max_len,
                        dtype=kv_dtype or model.dtype or jnp.float32)
    logits, caches = model.apply(
        {"params": params}, prefix, genre_ids, caches, prompt_lens,
        method=MusicTransformer.prefill)

    def sample(kd, logits):
        return _rowwise_categorical(
            kd, filter_logits_traced(logits, temperature, top_k, top_p,
                                     vocab_mask))

    tok0 = sample(keys_data[:, 0], logits)

    def body(carry, xs):
        caches, token = carry
        t, kd_t = xs
        # row b's token number t-1 sits at absolute position
        # prompt_lens[b] + t (BOS at 0, prompt at [1, pl], samples after)
        logits, caches = model.apply(
            {"params": params}, token, genre_ids, caches, prompt_lens + t,
            method=MusicTransformer.step_rows)
        nxt = sample(kd_t, logits)
        return (caches, nxt), nxt

    if max_len > 1:
        ts = jnp.arange(1, max_len, dtype=jnp.int32)
        kds = jnp.moveaxis(keys_data[:, 1:], 1, 0)  # (max_len-1, B, KD)
        (_, _), rest = jax.lax.scan(body, (caches, tok0), (ts, kds))
        rest = jnp.transpose(rest, (1, 0))
        return jnp.concatenate([tok0[:, None], rest], axis=1)
    return tok0[:, None]


def generate_tokens_transformer(
    model,  # MusicTransformer
    params,  # params['params'] tree of MusicTransformer
    genre_ids: jax.Array,  # (B,)
    rng: jax.Array,
    max_len: int,
    *,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
    bos_id: int = 1,
    prompt: jax.Array | None = None,  # (B, P) optional token prefix
    forbidden_tokens: tuple = (),
    kv_dtype=None,  # KV-cache storage dtype override (see the served twin)
) -> jax.Array:
    """`generate_tokens` for the MusicTransformer: the prefix ([BOS] +
    prompt) is prefilled in ONE batched MXU pass that populates every
    layer's KV cache, then max_len tokens extend the cache one step at a
    time under lax.scan. Same filter math as the LSTM sampler
    (`sample_filtered`); returns (B, max_len) sampled tokens (excluding
    BOS and prompt).

    KV-cache equivalence to the batch forward is pinned by
    tests/test_token_transformer.py (prefill+step logits == __call__)."""
    from mqgan_tpu.models.token_transformer import MusicTransformer, init_cache

    b = genre_ids.shape[0]
    p_len = 0 if prompt is None else prompt.shape[1]
    top_k = min(top_k, model.vocab_size) if top_k else 0
    forbid = jnp.asarray(sorted(set(int(t) for t in forbidden_tokens)),
                         jnp.int32) if forbidden_tokens else None

    prefix = jnp.full((b, 1), bos_id, jnp.int32)
    if prompt is not None:
        prefix = jnp.concatenate([prefix, prompt.astype(jnp.int32)], axis=1)

    # cache covers the prefix plus every step-fed token (the last sampled
    # token is never fed back, hence the -1)
    caches = init_cache(model, b, p_len + max_len,
                        dtype=kv_dtype or model.dtype or jnp.float32)
    logits, caches = model.apply(
        {"params": params}, prefix, genre_ids, caches,
        method=MusicTransformer.prefill)

    keys = jax.random.split(rng, max_len)
    tok0 = sample_filtered(logits, keys[0], temperature=temperature,
                           top_k=top_k, top_p=top_p, forbid=forbid)

    def body(carry, key):
        caches, token, idx = carry
        logits, caches = model.apply(
            {"params": params}, token, genre_ids, caches, idx,
            method=MusicTransformer.step)
        nxt = sample_filtered(logits, key, temperature=temperature,
                              top_k=top_k, top_p=top_p, forbid=forbid)
        return (caches, nxt, idx + 1), nxt

    if max_len > 1:
        (_, _, _), rest = jax.lax.scan(
            body, (caches, tok0, jnp.int32(p_len + 1)), keys[1:])
        rest = jnp.transpose(rest, (1, 0))  # (B, max_len - 1)
        return jnp.concatenate([tok0[:, None], rest], axis=1)
    return tok0[:, None]


def score_tokens(model: MusicLSTM, params, tokens, genre_ids):
    """Per-row next-token NLL sums over a BOS-prepended token batch — the
    exported scoring head (deploy/export_lm.py). Mirrors the trainer's
    loss exactly (train/lstm_trainer.py loss_fn: inputs tokens[:, :-1],
    targets tokens[:, 1:], pad targets excluded) but reduced per row, so
    callers can aggregate perplexity over any grouping.

    Returns (nll_sum (B,), n_valid (B,)) in fp32.
    """
    inp, tgt = tokens[:, :-1], tokens[:, 1:]
    logits = model.apply({"params": params}, inp, genre_ids, None,
                         deterministic=True)
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    valid = (tgt != model.pad_id).astype(jnp.float32)
    return jnp.sum(nll * valid, axis=1), jnp.sum(valid, axis=1)


def greedy_next_logits(model: MusicLSTM, params, tokens, genre_ids):
    """Stepwise logits for a full prefix — test utility proving the sampler's
    recurrence matches the batch __call__."""
    b, t = tokens.shape
    genre_vec = jnp.take(params["genre_emb"]["embedding"], genre_ids, axis=0)
    cell = _cell(model)
    carries = [
        cell.initialize_carry(jax.random.key(0), (b, model.emb_dim))
        for _ in range(model.lstm_layers)
    ]
    outs = []
    for i in range(t):
        carries, logits = _step_logits(model, params, carries, tokens[:, i],
                                       genre_vec)
        outs.append(logits)
    return jnp.stack(outs, axis=1)  # (B, T, V)
