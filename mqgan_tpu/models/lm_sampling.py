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

    def body(carry, key):
        carries, token = carry
        carries, logits = _step_logits(model, params, carries, token, genre_vec)
        nxt = sample(logits, key)
        return (carries, nxt), nxt

    keys = jax.random.split(rng, max_len)
    (_, _), tokens = jax.lax.scan(body, (carries, token), keys)
    return jnp.transpose(tokens, (1, 0))  # (B, max_len)


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
