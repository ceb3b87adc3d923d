"""Genre-conditioned causal Transformer token LM over FSQ token streams.

Net-new model family (the reference's only token LM is the LSTM,
/root/reference/train_music_lstm_v2.py:146-202). The LSTM's recurrence is
irreducibly serial over time — on TPU it runs as a lax.scan whose body is
a small VPU-bound matmul per step. A causal pre-LN transformer trains
fully parallel over time: the whole sequence is a handful of large MXU
matmuls, which is the TPU-first architecture for the same next-token
workload. Conditioning semantics match MusicLSTM exactly (token embedding
with a zeroed pad row + genre embedding broadcast-added,
models/music_lstm.py:108-115), and ``__call__`` has the same signature,
so the trainer, masked-CE loss, scoring, and checkpoint plumbing are
shared between both architectures.

Design notes (TPU-first):
- rotary position embeddings (RoPE) on q/k — no learned position table,
  so any bucket length compiles from the same params and the decode
  cache stores *rotated* keys (steps never revisit old positions).
- pre-LN residual blocks; softmax in fp32, everything else in the module
  ``dtype`` (bf16 under --bf16).
- decode path: ``prefill`` fills the KV cache for a whole prefix in one
  batched pass (MXU), then ``step`` extends it one token at a time under
  lax.scan (models/lm_sampling.py:generate_tokens_transformer).
- right-padded batches need no attention pad mask: causal attention only
  looks left, and with right padding every position left of a valid
  token is valid; pad positions produce garbage that the masked CE
  ignores (same argument as the LSTM, models/music_lstm.py:14-16).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Cache = Dict[str, jax.Array]  # {"k": (B, S, H, D), "v": (B, S, H, D)}


def _rope_angles(positions: jax.Array, head_dim: int) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for RoPE: positions (...,) -> (..., head_dim//2)."""
    half = head_dim // 2
    freqs = 10000.0 ** (-jnp.arange(half, dtype=jnp.float32) / half)
    ang = positions.astype(jnp.float32)[..., None] * freqs
    return jnp.cos(ang), jnp.sin(ang)


def _apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate pairs (x[..., :half], x[..., half:]) by the position angle.

    x: (B, T, H, D); cos/sin: (T, D//2) shared positions broadcast over
    batch and heads, or (B, T, D//2) per-row positions (the decode path
    where each batch row sits at its own absolute position).

    The rotation runs in fp32 regardless of the module dtype: cos/sin are
    fp32 tables and bf16 rotation loses positional precision at large
    absolute positions (the angles grow with position), so cast up,
    rotate, cast back.
    """
    half = x.shape[-1] // 2
    if cos.ndim == 2:  # (T, half) -> (1, T, half)
        cos, sin = cos[None], sin[None]
    cos = cos[:, :, None, :]  # (B|1, T, 1, half)
    sin = sin[:, :, None, :]
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., :half], xf[..., half:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos],
                          axis=-1)
    return out.astype(x.dtype)


class CausalSelfAttention(nn.Module):
    """Multi-head causal self-attention with RoPE and a step/prefill KV
    cache. Scores and softmax are computed in fp32."""

    features: int
    n_heads: int
    # flash=True routes the TRAINING forward (__call__) through the
    # Pallas TPU flash-attention kernel; prefill/step decode paths are
    # unchanged (their cost is cache-bound, not scores-bound)
    flash: bool = False
    # (block_q, block_k) VMEM tile for the flash kernel. None = OUR
    # measured default (1024, 1024), clamped to the sequence: the jax
    # library defaults (~128-class) LOSE 2.6x to these tiles AND to
    # naive XLA at L=2048 — the round-5 sweep
    # (results_r5_flash_sweep.json) shows q1024/k1024 beating naive
    # 1.49x at L=2048 B=8 and 3.44x at L=4096 B=4 (the r4 "flash loses
    # below L=4096" was entirely the library tiling)
    flash_blocks: Tuple[int, int] | None = None
    dtype: Any = None

    def setup(self):
        assert self.features % self.n_heads == 0
        assert (self.features // self.n_heads) % 2 == 0, "RoPE needs even head_dim"
        self.wq = nn.Dense(self.features, dtype=self.dtype, name="wq")
        self.wk = nn.Dense(self.features, dtype=self.dtype, name="wk")
        self.wv = nn.Dense(self.features, dtype=self.dtype, name="wv")
        self.wo = nn.Dense(self.features, dtype=self.dtype, name="wo")

    def _heads(self, x: jax.Array) -> jax.Array:
        b, t, _ = x.shape
        return x.reshape(b, t, self.n_heads, self.features // self.n_heads)

    def _qkv(self, x: jax.Array, positions: jax.Array):
        """positions: (T,) absolute positions of x's tokens."""
        q = self._heads(self.wq(x))
        k = self._heads(self.wk(x))
        v = self._heads(self.wv(x))
        cos, sin = _rope_angles(positions, q.shape[-1])
        return _apply_rope(q, cos, sin), _apply_rope(k, cos, sin), v

    def _attend(self, q: jax.Array, k: jax.Array, v: jax.Array,
                mask: jax.Array) -> jax.Array:
        """q: (B,Tq,H,D), k/v: (B,Tk,H,D), mask True=visible — shaped
        (Tq,Tk) shared, or (B,Tq,Tk) per-row (the per-row decode path)."""
        scale = (q.shape[-1]) ** -0.5
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        mask = mask[None, None] if mask.ndim == 2 else mask[:, None]
        scores = jnp.where(mask, scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd",
                         probs.astype(v.dtype), v)
        b, t = out.shape[:2]
        return self.wo(out.reshape(b, t, self.features))

    def _attend_flash(self, q: jax.Array, k: jax.Array,
                      v: jax.Array) -> jax.Array:
        """Causal attention via the Pallas TPU flash kernel: scores are
        tiled through VMEM with an online softmax instead of
        materializing the (B, H, T, T) matrix in HBM — the O(T^2) HBM
        traffic is what makes the naive path LOSE to the LSTM at long
        context (benchmarks/results_r4_longlm.json). Custom-VJP backward
        included. T pads up to the kernel's 128 grid (zero-padded keys
        sit AFTER every real key, so causal queries never see them)."""
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, flash_attention)

        b, t, h, d = q.shape
        tp = -(-t // 128) * 128
        qt = jnp.transpose(q, (0, 2, 1, 3))  # (B, H, T, D)
        kt = jnp.transpose(k, (0, 2, 1, 3))
        vt = jnp.transpose(v, (0, 2, 1, 3))
        if tp != t:
            pad = ((0, 0), (0, 0), (0, tp - t), (0, 0))
            qt, kt, vt = (jnp.pad(x, pad) for x in (qt, kt, vt))
        blocks = self.flash_blocks or (1024, 1024)
        bq = min(int(blocks[0]), tp)
        bk = min(int(blocks[1]), tp)
        block_sizes = BlockSizes(
            block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
            block_q_major_dkv=bq, block_k_major_dkv=bk,
            block_k_dkv=bk, block_q_dkv=bq,
            block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq)
        out = flash_attention(qt, kt, vt, causal=True, sm_scale=d ** -0.5,
                              block_sizes=block_sizes)
        out = jnp.transpose(out[:, :, :t], (0, 2, 1, 3))  # (B, T, H, D)
        return self.wo(out.reshape(b, t, h * d).astype(q.dtype))

    def __call__(self, x: jax.Array) -> jax.Array:
        t = x.shape[1]
        positions = jnp.arange(t)
        q, k, v = self._qkv(x, positions)
        if self.flash:
            return self._attend_flash(q, k, v)
        mask = jnp.tril(jnp.ones((t, t), bool))
        return self._attend(q, k, v, mask)

    def prefill(self, x: jax.Array, cache: Cache) -> Tuple[jax.Array, Cache]:
        """Full causal pass over a (B, T) prefix that also writes the
        rotated k / raw v for positions [0, T) into the cache."""
        t = x.shape[1]
        positions = jnp.arange(t)
        q, k, v = self._qkv(x, positions)
        mask = jnp.tril(jnp.ones((t, t), bool))
        out = self._attend(q, k, v, mask)
        cache = {
            "k": jax.lax.dynamic_update_slice_in_dim(
                cache["k"], k.astype(cache["k"].dtype), 0, axis=1),
            "v": jax.lax.dynamic_update_slice_in_dim(
                cache["v"], v.astype(cache["v"].dtype), 0, axis=1),
        }
        return out, cache

    def step(self, x: jax.Array, cache: Cache,
             idx: jax.Array) -> Tuple[jax.Array, Cache]:
        """One decode step: x (B, 1, E) at absolute position ``idx``."""
        q, k, v = self._qkv(x, jnp.asarray(idx)[None])
        cache = {
            "k": jax.lax.dynamic_update_slice_in_dim(
                cache["k"], k.astype(cache["k"].dtype), idx, axis=1),
            "v": jax.lax.dynamic_update_slice_in_dim(
                cache["v"], v.astype(cache["v"].dtype), idx, axis=1),
        }
        s = cache["k"].shape[1]
        mask = (jnp.arange(s) <= idx)[None, :]  # (1, S)
        out = self._attend(q, cache["k"].astype(k.dtype),
                           cache["v"].astype(v.dtype), mask)
        return out, cache

    def step_rows(self, x: jax.Array, cache: Cache,
                  idx: jax.Array) -> Tuple[jax.Array, Cache]:
        """One decode step with PER-ROW absolute positions: x (B, 1, E),
        idx (B,) int32 — row b's token sits at position idx[b]. This is
        what lets a coalesced serving batch mix prompt lengths: each row
        rotates, writes its KV, and masks at its own position
        (models/lm_sampling.py generate_tokens_*_served)."""
        q = self._heads(self.wq(x))
        k = self._heads(self.wk(x))
        v = self._heads(self.wv(x))
        cos, sin = _rope_angles(idx[:, None], q.shape[-1])  # (B, 1, half)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        s = cache["k"].shape[1]
        # per-row scatter (unique (b, idx[b]) coordinates): XLA updates
        # the donated scan-carry cache IN PLACE — a jnp.where over the
        # (B, S, H, D) cache here cost a full-cache rewrite per token
        # (~30x decode slowdown, measured in results_r4_lmserve.json)
        bidx = jnp.arange(idx.shape[0])
        cache = {
            "k": cache["k"].at[bidx, idx].set(
                k[:, 0].astype(cache["k"].dtype)),
            "v": cache["v"].at[bidx, idx].set(
                v[:, 0].astype(cache["v"].dtype)),
        }
        mask = (jnp.arange(s)[None, None, :]
                <= idx[:, None, None])  # (B, 1, S)
        out = self._attend(q, cache["k"].astype(k.dtype),
                           cache["v"].astype(v.dtype), mask)
        return out, cache


class TransformerBlock(nn.Module):
    """Pre-LN block: x + attn(ln(x)); x + mlp(ln(x))."""

    features: int
    n_heads: int
    mlp_dim: int
    dropout: float
    flash: bool = False
    flash_blocks: Tuple[int, int] | None = None
    dtype: Any = None

    def setup(self):
        self.ln1 = nn.LayerNorm(dtype=self.dtype, name="ln1")
        self.attn = CausalSelfAttention(self.features, self.n_heads,
                                        flash=self.flash,
                                        flash_blocks=self.flash_blocks,
                                        dtype=self.dtype, name="attn")
        self.ln2 = nn.LayerNorm(dtype=self.dtype, name="ln2")
        self.fc1 = nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc1")
        self.fc2 = nn.Dense(self.features, dtype=self.dtype, name="fc2")
        self.drop = nn.Dropout(rate=self.dropout)

    def _mlp(self, x: jax.Array) -> jax.Array:
        return self.fc2(jax.nn.gelu(self.fc1(x)))

    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = x + self.drop(self.attn(self.ln1(x)), deterministic=deterministic)
        x = x + self.drop(self._mlp(self.ln2(x)), deterministic=deterministic)
        return x

    def prefill(self, x: jax.Array, cache: Cache) -> Tuple[jax.Array, Cache]:
        a, cache = self.attn.prefill(self.ln1(x), cache)
        x = x + a
        return x + self._mlp(self.ln2(x)), cache

    def step(self, x: jax.Array, cache: Cache,
             idx: jax.Array) -> Tuple[jax.Array, Cache]:
        a, cache = self.attn.step(self.ln1(x), cache, idx)
        x = x + a
        return x + self._mlp(self.ln2(x)), cache

    def step_rows(self, x: jax.Array, cache: Cache,
                  idx: jax.Array) -> Tuple[jax.Array, Cache]:
        a, cache = self.attn.step_rows(self.ln1(x), cache, idx)
        x = x + a
        return x + self._mlp(self.ln2(x)), cache


class MusicTransformer(nn.Module):
    """Drop-in transformer sibling of MusicLSTM: identical call signature
    and conditioning semantics, so ``train/lstm_trainer.py --arch
    transformer`` reuses the whole training/eval/checkpoint path."""

    vocab_size: int
    num_genres: int
    emb_dim: int = 512
    n_layers: int = 6
    n_heads: int = 8
    mlp_ratio: int = 4
    pad_id: int = 0
    dropout: float = 0.1
    # per-block rematerialization for LONG-context training: the naive
    # causal attention materializes (B, H, L, L) fp32 scores per layer —
    # at L=4096 that is GBs per layer, so the backward pass must
    # recompute blocks instead of storing them. Identical numerics
    # (gradients equal, test-pinned); a throughput-for-memory trade.
    remat: bool = False
    # Pallas TPU flash attention for the training forward (see
    # CausalSelfAttention.flash); TPU-only — leave False on CPU
    flash: bool = False
    # flash kernel (block_q, block_k) VMEM tiling override (see
    # CausalSelfAttention.flash_blocks)
    flash_blocks: Tuple[int, int] | None = None
    dtype: Any = None

    def setup(self):
        self.tok_emb = nn.Embed(self.vocab_size, self.emb_dim,
                                dtype=self.dtype, name="tok_emb")
        self.genre_emb = nn.Embed(self.num_genres, self.emb_dim,
                                  dtype=self.dtype, name="genre_emb")
        blk_cls = (nn.remat(TransformerBlock, static_argnums=(2,))
                   if self.remat else TransformerBlock)
        self.blocks = [
            blk_cls(self.emb_dim, self.n_heads,
                    self.mlp_ratio * self.emb_dim, self.dropout,
                    flash=self.flash, flash_blocks=self.flash_blocks,
                    dtype=self.dtype, name=f"block_{i}")
            for i in range(self.n_layers)
        ]
        self.ln_f = nn.LayerNorm(dtype=self.dtype, name="ln_f")
        self.proj = nn.Dense(self.vocab_size, dtype=self.dtype, name="proj")

    def _embed(self, tokens: jax.Array, genre_ids: jax.Array) -> jax.Array:
        tok_e = self.tok_emb(tokens)
        # padding_idx semantics: pad rows contribute zero vectors
        # (reference train_music_lstm_v2.py:160; same as MusicLSTM)
        tok_e = jnp.where((tokens == self.pad_id)[..., None],
                          jnp.zeros((), tok_e.dtype), tok_e)
        return tok_e + self.genre_emb(genre_ids)[:, None, :]

    def __call__(
        self,
        tokens: jax.Array,  # (B, L) int
        genre_ids: jax.Array,  # (B,) int
        lengths: jax.Array | None = None,  # unused (masked CE handles pads)
        deterministic: bool = True,
    ) -> jax.Array:
        x = self._embed(tokens, genre_ids)
        for blk in self.blocks:
            x = blk(x, deterministic)  # positional: remat static_argnums
        return self.proj(self.ln_f(x))

    # -- decode-path methods (invoked via apply(..., method=...)) --------

    def prefill(self, tokens: jax.Array, genre_ids: jax.Array,
                caches: List[Cache],
                last_idx: jax.Array | None = None,
                ) -> Tuple[jax.Array, List[Cache]]:
        """Batched prefix pass filling every layer's KV cache at
        positions [0, T). Returns (logits (B, V), caches) — at the LAST
        position, or per-row at ``last_idx`` (B,) when given (row b's
        prefix ends at position last_idx[b]; positions past it are
        right-padding the causal mask never lets valid queries see)."""
        x = self._embed(tokens, genre_ids)
        new = []
        for blk, cache in zip(self.blocks, caches):
            x, cache = blk.prefill(x, cache)
            new.append(cache)
        if last_idx is None:
            h = x[:, -1]
        else:
            h = jnp.take_along_axis(
                x, last_idx.astype(jnp.int32)[:, None, None], axis=1)[:, 0]
        return self.proj(self.ln_f(h)), new

    def step(self, token: jax.Array, genre_ids: jax.Array,
             caches: List[Cache],
             idx: jax.Array) -> Tuple[jax.Array, List[Cache]]:
        """One decode step: token (B,) at absolute position ``idx``.
        Returns (logits (B, V), caches)."""
        x = self._embed(token[:, None], genre_ids)
        new = []
        for blk, cache in zip(self.blocks, caches):
            x, cache = blk.step(x, cache, idx)
            new.append(cache)
        return self.proj(self.ln_f(x[:, 0])), new

    def step_rows(self, token: jax.Array, genre_ids: jax.Array,
                  caches: List[Cache],
                  idx: jax.Array) -> Tuple[jax.Array, List[Cache]]:
        """``step`` with per-row absolute positions idx (B,) — the
        mixed-prompt-length decode path (CausalSelfAttention.step_rows).
        Equals ``step`` when every row shares the same position."""
        x = self._embed(token[:, None], genre_ids)
        new = []
        for blk, cache in zip(self.blocks, caches):
            x, cache = blk.step_rows(x, cache, idx)
            new.append(cache)
        return self.proj(self.ln_f(x[:, 0])), new


def init_cache(model: MusicTransformer, batch: int, max_total: int,
               dtype=jnp.float32) -> List[Cache]:
    """Per-layer KV cache covering absolute positions [0, max_total)."""
    head_dim = model.emb_dim // model.n_heads
    shape = (batch, max_total, model.n_heads, head_dim)
    return [
        {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
        for _ in range(model.n_layers)
    ]
