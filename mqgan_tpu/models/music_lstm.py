"""Genre-conditioned next-token LSTM over FSQ token streams.

Behavioral spec (reference train_music_lstm_v2.py:146-202): token embedding
(+ zeroed pad row) + genre embedding broadcast-added, 2-layer LSTM (1024)
via packed sequences, dropout, vocab projection.

TPU-first: the recurrence is a lax.scan over time with the INPUT-side
projections hoisted out of the scan — with right-padded batches the four
x@W_i* gate projections do not depend on the recurrent state, so they run
as one (B, L, E) @ (E, 4H) MXU matmul for the whole sequence and the scan
body keeps only the irreducibly sequential h @ W_h* contraction. The
param tree is EXACTLY flax's nn.RNN(nn.OptimizedLSTMCell) layout (the
rollout this replaced; equivalence pinned in tests/test_music_lstm.py),
so checkpoints are interchangeable. Packing is unnecessary with
right-padded batches: padded steps are excluded from the loss (masked
CE), and with right padding they can only contaminate later padded steps.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class HoistedLSTMLayer(nn.Module):
    """One LSTM layer, numerically equivalent to
    nn.RNN(nn.OptimizedLSTMCell(features)) with an identical param tree
    (ii/ig/if/io input kernels, hi/hg/hf/ho hidden kernels + biases).

    Gate equations (flax LSTMCell):
        i = sigmoid(x W_ii + h W_hi + b_hi)
        f = sigmoid(x W_if + h W_hf + b_hf)
        g = tanh   (x W_ig + h W_hg + b_hg)
        o = sigmoid(x W_io + h W_ho + b_ho)
        c' = f c + i g ;  h' = o tanh(c')
    """

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, L, E) -> (B, L, H)
        h_feat = self.features
        gate_order = ("i", "g", "f", "o")
        d_in = {g: nn.Dense(h_feat, use_bias=False, dtype=self.dtype,
                            name=f"i{g}") for g in gate_order}
        d_hid = {g: nn.Dense(h_feat, use_bias=True, dtype=self.dtype,
                             name=f"h{g}") for g in gate_order}
        # tiny dummy calls declare the OptimizedLSTMCell param tree; the
        # outputs are unused and DCE'd under jit
        for g in gate_order:
            _ = d_in[g](x[:1, :1])
            _ = d_hid[g](jnp.zeros((1, h_feat), x.dtype))

        cdt = self.dtype or x.dtype
        w_in = jnp.concatenate(
            [d_in[g].variables["params"]["kernel"].astype(cdt)
             for g in gate_order], axis=1)  # (E, 4H)
        w_hid = jnp.concatenate(
            [d_hid[g].variables["params"]["kernel"].astype(cdt)
             for g in gate_order], axis=1)  # (H, 4H)
        bias = jnp.concatenate(
            [d_hid[g].variables["params"]["bias"].astype(cdt)
             for g in gate_order], axis=0)  # (4H,)

        # the whole sequence's input-side gate pre-activations in ONE matmul
        zx = x.astype(cdt) @ w_in + bias  # (B, L, 4H)

        def body(carry, z_t):
            c, h = carry
            gates = z_t + h @ w_hid
            zi, zg, zf, zo = jnp.split(gates, 4, axis=-1)
            i = jax.nn.sigmoid(zi)
            g = jnp.tanh(zg)
            f = jax.nn.sigmoid(zf)
            o = jax.nn.sigmoid(zo)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (c, h), h

        b = x.shape[0]
        init = (jnp.zeros((b, h_feat), cdt), jnp.zeros((b, h_feat), cdt))
        _, ys = jax.lax.scan(body, init, zx.swapaxes(0, 1))
        return ys.swapaxes(0, 1)


class MusicLSTM(nn.Module):
    vocab_size: int
    num_genres: int
    emb_dim: int = 512
    lstm_hid: int = 1024
    lstm_layers: int = 2
    pad_id: int = 0
    dropout: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        tokens: jax.Array,  # (B, L) int
        genre_ids: jax.Array,  # (B,) int
        lengths: jax.Array | None = None,  # (B,) valid lengths incl. BOS
        deterministic: bool = True,
    ) -> jax.Array:
        tok_e = nn.Embed(self.vocab_size, self.emb_dim, dtype=self.dtype,
                         name="tok_emb")(tokens)
        # padding_idx semantics: pad rows contribute zero vectors
        tok_e = jnp.where((tokens == self.pad_id)[..., None],
                          jnp.zeros((), tok_e.dtype), tok_e)
        gen_e = nn.Embed(self.num_genres, self.emb_dim, dtype=self.dtype,
                         name="genre_emb")(genre_ids)[:, None, :]
        x = tok_e + gen_e

        for i in range(self.lstm_layers):
            x = HoistedLSTMLayer(self.lstm_hid, dtype=self.dtype,
                                 name=f"lstm_{i}")(x)

        x = nn.Dropout(rate=self.dropout, deterministic=deterministic)(x)
        logits = nn.Dense(self.vocab_size, dtype=self.dtype, name="proj")(x)
        return logits


def masked_ce_loss(
    logits: jax.Array,  # (B, L, V)
    targets: jax.Array,  # (B, L) int
    pad_id: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Cross-entropy with ignore_index=pad_id (reference
    train_music_lstm_v2.py:542). Returns (mean_loss, n_valid)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    valid = (targets != pad_id).astype(jnp.float32)
    n = jnp.maximum(jnp.sum(valid), 1.0)
    return jnp.sum(nll * valid) / n, jnp.sum(valid)
