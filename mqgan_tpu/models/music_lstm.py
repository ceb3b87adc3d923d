"""Genre-conditioned next-token LSTM over FSQ token streams.

Behavioral spec (reference train_music_lstm_v2.py:146-202): token embedding
(+ zeroed pad row) + genre embedding broadcast-added, 2-layer LSTM (1024)
via packed sequences, dropout, vocab projection.

TPU-first: the recurrence is flax nn.RNN (lax.scan over time — XLA compiles
the cell's matmuls onto the MXU and pipelines the scan). Packing is
unnecessary with right-padded batches: padded steps are excluded from the
loss (masked CE), and with right padding they can only contaminate later
padded steps.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


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
            cell = nn.OptimizedLSTMCell(self.lstm_hid, dtype=self.dtype,
                                        name=f"lstm_{i}")
            x = nn.RNN(cell, name=f"rnn_{i}")(x)

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
