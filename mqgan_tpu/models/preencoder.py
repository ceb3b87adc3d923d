"""PreEncoder — FSQ-quantized convolutional mel autoencoder + UNet refiner.

Behavioral spec (reference preencoder.py:304-504):

  in-proj Linear mel->ch0 -> 2-D mel-mixer -> N non-causal ResidualBlock1D
  (taptx, weight norm) -> Linear ch->len(fsq_levels) -> FSQ -> Linear back
  -> N *causal* ResidualBlock1D in reversed channel order -> mel-mixer ->
  out-proj Linear -> x_recon;
  refiner input = concat(x_recon, Linear(decoder hidden) -> mel/8 ch),
  **stop-gradient** so only the refiner receives GAN gradients
  (preencoder.py:413-414); x_post = x_recon + refiner residual.

Everything is channels-last (B, T, C); no permutes anywhere. `encode`
returns packed FSQ indices, `decode` reconstructs the refined mel from
indices — the deployment pair traced by the reference TorchScript export
(preencoder.py:420-504).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mqgan_tpu.core.config import GeneratorConfig
from mqgan_tpu.core.masking import sequence_mask
from mqgan_tpu.nn.blocks import ResidualBlock1D
from mqgan_tpu.nn.mixer2d import MelMixer2D
from mqgan_tpu.nn.unet import UNetRefiner
from mqgan_tpu.quant.fsq import FSQ


class PreEncoder(nn.Module):
    mel_channels: int
    channels: Tuple[int, ...] = (512, 512, 512, 768)
    kernel_sizes: Tuple[int, ...] = (3, 3, 5, 7)
    fsq_levels: Tuple[int, ...] = (8, 5, 5, 5)
    dropout: float = 0.1
    refiner_base_channels: int = 128
    refiner_depth: int = 3
    refiner_hidden_proj_divisor: int = 8
    fsq_noise_dropout: float = 0.0
    # Memory-relief mode for large-batch training: evaluate the mel-mixer
    # pointwise-MLPs in checkpointed time chunks so their APTx hiddens —
    # (B, T, mel, channels[0]), 8 GB apiece at B=64 T=256 flagship, the
    # tensors that otherwise OOM one chip (measured 29.1 G of 15.75 G HBM)
    # — never materialize. Only the chunked stages recompute in backward.
    remat: bool = False
    # also recompute refiner ConvBlocks in the backward (GeneratorConfig
    # .remat_refiner): needed when the refiner's own feature-map temps are
    # the binding HBM allocation (hifimusic-scale refiners at B=64)
    remat_refiner: bool = False
    # Serving-only: run the refiner's wide ConvBlocks on the int8 MXU path
    # (measured 1.32x vs bf16 per conv incl. dynamic quantization; ~1e-2
    # output deviation). Ignored in training (non-deterministic calls fall
    # back). Same param tree — flip it on any trained checkpoint.
    int8_refiner: bool = False
    # Serving-only: evaluate each mel-mixer's pointwise MLP as a Chebyshev
    # interpolant of its exact scalar map (ops/mixer_poly.py) instead of the
    # `channels[0]`-wide APTx expansion — the mixers are VPU-transcendental-
    # bound (benchmarks/README.md "Mixer VPU roofline"). Ignored in training
    # (non-deterministic calls fall back). Same param tree — flip it on any
    # trained checkpoint. Values: False | True (both mixers) | "decode"
    # (post mixer only) | "encode" (pre mixer only). The ~1e-4 pre-mixer
    # perturbation can flip FSQ codes that sit on a rounding boundary
    # (any such flip changes the decode by a whole code step), so "decode"
    # is the conservative serving choice: tokens stay bit-identical to the
    # exact path and only the continuous decode output carries the
    # approximation error.
    poly_mixers: bool | str = False
    # EXPERIMENTAL (training): moment-matched Gaussian dropout on the mixer
    # hiddens instead of Bernoulli masks — see GeneratorConfig.fast_dropout.
    fast_dropout: bool = False
    # chunk size for the remat mixer-hidden evaluation (GeneratorConfig
    # .mixer_chunk_t)
    mixer_chunk_t: int = 32
    dtype: jnp.dtype | None = None

    @classmethod
    def from_config(cls, mel_channels: int, cfg: GeneratorConfig, dtype=None):
        return cls(
            mel_channels=mel_channels,
            channels=tuple(cfg.channels),
            kernel_sizes=tuple(cfg.kernel_sizes),
            fsq_levels=tuple(cfg.fsq_levels),
            dropout=cfg.dropout,
            refiner_base_channels=cfg.refiner_base_channels,
            refiner_depth=cfg.refiner_depth,
            refiner_hidden_proj_divisor=cfg.refiner_hidden_proj_divisor,
            fsq_noise_dropout=cfg.fsq_noise_dropout,
            remat=cfg.remat,
            remat_refiner=cfg.remat_refiner,
            fast_dropout=cfg.fast_dropout,
            mixer_chunk_t=cfg.mixer_chunk_t,
            dtype=dtype,
        )

    @property
    def codebook_size(self) -> int:
        size = 1
        for level in self.fsq_levels:
            size *= level
        return size

    @property
    def bos_token_id(self) -> int:
        return self.codebook_size + 1  # reference preencoder.py:340

    @property
    def eos_token_id(self) -> int:
        return self.codebook_size + 2  # reference preencoder.py:341

    def setup(self):
        ch = self.channels
        # __call__ args: (self, x, pad_mask, deterministic, return_hidden)
        # remat == chunk the mixer hiddens: the (B, T, mel, ch[0]) hiddens
        # (8 GB each at flagship B=64 T=256) are what OOMs large batches;
        # per-chunk checkpointing alone removes them. Module-level remat of
        # the mixers/refiner on top was measured strictly worse (the remat
        # recompute re-materializes the mixer work a second time and the
        # refiner recompute costs ~a full extra forward for ~1 GB of temps).
        mixer_chunk = self.mixer_chunk_t if self.remat else None
        poly_pre = self.poly_mixers in (True, "encode", "both")
        poly_post = self.poly_mixers in (True, "decode", "both")
        self.proj = nn.Dense(ch[0], dtype=self.dtype, name="proj")
        self.pre = MelMixer2D(
            features=ch[0], kernel_size=5, depthwise=True, act="aptx",
            dropout=0.1, hidden_chunk_t=mixer_chunk,
            poly_approx=poly_pre, fast_dropout=self.fast_dropout,
            dtype=self.dtype,
            name="pre",
        )
        self.encoder_blocks = [
            ResidualBlock1D(
                ch[i], ch[i + 1], kernel_size=self.kernel_sizes[i],
                dropout=self.dropout, act="taptx", causal=False, norm="weight",
                dtype=self.dtype, name=f"encoder_blocks_{i}",
            )
            for i in range(len(ch) - 1)
        ]
        self.quantizer_dim = len(self.fsq_levels)
        self.q_in_proj = nn.Dense(self.quantizer_dim, dtype=self.dtype, name="q_in_proj")
        self.quantizer = FSQ(
            levels=tuple(self.fsq_levels), noise_dropout=self.fsq_noise_dropout,
            name="quantizer",
        )
        self.q_out_proj = nn.Dense(ch[-1], dtype=self.dtype, name="q_out_proj")

        rev_ch = list(reversed(ch))
        rev_ks = list(reversed(self.kernel_sizes))
        self.decoder_blocks = [
            ResidualBlock1D(
                rev_ch[i], rev_ch[i + 1], kernel_size=rev_ks[i],
                dropout=self.dropout, act="taptx", causal=True, norm="weight",
                dtype=self.dtype, name=f"decoder_blocks_{i}",
            )
            for i in range(len(rev_ch) - 1)
        ]
        self.post = MelMixer2D(
            features=ch[0], kernel_size=5, depthwise=True, act="aptx",
            dropout=0.1, hidden_chunk_t=mixer_chunk,
            poly_approx=poly_post, fast_dropout=self.fast_dropout,
            dtype=self.dtype,
            name="post",
        )
        self.out_proj = nn.Dense(self.mel_channels, dtype=self.dtype, name="out_proj")

        self.refiner_hidden_channels = (
            self.mel_channels // self.refiner_hidden_proj_divisor
        )
        self.hidden_proj = nn.Dense(
            self.refiner_hidden_channels, dtype=self.dtype, name="hidden_proj"
        )
        self.refiner = UNetRefiner(
            base_ch=self.refiner_base_channels, depth=self.refiner_depth,
            dropout=0.1, out_features=self.mel_channels, dtype=self.dtype,
            int8=self.int8_refiner, remat=self.remat_refiner, name="refiner",
        )

    # ------------------------------------------------------------------
    def _encode_trunk(self, x, pad_mask, deterministic,
                      stats_mask=None, seq_axis=None):
        h = self.proj(x)
        # positional: remat static_argnums applies to positional args only
        h = self.pre(h, pad_mask, deterministic, False)
        for block in self.encoder_blocks:
            h = block(h, pad_mask, deterministic=deterministic,
                      stats_mask=stats_mask, seq_axis=seq_axis)
        return self.q_in_proj(h)

    def _decode_trunk(self, codes, pad_mask, deterministic):
        h = self.q_out_proj(codes)
        for block in self.decoder_blocks:
            h = block(h, pad_mask, deterministic=deterministic)
        decoder_out = h
        r = self.post(decoder_out, pad_mask, deterministic, False)
        x_recon = self.out_proj(r)
        return x_recon, decoder_out

    def _refine(self, x_recon, decoder_out, pad_mask, deterministic):
        hidden = self.hidden_proj(decoder_out)
        refiner_in = jnp.concatenate([x_recon, hidden], axis=-1)
        # Detach: only the refiner receives GAN gradients (preencoder.py:413-414).
        residual = self.refiner(
            jax.lax.stop_gradient(refiner_in), pad_mask, deterministic=deterministic
        )
        return x_recon + residual

    # ------------------------------------------------------------------
    def __call__(
        self,
        x: jax.Array,  # (B, T, mel)
        lengths: jax.Array,  # (B,)
        deterministic: bool = True,
    ):
        """Training forward: returns (x_recon, x_post, indices).

        The reference forward returns (x_recon, x_post) (preencoder.py:363-418);
        we additionally expose the token indices for metrics.
        """
        pad_mask = sequence_mask(x.shape[1], lengths)
        z = self._encode_trunk(x, pad_mask, deterministic)
        codes, indices = self.quantizer(z, training=not deterministic)
        x_recon, decoder_out = self._decode_trunk(codes, pad_mask, deterministic)
        x_post = self._refine(x_recon, decoder_out, pad_mask, deterministic)
        return x_recon, x_post, indices

    def encode(
        self,
        x: jax.Array,  # (B, T, mel)
        pad_mask: jax.Array | None = None,  # (B, T) True=pad
        stats_mask: jax.Array | None = None,  # (B, T) True=exclude from CBAM stats
        seq_axis: str | None = None,  # mesh axis to reduce CBAM stats over
    ) -> jax.Array:
        """mel -> packed FSQ indices (B, T) int32 (reference preencoder.py:420-451).

        ``stats_mask``/``seq_axis``: sequence parallelism (parallel/
        seqpar.py) — the CBAM channel gates' global pooled statistics are
        taken over each device's interior frames and psum/pmax-reduced
        over the mesh axis, making a time-sharded encode EXACT vs a
        single full-length pass (not just conv-exact)."""
        if pad_mask is None:
            pad_mask = jnp.zeros(x.shape[:2], bool)
        z = self._encode_trunk(x, pad_mask, deterministic=True,
                               stats_mask=stats_mask, seq_axis=seq_axis)
        _, indices = self.quantizer(z, training=False)
        return indices

    def decode(
        self,
        indices: jax.Array,  # (B, T) int
        pad_mask: jax.Array | None = None,
        return_hidden: bool = False,
        return_recon: bool = False,
    ):
        """indices -> refined mel (B, T, mel) (reference preencoder.py:453-504;
        inference returns only the refined x_post). return_recon
        additionally yields the pre-refiner x_recon (eval wants both)."""
        if pad_mask is None:
            pad_mask = jnp.zeros(indices.shape[:2], bool)
        from mqgan_tpu.quant.fsq import indices_to_codes

        codes = indices_to_codes(indices, self.quantizer.spec).astype(
            self.dtype or jnp.float32
        )
        x_recon, decoder_out = self._decode_trunk(codes, pad_mask, deterministic=True)
        x_post = self._refine(x_recon, decoder_out, pad_mask, deterministic=True)
        if return_hidden:
            return x_post, decoder_out
        if return_recon:
            return x_post, x_recon
        return x_post
