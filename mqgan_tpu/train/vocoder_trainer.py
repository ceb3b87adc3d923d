"""Vocoder pretraining CLI — mel -> waveform (net-new capability).

Trains the in-framework iSTFTNet-style generator (models/istft_vocoder.py)
with the multi-resolution STFT objective + waveform L1, giving users a
complete self-contained mel->audio chain (the reference requires external
pretrained TorchScript weights). Adversarial waveform discriminators are a
planned extension; spectral pretraining alone already vocodes intelligibly
and is the standard warm-start for GAN fine-tuning.

Constraint: prod(upsample_rates) * istft_hop must equal the mel hop length.

Usage: python -m mqgan_tpu.train.vocoder_trainer --wav_dir D
       --spec_config spec.yaml --out_dir RUN [--steps N] [...]
"""

from __future__ import annotations

import argparse
import os
import time
from typing import List

import numpy as np

import jax
import jax.numpy as jnp
import optax

from mqgan_tpu.core.config import SpecConfig
from mqgan_tpu.losses.stft_loss import multi_resolution_stft_loss
from mqgan_tpu.models.istft_vocoder import ISTFTNetGenerator
from mqgan_tpu.signal.audio import load_audio, resample, to_mono
from mqgan_tpu.signal.mel import MelFrontend
from mqgan_tpu.signal.stft import istft
from mqgan_tpu.utils.logging import MetricsLogger


def find_wavs(wav_dir: str) -> List[str]:
    out = []
    for root, _, files in os.walk(wav_dir):
        for fn in files:
            if fn.lower().endswith((".wav", ".wave", ".npy")):
                out.append(os.path.join(root, fn))
    return sorted(out)


class SegmentSampler:
    """Random fixed-length waveform segments + their log-mels."""

    def __init__(self, files, spec_cfg, segment_frames: int, seed: int = 0):
        self.spec = spec_cfg.spectrogram
        self.frontend = MelFrontend(self.spec)
        self.segment_frames = segment_frames
        self.segment_samples = segment_frames * self.spec.hop_length
        self.rng = np.random.default_rng(seed)
        self.wavs = []
        for path in files:
            try:
                wav, sr = load_audio(path)
                if sr and sr != self.spec.sampling_rate:
                    wav = resample(wav, sr, self.spec.sampling_rate)
                wav = to_mono(wav)[0]
                if wav.shape[0] >= self.segment_samples:
                    self.wavs.append(wav.astype(np.float32))
            except Exception as e:  # noqa: BLE001
                print(f"skipping {path}: {e}")
        if not self.wavs:
            raise ValueError("no usable wav files (need >= segment length)")
        print(f"{len(self.wavs)} usable clips")

    def batch(self, batch_size: int):
        segs = np.zeros((batch_size, self.segment_samples), np.float32)
        for i in range(batch_size):
            w = self.wavs[self.rng.integers(len(self.wavs))]
            start = self.rng.integers(0, w.shape[0] - self.segment_samples + 1)
            segs[i] = w[start : start + self.segment_samples]
        mel = np.asarray(self.frontend(jnp.asarray(segs)))  # (B, F+1, M)
        # trim to exactly segment_frames (center-padded stft gives +1)
        mel = mel[:, : self.segment_frames]
        return jnp.asarray(np.transpose(mel, (0, 2, 1))), jnp.asarray(segs)


def main(argv=None):
    p = argparse.ArgumentParser(description="Pretrain the iSTFTNet-style vocoder.")
    p.add_argument("--wav_dir", required=True)
    p.add_argument("--spec_config", required=True)
    p.add_argument("--out_dir", default="logs/vocoder-run1")
    p.add_argument("--steps", type=int, default=100000)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--segment_frames", type=int, default=32)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--save_every", type=int, default=5000)
    p.add_argument("--upsample_rates", type=int, nargs="+", default=[8, 8])
    p.add_argument("--istft_n_fft", type=int, default=16)
    p.add_argument("--upsample_initial_channel", type=int, default=512)
    p.add_argument("--wav_l1_lambda", type=float, default=0.0)
    args = p.parse_args(argv)

    spec_cfg = SpecConfig.from_yaml(args.spec_config)
    hop = spec_cfg.spectrogram.hop_length
    total_up = int(np.prod(args.upsample_rates))
    assert hop % total_up == 0, (
        f"prod(upsample_rates)={total_up} must divide hop_length={hop}"
    )
    istft_hop = hop // total_up

    gen = ISTFTNetGenerator(
        n_mels=spec_cfg.spectrogram.n_mel_channels,
        upsample_rates=tuple(args.upsample_rates),
        upsample_kernel_sizes=tuple(2 * r + 1 for r in args.upsample_rates),
        upsample_initial_channel=args.upsample_initial_channel,
        istft_n_fft=args.istft_n_fft,
    )

    sampler = SegmentSampler(find_wavs(args.wav_dir), spec_cfg,
                             args.segment_frames, args.seed)
    mel0, wav0 = sampler.batch(args.batch_size)
    params = jax.jit(gen.init)(jax.random.key(args.seed), mel0)
    n_params = sum(np.prod(np.shape(x)) for x in jax.tree.leaves(params))
    print(f"Generator parameters: {n_params / 1e6:.2f} M; "
          f"istft hop {istft_hop}, total upsample {total_up}")

    tx = optax.adamw(args.lr)
    opt = tx.init(params)
    os.makedirs(args.out_dir, exist_ok=True)
    logger = MetricsLogger(args.out_dir, run_name="vocoder")

    n_fft = args.istft_n_fft
    target_len = args.segment_frames * hop

    def loss_fn(p, mel, wav):
        spec, phase = gen.apply(p, mel)
        pred = istft(spec, phase, n_fft, istft_hop, n_fft)[:, 0, :]
        n = min(pred.shape[1], target_len)
        loss = multi_resolution_stft_loss(pred[:, :n], wav[:, :n])
        if args.wav_l1_lambda:
            loss = loss + args.wav_l1_lambda * jnp.mean(
                jnp.abs(pred[:, :n] - wav[:, :n])
            )
        return loss

    @jax.jit
    def step(p, o, mel, wav):
        loss, grads = jax.value_and_grad(loss_fn)(p, mel, wav)
        ok = jnp.isfinite(loss)
        grads = jax.tree.map(lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
        updates, o2 = tx.update(grads, o, p)
        p2 = optax.apply_updates(p, updates)
        keep = lambda new, old: jnp.where(ok, new, old)
        return jax.tree.map(keep, p2, p), jax.tree.map(keep, o2, o), loss

    t0 = time.time()
    for i in range(1, args.steps + 1):
        mel, wav = sampler.batch(args.batch_size)
        params, opt, loss = step(params, opt, mel, wav)
        if i % args.log_every == 0 or i == 1:
            logger.log({"vocoder/loss": float(loss),
                        "steps_per_sec": i / (time.time() - t0)}, step=i)
            print(f"step {i}: loss {float(loss):.4f}")
        if i % args.save_every == 0 or i == args.steps:
            from mqgan_tpu.utils.checkpoint import save_generator_only

            path = save_generator_only(args.out_dir, jax.device_get(params),
                                       f"vocoder_step_{i}")
            print(f"saved {path}")

    logger.close()
    print("Vocoder training finished.")


if __name__ == "__main__":
    main()
