"""Vocoder pretraining CLI — mel -> waveform (net-new capability).

Trains the in-framework iSTFTNet-style generator (models/istft_vocoder.py)
with the multi-resolution STFT objective + waveform L1, giving users a
complete self-contained mel->audio chain (the reference requires external
pretrained TorchScript weights). With --adversarial, HiFi-GAN-style MPD/MSD
waveform discriminators (models/wave_discriminators.py) join after
--adv_start_step with LSGAN + feature-matching objectives — spectral
pretraining first is the standard warm-start.

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
from mqgan_tpu.models.wave_discriminators import (
    adversarial_d_loss,
    adversarial_g_loss,
    feature_matching_loss,
)
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


def make_adv_step(gen, mpd, msd, tx, d_tx, *, n_fft, istft_hop, target_len,
                  stft_lambda=45.0, adv_lambda=1.0, fm_lambda=2.0):
    """The full adversarial step (D update, then G update incl. FM) as a
    pure function (p, o, dp, do, mel, wav) -> (p, o, dp, do, metrics) —
    module-level so benchmarks/probe_vocoder_adv.py chain-measures the
    REAL step (VERDICT r4 #3) and the CLI jits the same code."""

    def synth(p, mel):
        spec, phase = gen.apply(p, mel)
        return istft(spec, phase, n_fft, istft_hop, n_fft)[:, 0, :]

    def adv_step_fn(p, o, dp, do, mel, wav):
        # crop both to the common static length (the iSTFT output is a
        # few samples shorter than segment_frames * hop)
        n_common = min(
            n_fft + istft_hop * (mel.shape[2] * gen.total_upsample - 1)
            - 2 * (n_fft // 2),
            target_len,
        )
        wav = wav[:, :n_common]
        fake = jax.lax.stop_gradient(synth(p, mel))[:, :n_common]

        # D update
        def d_loss_fn(dp):
            ro, _ = mpd.apply({"params": dp["mpd"]}, wav)
            fo, _ = mpd.apply({"params": dp["mpd"]}, fake)
            ro2, _ = msd.apply({"params": dp["msd"]}, wav)
            fo2, _ = msd.apply({"params": dp["msd"]}, fake)
            return adversarial_d_loss([ro, ro2], [fo, fo2])

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(dp)
        d_ok = jnp.isfinite(d_loss)
        d_grads = jax.tree.map(
            lambda g: jnp.where(d_ok, g, jnp.zeros_like(g)), d_grads)
        d_upd, do2 = d_tx.update(d_grads, do, dp)
        dp2 = optax.apply_updates(dp, d_upd)
        d_keep = lambda new, old: jnp.where(d_ok, new, old)
        dp2 = jax.tree.map(d_keep, dp2, dp)
        do2 = jax.tree.map(d_keep, do2, do)

        # G update vs updated D
        def g_loss_fn(p):
            pred = synth(p, mel)[:, :n_common]
            _, rf = mpd.apply({"params": dp2["mpd"]}, wav)
            _, rf2 = msd.apply({"params": dp2["msd"]}, wav)
            fo, ff = mpd.apply({"params": dp2["mpd"]}, pred)
            fo2, ff2 = msd.apply({"params": dp2["msd"]}, pred)
            stft_l = multi_resolution_stft_loss(pred, wav)
            g_adv = adversarial_g_loss([fo, fo2])
            fm = feature_matching_loss([*rf, *rf2], [*ff, *ff2])
            total = (stft_lambda * stft_l + adv_lambda * g_adv
                     + fm_lambda * fm)
            return total, (stft_l, g_adv, fm)

        (g_total, (stft_l, g_adv, fm)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(p)
        ok = jnp.isfinite(g_total)
        g_grads = jax.tree.map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), g_grads)
        upd, o2 = tx.update(g_grads, o, p)
        p2 = optax.apply_updates(p, upd)
        keep = lambda new, old: jnp.where(ok, new, old)
        return (jax.tree.map(keep, p2, p), jax.tree.map(keep, o2, o),
                dp2, do2,
                {"g_total": g_total, "stft": stft_l, "adv": g_adv,
                 "fm": fm, "d_loss": d_loss})

    return adv_step_fn


def main(argv=None):
    from mqgan_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # honor JAX_PLATFORMS even under site overrides
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
    p.add_argument("--adversarial", action="store_true")
    p.add_argument("--adv_start_step", type=int, default=0)
    p.add_argument("--adv_lambda", type=float, default=1.0)
    p.add_argument("--fm_lambda", type=float, default=2.0)
    p.add_argument("--stft_lambda", type=float, default=45.0,
                   help="MR-STFT weight when adversarial terms are active")
    p.add_argument("--d_lr", type=float, default=2e-4)
    p.add_argument("--mpd_periods", type=int, nargs="+", default=[2, 3, 5, 7, 11])
    p.add_argument("--msd_scales", type=int, default=3)
    p.add_argument("--export_dir", default=None,
                   help="after training, export the deployable ISTFTNetFE "
                        "artifact (signal/vocoder.py load_ts format) here")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute / fp32 params: the conv stack runs "
                        "in bf16 on the MXU (the generator's spec/phase "
                        "heads and the MR-STFT loss stay fp32) — measured "
                        "per-component fp32-vs-bf16 rates in "
                        "benchmarks/probe_vocoder.json")
    args = p.parse_args(argv)

    spec_cfg = SpecConfig.from_yaml(args.spec_config)
    hop = spec_cfg.spectrogram.hop_length
    total_up = int(np.prod(args.upsample_rates))
    assert hop % total_up == 0, (
        f"prod(upsample_rates)={total_up} must divide hop_length={hop}"
    )
    istft_hop = hop // total_up
    assert istft_hop * 2 <= args.istft_n_fft, (
        f"istft_hop={istft_hop} needs istft_n_fft >= {2 * istft_hop} for "
        f"overlap-add coverage (increase --istft_n_fft or add upsampling)"
    )

    gen = ISTFTNetGenerator(
        n_mels=spec_cfg.spectrogram.n_mel_channels,
        upsample_rates=tuple(args.upsample_rates),
        upsample_kernel_sizes=tuple(2 * r + 1 for r in args.upsample_rates),
        upsample_initial_channel=args.upsample_initial_channel,
        istft_n_fft=args.istft_n_fft,
        dtype=jnp.bfloat16 if args.bf16 else None,
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

    # ---- optional adversarial stage --------------------------------
    adv_step = None
    d_params = d_opt = None
    if args.adversarial:
        from mqgan_tpu.models.wave_discriminators import (
            MultiPeriodDiscriminator,
            MultiScaleDiscriminator,
        )

        mpd = MultiPeriodDiscriminator(periods=tuple(args.mpd_periods))
        msd = MultiScaleDiscriminator(n_scales=args.msd_scales)
        wav_ex = jnp.zeros((args.batch_size, target_len))
        d_params = {
            "mpd": jax.jit(mpd.init)(jax.random.key(1), wav_ex)["params"],
            "msd": jax.jit(msd.init)(jax.random.key(2), wav_ex)["params"],
        }
        d_tx = optax.adamw(args.d_lr)
        d_opt = d_tx.init(d_params)

        adv_step = jax.jit(make_adv_step(
            gen, mpd, msd, tx, d_tx, n_fft=n_fft, istft_hop=istft_hop,
            target_len=target_len, stft_lambda=args.stft_lambda,
            adv_lambda=args.adv_lambda, fm_lambda=args.fm_lambda))

    t0 = time.time()
    for i in range(1, args.steps + 1):
        mel, wav = sampler.batch(args.batch_size)
        m = None
        if adv_step is not None and i > args.adv_start_step:
            params, opt, d_params, d_opt, m = adv_step(
                params, opt, d_params, d_opt, mel, wav)
            loss = m["g_total"]
        else:
            params, opt, loss = step(params, opt, mel, wav)
        if i % args.log_every == 0 or i == 1:
            # device fetches only at log points (keeps dispatch async)
            extra = ({f"vocoder/{k}": float(val) for k, val in m.items()}
                     if m is not None else {})
            logger.log({"vocoder/loss": float(loss), **extra,
                        "steps_per_sec": i / (time.time() - t0)}, step=i)
            print(f"step {i}: loss {float(loss):.4f}")
        if i % args.save_every == 0 or i == args.steps:
            from mqgan_tpu.utils.checkpoint import save_generator_only

            path = save_generator_only(args.out_dir, jax.device_get(params),
                                       f"vocoder_step_{i}")
            if d_params is not None:
                save_generator_only(args.out_dir, jax.device_get(d_params),
                                    f"vocoder_disc_step_{i}")
            print(f"saved {path}")

    if args.export_dir:
        from mqgan_tpu.models.istft_vocoder import build_vocoder_fe

        fe = build_vocoder_fe(gen, params, istft_hop=istft_hop)
        fe.export_ts(args.export_dir,
                     sampling_rate=spec_cfg.spectrogram.sampling_rate,
                     mel_channels=spec_cfg.spectrogram.n_mel_channels,
                     example_frames=args.segment_frames)
        print(f"exported deployable vocoder to {args.export_dir}")

    logger.close()
    print("Vocoder training finished.")


if __name__ == "__main__":
    main()
