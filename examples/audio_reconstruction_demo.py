"""End-to-end audio reconstruction demo.

Script equivalent of the reference audio_reconstruction_demo.ipynb: load a
wav, extract log-mels with the project front end, encode to FSQ tokens,
decode back to a refined mel, vocode to a waveform, and write the result —
with the notebook's config-consistency assertions (mel channels / sample
rate, demo cell 2).

Vocoder options:
  --vocoder_dir  an exported ISTFTNetFE artifact (signal/vocoder.py)
  (default)      Griffin-Lim fallback (signal/griffin_lim.py) — no external
                 weights needed

Codec options:
  --model_dir    exported StableHLO codec (deploy/export.py)
  --checkpoint + --config   raw checkpoint
  --random      untrained random weights (pipeline smoke demo)

Usage:
  python examples/audio_reconstruction_demo.py --wav in.wav --out out.wav \
      --spec_config spec.yaml [--model_dir EXPORT | --random --config m.yaml]
"""

from __future__ import annotations

import argparse
import os
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_wav(path: str, wav_f32: np.ndarray, sr: int):
    pcm = (np.clip(wav_f32, -1, 1) * 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wav", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--spec_config", required=True)
    p.add_argument("--model_dir")
    p.add_argument("--checkpoint")
    p.add_argument("--config")
    p.add_argument("--random", action="store_true",
                   help="random untrained codec weights (smoke demo)")
    p.add_argument("--vocoder_dir", help="exported ISTFTNetFE artifact")
    p.add_argument("--gl_iters", type=int, default=32)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mqgan_tpu.core.config import SpecConfig, TrainConfig
    from mqgan_tpu.signal.audio import load_audio, resample, to_mono
    from mqgan_tpu.signal.mel import MelFrontend

    spec_cfg = SpecConfig.from_yaml(args.spec_config)
    s = spec_cfg.spectrogram

    # ---- 1. wav -> log-mel --------------------------------------------
    wav, sr = load_audio(args.wav)
    if sr and sr != s.sampling_rate:
        wav = resample(wav, sr, s.sampling_rate)
    wav = to_mono(wav)
    frontend = MelFrontend(s)
    mel = np.asarray(frontend(jnp.asarray(wav[0])))  # (T, n_mels)
    print(f"mel: {mel.shape}, range [{mel.min():.2f}, {mel.max():.2f}]")

    # ---- 2. codec ------------------------------------------------------
    if args.model_dir:
        from mqgan_tpu.deploy.runtime import ExportedPreEncoder

        codec = ExportedPreEncoder(args.model_dir)
        # notebook cell-2 consistency assertions
        assert codec.mel_channels == s.n_mel_channels, (
            f"model expects {codec.mel_channels} mels, spec config produces "
            f"{s.n_mel_channels}"
        )
        if codec.config and "spectrogram" in str(codec.config):
            pass  # exported config carried alongside, reference-style
    elif args.checkpoint and args.config:
        from mqgan_tpu.deploy.reencode import CheckpointReencoder

        codec = CheckpointReencoder(args.config, args.checkpoint)
        assert codec.mel_channels == s.n_mel_channels
    elif args.random and args.config:
        from mqgan_tpu.core.masking import sequence_mask
        from mqgan_tpu.models.preencoder import PreEncoder

        cfg = TrainConfig.from_yaml(args.config)
        assert cfg.model.mel_channels == s.n_mel_channels
        gen = PreEncoder.from_config(cfg.model.mel_channels, cfg.model.generator)
        t = mel.shape[0]
        params = jax.jit(gen.init)(
            jax.random.key(0), jnp.zeros((1, t, mel.shape[1])),
            jnp.full((1,), t, jnp.int32),
        )

        class _Raw:
            mel_channels = cfg.model.mel_channels

            def encode(self, spec, lengths=None):
                pad = jnp.zeros(spec.shape[:2], bool)
                return np.asarray(gen.apply(params, jnp.asarray(spec), pad,
                                            method=PreEncoder.encode))

            def decode(self, idx, lengths=None):
                pad = jnp.zeros(idx.shape[:2], bool)
                return np.asarray(gen.apply(params, jnp.asarray(idx), pad,
                                            method=PreEncoder.decode))

        codec = _Raw()
    else:
        p.error("provide --model_dir, --checkpoint+--config, or --random+--config")

    max_t = getattr(codec, "buckets", [None])[-1]
    if max_t and mel.shape[0] > max_t:
        print(f"clip is {mel.shape[0]} frames; demo truncates to the largest "
              f"exported bucket ({max_t}) — use deploy.reencode for chunked "
              f"full-length processing")
        mel = mel[:max_t]

    tokens = codec.encode(mel[None].astype(np.float32))
    print(f"tokens: {tokens.shape}, vocab range [{tokens.min()}, {tokens.max()}]")
    recon = codec.decode(tokens)[0]  # (T, n_mels)
    mse = float(np.mean((recon - mel) ** 2))
    print(f"recon mel: {recon.shape}, MSE vs original {mse:.4f}")

    # ---- 3. vocode -----------------------------------------------------
    if args.vocoder_dir:
        from mqgan_tpu.signal.vocoder import ISTFTNetFE

        fe = ISTFTNetFE.load_ts(args.vocoder_dir)
        # iSTFTNet consumes (B, n_mels, T)
        wav_out = np.asarray(fe(jnp.asarray(recon.T[None])))[0, 0]
    else:
        from mqgan_tpu.signal.griffin_lim import GriffinLimVocoder

        voc = GriffinLimVocoder(s, n_iter=args.gl_iters)
        wav_out = np.asarray(voc(jnp.asarray(recon[None])))[0, 0]

    peak = np.abs(wav_out).max()
    if peak > 0:
        wav_out = wav_out / peak * s.target_amplitude
    write_wav(args.out, wav_out, s.sampling_rate)
    print(f"wrote {args.out}: {wav_out.shape[0] / s.sampling_rate:.2f}s "
          f"@ {s.sampling_rate} Hz")


if __name__ == "__main__":
    main()
