"""Genre-conditioned music continuation: sample FSQ tokens from the trained
LM, decode them through the codec, optionally vocode to audio.

Completes the reference's implied-but-unshipped loop (it trains the token
LM, train_music_lstm_v2.py, but has no generation code): here
  tokens ~ LM(genre [, prompt])  ->  PreEncoder.decode  ->  mel  ->  wav.

Usage:
  python examples/music_continuation.py --model_dir CODEC_EXPORT \
      --lm_run LM_OUT_DIR --genre 0 --length 256 --out cont.npy \
      [--prompt_mel some_mel.npy] [--wav_out cont.wav --spec_config spec.yaml]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_dir", help="exported codec artifact")
    p.add_argument("--codec_checkpoint", default=None,
                   help="raw codec checkpoint (alternative to --model_dir; "
                        "needs --codec_config)")
    p.add_argument("--codec_config", default=None,
                   help="codec model yaml (with --codec_checkpoint)")
    p.add_argument("--seq_parallel", action="store_true",
                   help="checkpoint codec only: decode the sampled clip "
                        "with its time axis sharded over all devices "
                        "(parallel/seqpar.py) — long continuations are "
                        "neither bucket-bound nor single-device-bound")
    p.add_argument("--lm_run", required=True,
                   help="lstm_trainer out_dir (reads best.json + checkpoint)")
    p.add_argument("--genre", type=int, default=0)
    p.add_argument("--length", type=int, default=256, help="tokens to sample")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top_k", type=int, default=0)
    p.add_argument("--top_p", type=float, default=0.0,
                   help="nucleus sampling mass (0 disables)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--prompt_mel", default=None,
                   help=".npy mel to encode and continue from")
    p.add_argument("--out", required=True, help="output mel .npy")
    p.add_argument("--wav_out", default=None)
    p.add_argument("--spec_config", default=None,
                   help="needed with --wav_out (Griffin-Lim vocoding)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mqgan_tpu.models.lm_sampling import generate_tokens
    from mqgan_tpu.utils.checkpoint import load_pretrained_generator

    if args.model_dir:
        if args.seq_parallel:
            p.error("--seq_parallel needs --codec_checkpoint/--codec_config")
        from mqgan_tpu.deploy.runtime import ExportedPreEncoder

        codec = ExportedPreEncoder(args.model_dir)
    elif args.codec_checkpoint and args.codec_config:
        from mqgan_tpu.deploy.reencode import CheckpointReencoder

        codec = CheckpointReencoder(args.codec_config, args.codec_checkpoint,
                                    seq_parallel=args.seq_parallel)
    else:
        p.error("provide --model_dir, or --codec_checkpoint with "
                "--codec_config")

    with open(os.path.join(args.lm_run, "best.json")) as f:
        best = json.load(f)
    lm_args = best["args"]
    # the trainer embeds its run args in best.json, so the LM architecture
    # (lstm_trainer --arch) is auto-detected here
    arch = lm_args.get("arch", "lstm")
    if arch == "transformer":
        from mqgan_tpu.models.lm_sampling import generate_tokens_transformer
    from mqgan_tpu.models.token_lm import build_token_lm

    model = build_token_lm(lm_args, dropout=0.0, for_inference=True)
    # template for orbax restore (jitted init: unjitted tracing is
    # minutes-slow through remote backends)
    tok0 = jnp.zeros((1, 4), jnp.int32)
    template = jax.jit(model.init)(
        jax.random.key(0), tok0, jnp.zeros((1,), jnp.int32), None
    )["params"]
    params = load_pretrained_generator(best["path"], (), 0, template=template)

    prompt = None
    if args.prompt_mel:
        mel = np.load(args.prompt_mel).astype(np.float32)[None]  # (1, T, M)
        max_t = codec.buckets[-1]
        if mel.shape[1] > max_t:
            mel = mel[:, -max_t:]  # keep the most recent frames as prompt
            print(f"prompt truncated to the last {max_t} frames")
        prompt_tokens = codec.encode(mel)
        prompt = jnp.asarray(prompt_tokens, jnp.int32)
        print(f"prompt: {prompt.shape[1]} tokens from {args.prompt_mel}")

    # specials (pad/BOS and anything past the codec codebook) are masked
    # out of the sampling distribution so every token decodes meaningfully
    forbidden = tuple(
        {lm_args["pad_id"], lm_args["bos_id"]}
        | set(range(codec.codebook_size, lm_args["vocab_size"]))
    )
    sampler = (generate_tokens_transformer if arch == "transformer"
               else generate_tokens)
    tokens = sampler(
        model, params, jnp.asarray([args.genre]), jax.random.key(args.seed),
        max_len=args.length, temperature=args.temperature, top_k=args.top_k,
        top_p=args.top_p,
        bos_id=lm_args["bos_id"], prompt=prompt, forbidden_tokens=forbidden,
    )
    tokens_np = np.asarray(tokens)
    print(f"sampled tokens: {tokens_np.shape}, "
          f"range [{tokens_np.min()}, {tokens_np.max()}], "
          f"{len(np.unique(tokens_np))} unique")

    mel_out = codec.decode(tokens_np)  # (1, L, mel)
    np.save(args.out, mel_out[0])
    print(f"wrote {args.out}: {mel_out[0].shape}")

    if args.wav_out:
        assert args.spec_config, "--wav_out needs --spec_config"
        from mqgan_tpu.core.config import SpecConfig
        from mqgan_tpu.signal.griffin_lim import GriffinLimVocoder

        spec_cfg = SpecConfig.from_yaml(args.spec_config)
        voc = GriffinLimVocoder(spec_cfg.spectrogram, n_iter=32)
        wav = np.asarray(voc(jnp.asarray(mel_out)))[0, 0]
        peak = np.abs(wav).max()
        if peak > 0:
            wav = wav / peak * spec_cfg.spectrogram.target_amplitude
        import wave

        with wave.open(args.wav_out, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(spec_cfg.spectrogram.sampling_rate)
            w.writeframes((np.clip(wav, -1, 1) * 32767).astype(np.int16).tobytes())
        print(f"wrote {args.wav_out}: "
              f"{len(wav) / spec_cfg.spectrogram.sampling_rate:.2f}s")


if __name__ == "__main__":
    main()
