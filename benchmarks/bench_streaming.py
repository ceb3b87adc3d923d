"""Streaming codec latency at B=1 on the real chip (round 3).

The reference has no streaming path (whole-clip TorchScript decode,
preencoder.py:453-504); deploy/streaming.py is net-new serving surface.
Three modes, all flagship config at B=1:

  decode — tokens -> refined mel (StreamingDecoder): wall time of
    feed(chunk) including the decode dispatch + host fetch (streaming
    inherently round-trips every emit, so the ~30 ms tunnel dispatch of
    this environment is honestly part of the number; on a local TPU
    attach it would be the on-device decode cost).
  encode — mel -> FSQ tokens (StreamingEncoder): same measurement for
    the live-tokenization front half. full_windows gating means most
    feeds buffer (near-0 ms) and every stride-th feed runs the window.
  duplex — mel -> tokens -> mel: encoder output piped straight into the
    decoder, the full live codec loop (microphone -> tokens -> speaker).

Prints one JSON line per mode; optionally writes to --out.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 512
CHUNK = 16
N_FEED = 60


def _percentiles(lats):
    ms = sorted(l * 1e3 for l in lats)
    return (round(ms[len(ms) // 2], 1),
            round(ms[int(len(ms) * 0.95)], 1),
            round(max(ms), 1))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="decode",
                   choices=["decode", "encode", "duplex"])
    p.add_argument("--window", type=int, default=WINDOW)
    p.add_argument("--chunk", type=int, default=CHUNK)
    p.add_argument("--n_feed", type=int, default=N_FEED)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mqgan_tpu.core.chunking import decoder_halos, encoder_halo
    from mqgan_tpu.core.config import TrainConfig
    from mqgan_tpu.deploy.streaming import StreamingDecoder, StreamingEncoder
    from mqgan_tpu.models.preencoder import PreEncoder

    cfg = TrainConfig.from_dict({})
    gcfg = cfg.model.generator
    mel_c = cfg.model.mel_channels
    gen = PreEncoder.from_config(mel_c, gcfg, jnp.bfloat16)
    mel0 = jnp.zeros((1, args.window, mel_c), jnp.float32)
    lens0 = jnp.full((1,), args.window, jnp.int32)
    params = jax.jit(gen.init)(jax.random.key(0), mel0, lens0)

    @jax.jit
    def decode(idx, mask):
        return gen.apply(params, idx, mask, method=PreEncoder.decode)

    @jax.jit
    def encode(mel, mask):
        return gen.apply(params, mel, mask, method=PreEncoder.encode)

    def decode_fn(idx, mask):
        return np.asarray(decode(jnp.asarray(idx), jnp.asarray(mask)))

    def encode_fn(mel, mask):
        return np.asarray(encode(jnp.asarray(mel), jnp.asarray(mask)))

    d_halo_l, d_halo_r = decoder_halos(
        tuple(gcfg.kernel_sizes), gcfg.refiner_depth)
    e_halo = encoder_halo(tuple(gcfg.kernel_sizes))

    def make_dec():
        return StreamingDecoder(decode_fn, d_halo_l, d_halo_r,
                                window=args.window,
                                align=2 ** gcfg.refiner_depth,
                                mel_channels=mel_c)

    def make_enc():
        return StreamingEncoder(encode_fn, e_halo, window=args.window,
                                mel_channels=mel_c)

    rng = np.random.default_rng(0)
    n_codes = 1
    for l in gcfg.fsq_levels:
        n_codes *= l
    n_total = args.chunk * (args.n_feed + 40)
    tokens = rng.integers(0, n_codes, (n_total,)).astype(np.int32)
    mels = rng.standard_normal((n_total, mel_c)).astype(np.float32)

    warm = 8 if args.mode == "decode" else max(
        8, -(-args.window // args.chunk) + 4)  # encoder emits after 1 window

    if args.mode == "decode":
        stream, feeds = make_dec(), tokens
        step = lambda chunk: stream.feed(chunk).shape[0]
        latency = make_dec().latency_frames
    elif args.mode == "encode":
        stream, feeds = make_enc(), mels
        step = lambda chunk: stream.feed(chunk).shape[0]
        latency = make_enc().latency_frames
    else:  # duplex: mel chunk -> (tokens emitted) -> mel frames out
        enc, dec = make_enc(), make_dec()

        def step(chunk):
            return dec.feed(enc.feed(chunk)).shape[0]

        feeds = mels
        latency = make_enc().latency_frames + make_dec().latency_frames

    # warm up: compile + fill enough context that emissions are steady
    for i in range(warm):
        step(feeds[i * args.chunk:(i + 1) * args.chunk])

    lats, emitted = [], 0
    for i in range(warm, warm + args.n_feed):
        t0 = time.perf_counter()
        emitted += step(feeds[i * args.chunk:(i + 1) * args.chunk])
        lats.append(time.perf_counter() - t0)
    p50, p95, pmax = _percentiles(lats)
    r = {
        "config": f"streaming_{args.mode}_b1_flagship",
        "window": args.window, "chunk": args.chunk,
        "algorithmic_latency_frames": latency,
        "p50_feed_ms": p50, "p95_feed_ms": p95, "max_feed_ms": pmax,
        "frames_emitted_per_feed": round(emitted / args.n_feed, 1),
        "throughput_frames_per_sec": round(emitted / sum(lats), 1),
    }
    if args.mode == "decode":
        r["halo_l"], r["halo_r"] = d_halo_l, d_halo_r
    else:
        r["encoder_halo"] = e_halo
    print(json.dumps(r), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(r, f, indent=1)


if __name__ == "__main__":
    main()
