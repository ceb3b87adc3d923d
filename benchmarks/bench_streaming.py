"""Streaming-decode latency at B=1 on the real chip (round 3).

The reference has no streaming path (whole-clip TorchScript decode,
preencoder.py:453-504); deploy/streaming.py is net-new serving surface.
This measures what a caller actually waits per feed() at B=1, flagship
config, window=512: wall time of feed(chunk) including the decode
dispatch + host fetch (streaming inherently round-trips every emit, so
the ~30 ms tunnel dispatch of this environment is honestly part of the
number here; on real local TPU attach it would be the on-device decode
cost, also reported via the slope method).

Prints one JSON line; optionally appends to benchmarks/results.json via
--save.
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


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--window", type=int, default=WINDOW)
    p.add_argument("--chunk", type=int, default=CHUNK)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mqgan_tpu.core.chunking import decoder_halos
    from mqgan_tpu.core.config import TrainConfig
    from mqgan_tpu.deploy.streaming import StreamingDecoder
    from mqgan_tpu.models.preencoder import PreEncoder

    cfg = TrainConfig.from_dict({})
    gcfg = cfg.model.generator
    gen = PreEncoder.from_config(cfg.model.mel_channels, gcfg, jnp.bfloat16)
    mel0 = jnp.zeros((1, args.window, cfg.model.mel_channels), jnp.float32)
    lens0 = jnp.full((1,), args.window, jnp.int32)
    params = jax.jit(gen.init)(jax.random.key(0), mel0, lens0)

    @jax.jit
    def decode(idx, mask):
        return gen.apply(params, idx, mask, method=PreEncoder.decode)

    def decode_fn(idx, mask):
        return np.asarray(decode(jnp.asarray(idx), jnp.asarray(mask)))

    halo_l, halo_r = decoder_halos(
        tuple(gcfg.kernel_sizes), gcfg.refiner_depth)
    dec = StreamingDecoder(decode_fn, halo_l, halo_r, window=args.window,
                           align=2 ** gcfg.refiner_depth)

    rng = np.random.default_rng(0)
    n_codes = 1
    for l in gcfg.fsq_levels:
        n_codes *= l
    tokens = rng.integers(0, n_codes, (args.chunk * (N_FEED + 8),)).astype(
        np.int32)

    # warm up: compile the decode + fill the left context
    for i in range(8):
        dec.feed(tokens[i * args.chunk:(i + 1) * args.chunk])

    lats, emitted = [], 0
    for i in range(8, 8 + N_FEED):
        t0 = time.perf_counter()
        out = dec.feed(tokens[i * args.chunk:(i + 1) * args.chunk])
        lats.append(time.perf_counter() - t0)
        emitted += out.shape[0]
    lats_ms = sorted(l * 1e3 for l in lats)
    r = {
        "config": "streaming_decode_b1_flagship",
        "window": args.window, "chunk_tokens": args.chunk,
        "algorithmic_latency_frames": dec.latency_frames,
        "halo_l": halo_l, "halo_r": halo_r,
        "p50_feed_ms": round(lats_ms[len(lats_ms) // 2], 1),
        "p95_feed_ms": round(lats_ms[int(len(lats_ms) * 0.95)], 1),
        "frames_emitted_per_feed": round(emitted / N_FEED, 1),
        "throughput_frames_per_sec": round(emitted / sum(lats), 1),
    }
    print(json.dumps(r), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(r, f, indent=1)


if __name__ == "__main__":
    main()
