"""Online-serving demo: concurrent clients against a micro-batched codec.

Usage:
  python examples/serving_demo.py --model_dir EXPORT_DIR [--clips 32]
      [--max_batch 64] [--max_delay_ms 5]

Spawns N client threads that each submit one random-length mel clip to a
shared CodecServer (deploy/server.py) and prints the batching stats —
mean batch occupancy and p50/p95 client latency. See docs/SERVING.md.
"""

from __future__ import annotations

import argparse
import threading

import numpy as np


def main(argv=None):
    from mqgan_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", required=True)
    p.add_argument("--clips", type=int, default=32)
    p.add_argument("--max_batch", type=int, default=64)
    p.add_argument("--max_delay_ms", type=float, default=5.0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from mqgan_tpu.deploy.runtime import ExportedPreEncoder
    from mqgan_tpu.deploy.server import CodecServer

    rt = ExportedPreEncoder(args.model_dir)
    rng = np.random.default_rng(args.seed)
    max_t = rt.buckets[-1]
    clips = [
        rng.standard_normal((int(rng.integers(max_t // 4, max_t + 1)),
                             rt.mel_channels)).astype(np.float32)
        for _ in range(args.clips)
    ]

    results = [None] * len(clips)
    with CodecServer(runtime=rt, op="reencode", max_batch=args.max_batch,
                     max_delay_ms=args.max_delay_ms) as srv:
        def client(i):
            results[i] = srv(clips[i])

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(len(clips))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        stats = srv.stats.summary()

    for i, (clip, (idx, mel)) in enumerate(zip(clips, results)):
        assert idx.shape[0] == clip.shape[0] and mel.shape == clip.shape
    print(f"{len(clips)} clips served; stats: {stats}")


if __name__ == "__main__":
    main()
