"""Measure the PyTorch reference on CPU — the comparison baseline.

Runs the actual reference implementation (imported from /root/reference with
an einx stub; nothing is copied) on this host's CPU for the BASELINE.json
headline config: encode + quantize + decode of mel batches through the
flagship hifispeech PreEncoder. Writes benchmarks/baseline_cpu.json, which
bench.py reads to compute vs_baseline.

Usage: python benchmarks/measure_baseline.py [--iters 5] [--batch 8] [--t 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--t", type=int, default=256)
    p.add_argument("--threads", type=int, default=0, help="0 = torch default")
    args = p.parse_args()

    import torch

    if args.threads:
        torch.set_num_threads(args.threads)

    from tests.reference_loader import load_reference_modules

    ref_pre, *_ = load_reference_modules()

    torch.manual_seed(0)
    model = ref_pre.PreEncoder(
        mel_channels=128,
        channels=[512, 512, 512, 768],
        kernel_sizes=[3, 3, 5, 7],
        fsq_levels=[8, 5, 5, 5],
        dropout=0.0,
        refiner_base_channels=64,
        refiner_depth=3,
        refiner_hidden_proj_divisor=8,
    )
    model.eval()
    n_params = sum(p_.numel() for p_ in model.parameters())

    b, t = args.batch, args.t
    x = torch.randn(b, t, 128)
    mask = torch.zeros(b, 1, t, dtype=torch.bool)

    def run_once():
        with torch.no_grad():
            idx = model.encode(x, mask)
            out = model.decode(idx, mask)
        return out

    # warmup
    run_once()
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)

    best = min(times)
    frames_per_sec = b * t / best
    result = {
        "metric": "mel_frames_per_sec",
        "what": "reference PyTorch encode+quantize+decode, eval mode, fp32",
        "hardware": "host CPU",
        "torch_threads": torch.get_num_threads(),
        "batch": b,
        "frames": t,
        "generator_params": n_params,
        "seconds_per_iter_best": best,
        "seconds_per_iter_all": times,
        "frames_per_sec": frames_per_sec,
    }
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "baseline_cpu.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
