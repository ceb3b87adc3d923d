"""Flash-attention block-size sweep at long context (VERDICT r4 #5).

results_r4_longlm.json showed --flash_lm with jax's default BlockSizes
LOSING to naive XLA attention at L=2048 (112.7K vs 187.9K tok/s) and
winning only at L=4096 small-B. This sweep measures the full training
step (fwd+bwd+AdamW, bf16, flagship dims, remat like the r4 rows) over a
(block_q, block_k) grid at L=2048 and L=4096 to find whether any VMEM
tiling recovers L=2048 — or to pin the measured crossover that
TRAINING.md and the trainer warning should state.

Same methodology as bench_long_lm.py: token budget 16K/step (B=8 at
L=2048, B=4 at L=4096), donated compiled step, distinct per-iter token
batches, one host fetch per iter.

Usage: python benchmarks/bench_flash_sweep.py [--iters 6]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = 1003
GRID = [None, (128, 128), (256, 256), (256, 512), (512, 512),
        (512, 1024), (1024, 1024)]


def run_leg(l, b, blocks, iters, flash=True):
    import jax.numpy as jnp

    from benchmarks.bench_long_lm import _train_loop
    from mqgan_tpu.models.token_transformer import MusicTransformer

    model = MusicTransformer(vocab_size=VOCAB, num_genres=10, remat=True,
                             flash=flash, flash_blocks=blocks,
                             dtype=jnp.bfloat16)
    per, n_params = _train_loop(model, b, l, iters)
    tag = "naive" if not flash else (
        "flash_default" if blocks is None else f"flash_q{blocks[0]}_k{blocks[1]}")
    row = {
        "config": f"r5_flash_sweep_L{l}_b{b}_{tag}",
        "seq_len": l, "batch": b, "blocks": list(blocks) if blocks else None,
        "flash": flash, "params_m": round(n_params / 1e6, 1),
        "ms_per_step": round(per * 1e3, 1),
        "tokens_per_sec": round(b * (l - 1) / per, 1),
    }
    print(json.dumps(row), flush=True)
    return row


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "results_r5_flash_sweep.json"))
    args = p.parse_args(argv)

    rows = []
    for l, b in ((2048, 8), (4096, 4)):
        rows.append(run_leg(l, b, None, args.iters, flash=False))  # naive
        for blocks in GRID:
            try:
                rows.append(run_leg(l, b, blocks, args.iters))
            except Exception as e:  # noqa: BLE001 — a tiling can be invalid
                rows.append({"config": f"r5_flash_sweep_L{l}_b{b}_"
                                       f"q{blocks[0]}_k{blocks[1]}"
                             if blocks else f"r5_flash_sweep_L{l}_default",
                             "error": str(e)[:200]})
                print(rows[-1], flush=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
        f.write("\n")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
