"""Metrics logging: JSONL on disk as system-of-record, optional wandb.

The reference logs per-step scalars and per-epoch spectrogram images to
Weights & Biases (train.py:331-337, 533-537). This environment has no wandb
installed and no egress, so the primary sink is a JSONL stream any dashboard
can tail; wandb is used transparently when importable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Mapping


def _to_py(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return str(v)


def tree_stats(tree, prefix: str = "param", bins: int = 16) -> dict:
    """Per-top-level-component distribution summaries of a param pytree —
    the wandb.watch equivalent (reference train.py:333) rendered as flat
    scalars + a fixed-bin histogram, so the JSONL stream carries the same
    observability (norms, spread, saturation) without a wandb dependency.

    Returns {"{prefix}/{component}/{stat}": float} plus
    "{prefix}/{component}/hist" as a list of bin counts over
    [mean-4std, mean+4std].
    """
    import numpy as np

    out: dict = {}
    items = tree.items() if hasattr(tree, "items") else [("all", tree)]
    for name, sub in items:
        leaves = [np.asarray(x).ravel() for x in _tree_leaves(sub)]
        if not leaves:
            continue
        v = np.concatenate(leaves).astype(np.float64)
        mean, std = float(v.mean()), float(v.std())
        out[f"{prefix}/{name}/l2"] = float(np.sqrt(np.sum(v * v)))
        out[f"{prefix}/{name}/mean"] = mean
        out[f"{prefix}/{name}/std"] = std
        out[f"{prefix}/{name}/absmax"] = float(np.abs(v).max())
        lo, hi = mean - 4 * std, mean + 4 * std
        if hi <= lo:
            hi = lo + 1e-12
        counts, _ = np.histogram(v, bins=bins, range=(lo, hi))
        out[f"{prefix}/{name}/hist"] = counts.tolist()
    return out


def _tree_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


class MetricsLogger:
    def __init__(self, output_dir: str, run_name: str = "train",
                 wandb_project: str | None = None, wandb_entity: str | None = None,
                 config: Mapping[str, Any] | None = None):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, f"{run_name}_metrics.jsonl")
        self._f = open(self.path, "a", buffering=1)
        self._t0 = time.time()
        self._wandb = None
        if wandb_project:
            try:
                import wandb  # noqa: F811

                wandb.init(project=wandb_project, entity=wandb_entity,
                           config=dict(config or {}))
                self._wandb = wandb
            except Exception:  # wandb absent or offline: JSONL only
                self._wandb = None

    def log(self, metrics: Mapping[str, Any], step: int | None = None) -> None:
        rec = {k: (list(v) if isinstance(v, (list, tuple)) else _to_py(v))
               for k, v in metrics.items()}
        rec["_time"] = round(time.time() - self._t0, 3)
        if step is not None:
            rec["_step"] = int(step)
        self._f.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            self._wandb.log(dict(metrics), step=step)

    def log_image(self, tag: str, path: str, step: int | None = None) -> None:
        """Mirror an on-disk PNG to wandb as a ``wandb.Image`` (the
        reference logs spectrogram triptychs this way, train.py:568-573,
        615-620). The PNG on disk stays the system of record; without an
        active wandb run this is a no-op."""
        if self._wandb is not None and path:
            try:
                self._wandb.log({tag: self._wandb.Image(path)}, step=step)
            except Exception:  # never let image mirroring kill training
                pass

    def close(self):
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
