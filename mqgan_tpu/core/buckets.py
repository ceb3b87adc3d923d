"""Static-shape bucket policy.

XLA compiles one executable per input shape. The reference trains with a
random crop length per batch from a small list (train.py:157-162; configs use
[256, 192, 128]) and runs inference at arbitrary lengths. We map both onto a
small, fixed set of compiled shapes:

* training: each configured crop length is a bucket (3 compiled step fns);
* inference: lengths are rounded up to the nearest bucket and right-padded;
  pad masks keep the semantics identical, outputs are trimmed on the host.
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass
from typing import Sequence

import numpy as np

DEFAULT_INFERENCE_BUCKETS = (64, 128, 192, 256, 384, 512, 768, 1024, 1536, 2048)


@dataclass(frozen=True)
class BucketPolicy:
    buckets: tuple

    def __post_init__(self):
        object.__setattr__(self, "buckets", tuple(sorted(set(int(b) for b in self.buckets))))
        if not self.buckets:
            raise ValueError("need at least one bucket")

    def bucket_for(self, length: int) -> int:
        """Smallest bucket >= length; the largest bucket if length exceeds all.

        Sequences longer than the largest bucket must be chunked by the
        caller (deploy.reencode does this).
        """
        idx = bisect.bisect_left(self.buckets, int(length))
        if idx == len(self.buckets):
            return self.buckets[-1]
        return self.buckets[idx]

    def pad_batch(self, arrays: Sequence[np.ndarray]):
        """Right-pad a list of (T_i, C) arrays to the common bucket length.

        Returns (batch (B, T_b, C) float32, lengths (B,) int32, bucket).
        """
        lengths = np.array([a.shape[0] for a in arrays], dtype=np.int32)
        tb = self.bucket_for(int(lengths.max()))
        if int(lengths.max()) > tb:
            import warnings

            warnings.warn(
                f"pad_batch: sequence of {int(lengths.max())} frames exceeds "
                f"the largest bucket ({tb}) and will be TRUNCATED; chunk "
                f"long sequences instead (deploy.reencode / "
                f"Trainer._eval_clip do this)",
                stacklevel=2,
            )
        c = arrays[0].shape[1]
        out = np.zeros((len(arrays), tb, c), dtype=np.float32)
        for i, a in enumerate(arrays):
            t = min(a.shape[0], tb)
            out[i, :t] = a[:t]
        lengths = np.minimum(lengths, tb)
        return out, lengths, tb


def pad_to_multiple(length: int, multiple: int) -> int:
    return -(-length // multiple) * multiple


def repeat_pad_rows(arrays, multiple: int):
    """Repeat-pad each array's leading (batch) axis up to a multiple of
    ``multiple`` by cycling existing rows (the data-parallel batch
    convention: padded rows are real rows, so they compute normally and
    are trimmed by the caller). Returns the arrays unchanged when the
    batch already divides."""
    b = arrays[0].shape[0]
    if b == 0:
        raise ValueError("cannot repeat-pad an empty batch")
    b_pad = pad_to_multiple(b, multiple)
    if b_pad == b:
        return tuple(arrays)
    reps = [i % b for i in range(b_pad - b)]
    return tuple(np.concatenate([a, a[reps]], axis=0) for a in arrays)
