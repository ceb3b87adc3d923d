"""Host-side input pipeline for .npy mel datasets.

Behavioral spec (reference train.py:87-197): recursive .npy discovery,
seeded train/eval split, per-batch random crop length chosen from the
configured list, random crop / right-zero-pad to that length, failed loads
dropped.

TPU-first changes:
* every crop length is a static XLA bucket (core.buckets);
* loading is threaded (np.load releases the GIL for IO) with an optional
  native C++ reader (utils.npy / native/io_loader.cpp) for the mmap parse;
* batches are staged to device asynchronously with double buffering so the
  accelerator never waits on the host (replaces torch DataLoader workers +
  pin_memory).
"""

from __future__ import annotations

import os
import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Iterator, List, Sequence

import numpy as np

from mqgan_tpu.utils.npy import load_npy


def find_npy_files(data_dir: str) -> List[str]:
    """Recursive walk (reference train.py:94-98)."""
    if not os.path.isdir(data_dir):
        raise FileNotFoundError(f"Directory not found: {data_dir}")
    out = []
    for root, _, files in os.walk(data_dir):
        for fn in files:
            if fn.endswith(".npy"):
                out.append(os.path.join(root, fn))
    return sorted(out)


def split_train_eval(files: Sequence[str], validation_split: float, seed: int):
    """Seeded random split (reference train.py:250-257)."""
    files = list(files)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(files))
    eval_size = int(validation_split * len(files))
    eval_idx = set(perm[:eval_size].tolist())
    train = [f for i, f in enumerate(files) if i not in eval_idx]
    evals = [files[i] for i in perm[:eval_size]]
    return train, evals


@dataclass
class Batch:
    mel: np.ndarray  # (B, T_bucket, C) float32
    lengths: np.ndarray  # (B,) int32
    filenames: List[str]


class MelDataset:
    """Loads (T, C) float32 mels; returns None on broken files
    (reference train.py:108-136)."""

    def __init__(self, files: Sequence[str], use_native: bool = True):
        self.files = list(files)
        self.use_native = use_native

    def __len__(self):
        return len(self.files)

    def load(self, idx: int):
        path = self.files[idx]
        try:
            mel = load_npy(path, use_native=self.use_native)
        except Exception as e:  # noqa: BLE001
            print(f"[Load error] {path}: {e}")
            return None
        if mel.ndim != 2:
            print(f"[Shape error] {path}: shape={mel.shape}")
            return None
        return np.asarray(mel, np.float32)


def collate(
    items: List[tuple],  # [(mel (T,C), name)]
    crop_lens: Sequence[int],
    rng: random.Random,
) -> Batch | None:
    """Pick ONE crop length per batch at random, random-crop / right-zero-pad
    every item to it (reference pad_collate_fn, train.py:140-197)."""
    items = [it for it in items if it is not None]
    if not items:
        return None
    tgt = int(rng.choice(list(crop_lens)))
    c = items[0][0].shape[1]
    mel = np.zeros((len(items), tgt, c), np.float32)
    lengths = np.zeros((len(items),), np.int32)
    names = []
    for i, (m, name) in enumerate(items):
        full = m.shape[0]
        if full > tgt:
            start = rng.randint(0, full - tgt)
            mel[i] = m[start : start + tgt]
            lengths[i] = tgt
        else:
            mel[i, :full] = m
            lengths[i] = full
        names.append(name)
    return Batch(mel=mel, lengths=lengths, filenames=names)


class MelLoader:
    """Shuffling, threaded, bucketed batch iterator.

    Process-count-invariant sampling plan: the shuffle order, per-batch crop
    length, and per-row crop start are all pure functions of
    ``(seed, epoch, batch_index, global_row)`` over the FULL (union) file
    list — never of a random stream perturbed by per-host shard content.
    In a multi-host run every process constructs the SAME global plan and
    materializes only its own row range ``[process_index*local_bs,
    (process_index+1)*local_bs)`` of each global batch, so

    * the concatenation over processes (parallel/multihost.make_global_batch)
      is bit-identical to what a single process would load, and
    * every process yields exactly the same number of batches per epoch
      (no collective deadlock on uneven shards).

    ``batch_size`` is the GLOBAL batch size; each process yields
    ``batch_size // process_count`` rows. Short final batches (and rows whose
    file fails to load) become zero-length all-zero rows — every loss is
    masked by ``lengths``, so they carry zero weight and zero gradient,
    matching the reference's smaller-final-batch semantics
    (train.py:140-197) without a second compiled batch shape.
    """

    def __init__(
        self,
        dataset: MelDataset,
        batch_size: int,
        crop_lens: Sequence[int],
        seed: int = 42,
        num_threads: int = 8,
        drop_last: bool = False,
        process_index: int = 0,
        process_count: int = 1,
        mel_channels: int | None = None,
    ):
        assert batch_size % process_count == 0, (
            f"global batch {batch_size} not divisible by {process_count} "
            f"processes")
        if process_count > 1 and mel_channels is None:
            raise ValueError(
                "multi-process MelLoader needs mel_channels: a process whose "
                "slice of the final batch is all padding must still build a "
                "correctly-shaped zero batch")
        self.dataset = dataset
        self.batch_size = batch_size
        self.crop_lens = tuple(crop_lens)
        self.seed = seed
        self.num_threads = num_threads
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count
        self.mel_channels = mel_channels

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batch_rng(self, epoch: int, b: int, row: int | None = None):
        key = [self.seed & 0xFFFFFFFF, epoch, b]
        if row is not None:
            key.append(row)
        return np.random.default_rng(key)

    def crop_for_batch(self, epoch: int, b: int) -> int:
        """Global-batch crop length: pure function of (seed, epoch, b)."""
        r = self._batch_rng(epoch, b)
        return int(self.crop_lens[int(r.integers(len(self.crop_lens)))])

    def epoch(self, epoch: int) -> Iterator[Batch]:
        order = list(range(len(self.dataset)))
        random.Random(self.seed + epoch).shuffle(order)
        n = len(order)
        gb = self.batch_size
        lb = gb // self.process_count
        base = self.process_index * lb
        num_batches = n // gb if self.drop_last else -(-n // gb)
        pool = ThreadPoolExecutor(max_workers=self.num_threads)

        def load(g: int):
            return self.dataset.load(order[g]) if g < n else None

        try:
            for b in range(num_batches):
                tgt = self.crop_for_batch(epoch, b)
                gidxs = [b * gb + base + i for i in range(lb)]
                mels = list(pool.map(load, gidxs))
                c = self.mel_channels
                if c is None:
                    c = next((m.shape[1] for m in mels if m is not None), None)
                    if c is None:
                        continue  # whole batch failed, channels unknown
                mel = np.zeros((lb, tgt, c), np.float32)
                lengths = np.zeros((lb,), np.int32)
                names = []
                for i, (g, m) in enumerate(zip(gidxs, mels)):
                    if m is None:
                        names.append("<pad>")
                        continue
                    full = m.shape[0]
                    if full > tgt:
                        start = int(self._batch_rng(epoch, b, g).integers(
                            0, full - tgt + 1))
                        mel[i] = m[start : start + tgt]
                        lengths[i] = tgt
                    else:
                        mel[i, :full] = m
                        lengths[i] = full
                    names.append(os.path.basename(self.dataset.files[order[g]]))
                yield Batch(mel=mel, lengths=lengths, filenames=names)
        finally:
            pool.shutdown(wait=False)


class DevicePrefetcher:
    """Stage host batches onto devices one step ahead (double buffering)."""

    def __init__(self, it: Iterator[Batch], put_fn, depth: int = 2):
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._put = put_fn
        self._it = it
        self._done = object()
        self._error: BaseException | None = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for batch in self._it:
                # device arrays for the step + the host Batch (plotting /
                # eval must not touch global arrays in multi-process runs)
                self._q.put((self._put(batch.mel), self._put(batch.lengths), batch))
        except BaseException as e:  # re-raised on the consumer side
            self._error = e
        finally:
            self._q.put(self._done)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._done:
                if self._error is not None:
                    raise self._error
                return
            yield item
