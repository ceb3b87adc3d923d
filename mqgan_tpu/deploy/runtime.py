"""Deployment runtime wrapper — the ScriptedPreEncoder equivalent.

Behavioral spec (reference scripted_preencoder.py:24-175): load a model
directory (artifact + config), pick the best available device with graceful
fallback, build masks from lengths, expose `encode(spec, lengths)` /
`decode(indices, lengths)` plus `mel_channels` / `fsq_levels` config
properties.

Here the artifact is bucketed StableHLO with baked-in params
(deploy/export.py). Arbitrary lengths are served by padding to the nearest
bucket and trimming (core.buckets); inputs longer than the largest bucket
are rejected with a clear error (deploy/reencode.py chunks instead).
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np

from mqgan_tpu.core.buckets import BucketPolicy, repeat_pad_rows
from mqgan_tpu.deploy.export import MANIFEST_NAME


class ExportedPreEncoder:
    def __init__(self, model_dir: str, compilation_cache_dir: str | None = None,
                 data_parallel: bool = False):
        """compilation_cache_dir (or env MQGAN_COMPILATION_CACHE) enables
        jax's persistent compile cache: measured 61 s -> 1.7 s cold-start
        for the flagship fused-reencode program across processes.

        data_parallel=True fans batches out over all local devices: the
        exported StableHLO programs are lowered for ONE device (GSPMD
        cannot shard across the deserialized module boundary), so each
        device gets its own compiled copy and a batch slice — dispatches
        are async, so the slices execute concurrently and throughput
        scales with the local device count. Batches are repeat-padded up
        to a multiple of the device count (CheckpointReencoder
        convention)."""
        import os as _os

        import jax
        from jax import export as jexport

        cache = compilation_cache_dir or _os.environ.get("MQGAN_COMPILATION_CACHE")
        if cache:
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

        self.model_dir = model_dir
        with open(os.path.join(model_dir, MANIFEST_NAME)) as f:
            self.manifest = json.load(f)
        self.buckets = sorted(self.manifest["buckets"])
        self._policy = BucketPolicy(tuple(self.buckets))

        self._enc = {}
        self._dec = {}
        self._ree = {}
        for t_str, files in self.manifest["files"].items():
            t = int(t_str)
            with open(os.path.join(model_dir, files["encode"]), "rb") as f:
                self._enc[t] = jexport.deserialize(f.read())
            with open(os.path.join(model_dir, files["decode"]), "rb") as f:
                self._dec[t] = jexport.deserialize(f.read())
            if "reencode" in files:  # artifacts exported before the fused
                # program existed fall back to encode->decode
                with open(os.path.join(model_dir, files["reencode"]), "rb") as f:
                    self._ree[t] = jexport.deserialize(f.read())

        cfg_path = os.path.join(model_dir, "model_config.json")
        self.config = None
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                self.config = json.load(f)
        self.device = jax.devices()[0]
        self._devices = (jax.local_devices()
                         if data_parallel and jax.local_device_count() > 1
                         else [self.device])
        self._jit_cache = {}

    @property
    def n_devices(self) -> int:
        """Local devices batches are fanned out over (1 unless
        data_parallel)."""
        return len(self._devices)

    def _call(self, exported, *args):
        """Run one exported program, fanned out over self._devices.

        Single device: plain exported.call. Multi-device: slice the
        (repeat-padded) batch per device, commit each slice to its device
        (jit then compiles/executes per placement), and reassemble on the
        host. Returns numpy array(s) trimmed back to the caller's batch."""
        import jax

        if len(self._devices) == 1:
            out = exported.call(*args)
            return (tuple(np.asarray(o) for o in out)
                    if isinstance(out, (tuple, list)) else np.asarray(out))
        # setdefault: one server process may share this runtime across
        # worker threads; check-then-set would let two threads pay the
        # (multi-minute through the tunnel) compile twice
        fn = self._jit_cache.setdefault(id(exported), jax.jit(exported.call))
        n = len(self._devices)
        b = args[0].shape[0]
        args = repeat_pad_rows(args, n)
        per = args[0].shape[0] // n
        # submit every slice before fetching any result: the dispatches
        # are async, so the devices compute concurrently
        pend = [
            fn(*(jax.device_put(a[i * per:(i + 1) * per], dev) for a in args))
            for i, dev in enumerate(self._devices)
        ]
        if isinstance(pend[0], (tuple, list)):
            return tuple(
                np.concatenate([np.asarray(p[j]) for p in pend], axis=0)[:b]
                for j in range(len(pend[0])))
        return np.concatenate([np.asarray(p) for p in pend], axis=0)[:b]

    # ---- config properties (reference scripted_preencoder.py:96-104) ----
    @property
    def mel_channels(self) -> int:
        return int(self.manifest["mel_channels"])

    @property
    def fsq_levels(self) -> list:
        return list(self.manifest["fsq_levels"])

    @property
    def codebook_size(self) -> int:
        return int(self.manifest["codebook_size"])

    @property
    def bos_token_id(self) -> int:
        return int(self.manifest["bos_token_id"])

    @property
    def eos_token_id(self) -> int:
        return int(self.manifest["eos_token_id"])

    def bucket_for(self, t: int) -> int:
        """Smallest exported bucket covering a clip of length t."""
        return self._policy.bucket_for(t)

    @property
    def halos(self) -> tuple:
        """(left, right) overlap-chunking halo for the full encode+decode
        pipeline (core/chunking.py); falls back to the flagship config for
        manifests exported before the field existed."""
        if "halos" in self.manifest:
            return tuple(self.manifest["halos"])
        from mqgan_tpu.core.chunking import (
            FLAGSHIP_KERNEL_SIZES, FLAGSHIP_REFINER_DEPTH, generator_halos)

        return generator_halos(FLAGSHIP_KERNEL_SIZES, FLAGSHIP_REFINER_DEPTH)

    @property
    def decoder_halos(self) -> tuple:
        """(left, right) halo of the token->mel decode side alone
        (StreamingDecoder); flagship fallback for old manifests."""
        if "decoder_halos" in self.manifest:
            return tuple(self.manifest["decoder_halos"])
        from mqgan_tpu.core.chunking import (
            FLAGSHIP_KERNEL_SIZES, FLAGSHIP_REFINER_DEPTH, decoder_halos)

        return decoder_halos(FLAGSHIP_KERNEL_SIZES, FLAGSHIP_REFINER_DEPTH)

    @property
    def encoder_halo(self) -> int:
        """Symmetric per-side halo of the mel->token encode side alone
        (StreamingEncoder); flagship fallback for old manifests."""
        if "encoder_halo" in self.manifest:
            return int(self.manifest["encoder_halo"])
        from mqgan_tpu.core.chunking import (
            FLAGSHIP_KERNEL_SIZES, encoder_halo)

        return encoder_halo(FLAGSHIP_KERNEL_SIZES)

    @property
    def halo_align(self) -> int:
        """Chunk windows must start on multiples of this (refiner pooling
        grid, 2**refiner_depth); flagship fallback for old manifests."""
        if "halo_align" in self.manifest:
            return int(self.manifest["halo_align"])
        from mqgan_tpu.core.chunking import (
            FLAGSHIP_REFINER_DEPTH, halo_align)

        return halo_align(FLAGSHIP_REFINER_DEPTH)

    # ------------------------------------------------------------------
    def _prepare(self, arr: np.ndarray, lengths, pad_value=0.0):
        arr = np.asarray(arr)
        b, t = arr.shape[0], arr.shape[1]
        if lengths is None:
            lengths = np.full((b,), t, np.int32)
        lengths = np.asarray(lengths, np.int32)
        if t > self.buckets[-1]:
            raise ValueError(
                f"sequence length {t} exceeds the largest exported bucket "
                f"{self.buckets[-1]}; chunk the input (see deploy.reencode)"
            )
        tb = self._policy.bucket_for(t)
        if tb != t:
            pad_shape = (b, tb - t) + arr.shape[2:]
            arr = np.concatenate(
                [arr, np.full(pad_shape, pad_value, arr.dtype)], axis=1
            )
        pad_mask = np.arange(tb)[None, :] >= lengths[:, None]
        return arr, pad_mask, t, tb

    def encode(self, spec: np.ndarray, lengths=None) -> np.ndarray:
        """(B, T, mel) float32 -> (B, T) int32 FSQ indices."""
        spec, pad_mask, t, tb = self._prepare(
            np.asarray(spec, np.float32), lengths
        )
        out = self._call(self._enc[tb], spec, pad_mask)
        return out[:, :t]

    def decode(self, indices: np.ndarray, lengths=None) -> np.ndarray:
        """(B, T) int -> (B, T, mel) refined mel."""
        indices, pad_mask, t, tb = self._prepare(
            np.asarray(indices, np.int32), lengths, pad_value=0
        )
        out = self._call(self._dec[tb], indices, pad_mask)
        return out[:, :t]

    def reencode(self, spec: np.ndarray, lengths=None):
        """(B, T, mel) -> (tokens (B, T), refined mel (B, T, mel)). Uses the
        fused single-program artifact when present (~2x fewer dispatches)."""
        spec, pad_mask, t, tb = self._prepare(np.asarray(spec, np.float32), lengths)
        if tb in self._ree:
            idx, out = self._call(self._ree[tb], spec, pad_mask)
            return idx[:, :t], out[:, :t]
        if len(self._devices) == 1:
            # chain the two programs with the tokens DEVICE-RESIDENT:
            # np.asarray between them would force a host round-trip
            # (a full tunnel sync on remote backends) per batch. This is
            # the poly-export serving path (no fused program; measured
            # timing-neutral vs fused on the exact path, round 5).
            idx = self._enc[tb].call(spec, pad_mask)
            out = self._dec[tb].call(idx, pad_mask)
            return np.asarray(idx)[:, :t], np.asarray(out)[:, :t]
        idx = self._call(self._enc[tb], spec, pad_mask)
        out = self._call(self._dec[tb], idx, pad_mask)
        return idx[:, :t], out[:, :t]
