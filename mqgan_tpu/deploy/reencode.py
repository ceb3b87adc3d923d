"""Batch dataset re-encoding through the codec.

Behavioral spec (reference reencode_spectrograms.py:8-88 and
reencode_spectrograms_from_checkpoint.py:9-108): recursive .npy discovery,
batching, pad-to-batch-max, encode->decode with lengths, trim to original
length, save into a mirrored output tree; per-batch error tolerance
(log + continue); optional token dump for LM training.

Two sources, like the reference pair of scripts:
  --model-dir  exported StableHLO artifact (deploy/export.py)
  --checkpoint raw checkpoint (orbax dir or torch .pth) + --config
Long files are chunked to the largest bucket instead of failing.
"""

from __future__ import annotations

import argparse
import os
import queue
import threading
from typing import List

import numpy as np

from mqgan_tpu.train.data import find_npy_files
from mqgan_tpu.utils.npy import load_npy


class CheckpointReencoder:
    """In-process encode/decode from a raw checkpoint (no export), the
    reencode_spectrograms_from_checkpoint.py equivalent.

    data_parallel=True shards batches over all local devices (params
    replicated); XLA GSPMD handles the rest — directory-scale re-encode
    scales linearly over a chip mesh. Batches are repeat-padded up to a
    multiple of the mesh size.

    seq_parallel=True shards the TIME axis over all local devices instead
    (parallel/seqpar.py): decode() runs one long token sequence as halo'd
    per-device windows inside a single shard_map, exact vs a full-length
    pass; encode()/reencode() run the WHOLE encode->FSQ->decode pipeline
    per window (conv-exact, CBAM window approximation as in chunked
    eval). Per-device memory/latency ~T/N and calls are freed from the
    bucket grid (any T in one sharded dispatch). The two modes are
    mutually exclusive: data_parallel scales MANY clips, seq_parallel
    scales ONE long clip."""

    def __init__(self, config_path: str, checkpoint_path: str,
                 buckets=(128, 256, 512, 1024), dtype=None,
                 data_parallel: bool = False, seq_parallel: bool = False,
                 poly_mixers: bool | str = "decode"):
        import jax
        import jax.numpy as jnp

        from mqgan_tpu.core.buckets import BucketPolicy
        from mqgan_tpu.core.config import TrainConfig
        from mqgan_tpu.core.masking import sequence_mask
        from mqgan_tpu.models.preencoder import PreEncoder
        from mqgan_tpu.utils.checkpoint import load_pretrained_generator

        cfg = TrainConfig.from_yaml(config_path)
        gen = PreEncoder.from_config(cfg.model.mel_channels, cfg.model.generator,
                                     dtype)
        # remat is a training-memory trade; never serve its chunked path.
        # poly_mixers="decode" is the serving DEFAULT (round 5): tokens
        # stay bit-identical (tests/test_mixer_poly.py parity gate) and
        # decode gains a measured 1.07x; pass False for the exact
        # transcendental mixers (--exact_mixers). seq_parallel keeps the
        # exact mixers: the poly fit range is the per-dispatch min/max
        # (ops/mixer_poly.py:94), so per-window shard_map fits would
        # diverge from the full-pass polynomial and break the mode's
        # exact-vs-full contract (tests/test_seqpar.py).
        if seq_parallel:
            poly_mixers = False
        gen = gen.clone(remat=False, remat_refiner=False,
                        poly_mixers=poly_mixers)
        self._gen = gen
        t0 = max(cfg.crop_lens)
        mel = jnp.zeros((1, t0, cfg.model.mel_channels), jnp.float32)
        lengths = jnp.full((1,), t0, jnp.int32)
        template = jax.eval_shape(gen.init, jax.random.key(0), mel, lengths)["params"]
        gen_params = load_pretrained_generator(
            checkpoint_path, cfg.model.generator.channels,
            cfg.model.generator.refiner_depth, template=template,
        )
        params = {"params": gen_params}
        self.mel_channels = cfg.model.mel_channels
        self.codebook_size = cfg.model.generator.codebook_size
        self.buckets = sorted(buckets)
        self._policy = BucketPolicy(tuple(self.buckets))
        from mqgan_tpu.core.chunking import generator_halos, halo_align

        self.halos = generator_halos(
            tuple(cfg.model.generator.kernel_sizes),
            cfg.model.generator.refiner_depth)
        # chunk windows must start on the model's own pooling grid, not
        # the flagship fallback (depth>3 configs need a coarser alignment)
        self.halo_align = halo_align(cfg.model.generator.refiner_depth)

        import functools

        @functools.partial(jax.jit, static_argnums=())
        def _encode(mel, pad_mask):
            return gen.apply(params, mel, pad_mask, method=PreEncoder.encode)

        @functools.partial(jax.jit, static_argnums=())
        def _decode(idx, pad_mask):
            return gen.apply(params, idx, pad_mask, method=PreEncoder.decode)

        self._encode_fn = _encode
        self._decode_fn = _decode

        self._n_dev = 1
        self._sharding = None
        if data_parallel and seq_parallel:
            raise ValueError(
                "data_parallel and seq_parallel are mutually exclusive: "
                "the first shards the batch axis, the second the time axis")
        if data_parallel and jax.device_count() > 1:
            from mqgan_tpu.parallel.mesh import batch_sharding, make_mesh

            mesh = make_mesh()
            self._n_dev = mesh.shape["data"]
            self._sharding = batch_sharding(mesh)

        self._seq_mesh = None
        # round sharded-call lengths up to a multiple of this (masked pad
        # frames) so directory-scale runs over arbitrary file lengths hit
        # a bounded set of compiled geometries instead of one per length
        self._seq_len_grid = 256
        if seq_parallel:
            from mqgan_tpu.parallel.seqpar import (
                replicate_variables,
                seq_mesh,
            )

            self._seq_mesh = seq_mesh()
            self._gen = gen
            # broadcast once at load time; decode-time device_put is then
            # a no-op
            self._variables = replicate_variables(params, self._seq_mesh)

    @property
    def unbounded_length(self) -> bool:
        """True when the codec accepts any T in one call (the seq mesh
        windows internally) — callers can skip host-side chunking."""
        return self._seq_mesh is not None

    def _seq_pad_t(self, arr, fill=0):
        """Right-pad the time axis up to the compile-geometry grid; the
        extra frames sit beyond every row's length (masked)."""
        t = arr.shape[1]
        tp = -(-max(t, 1) // self._seq_len_grid) * self._seq_len_grid
        if tp == t:
            return arr, t
        pad = np.full((arr.shape[0], tp - t) + arr.shape[2:], fill, arr.dtype)
        return np.concatenate([arr, pad], axis=1), t

    def _prepare(self, arr, lengths, pad_value=0.0):
        b, t = arr.shape[0], arr.shape[1]
        lengths = np.asarray(lengths, np.int32)
        tb = self._policy.bucket_for(t)
        if tb != t:
            pad_shape = (b, tb - t) + arr.shape[2:]
            arr = np.concatenate([arr, np.full(pad_shape, pad_value, arr.dtype)], 1)
        pad_mask = np.arange(tb)[None, :] >= lengths[:, None]
        # repeat-pad the batch to a multiple of the mesh size
        from mqgan_tpu.core.buckets import repeat_pad_rows

        arr, pad_mask = repeat_pad_rows((arr, pad_mask), self._n_dev)
        return arr, pad_mask, t, b

    def _put(self, *arrays):
        if self._sharding is None:
            return arrays
        import jax

        return tuple(jax.device_put(a, self._sharding) for a in arrays)

    def encode(self, spec, lengths=None):
        spec = np.asarray(spec, np.float32)
        if lengths is None:
            lengths = np.full((spec.shape[0],), spec.shape[1], np.int32)
        if self._seq_mesh is not None:
            idx, _ = self._seq_reencode(spec, lengths)
            return idx
        spec, pad_mask, t, b = self._prepare(spec, lengths)
        spec, pad_mask = self._put(spec, pad_mask)
        return np.asarray(self._encode_fn(spec, pad_mask))[:b, :t]

    def decode(self, indices, lengths=None):
        indices = np.asarray(indices, np.int32)
        if lengths is None:
            lengths = np.full((indices.shape[0],), indices.shape[1], np.int32)
        if self._seq_mesh is not None:
            import jax.numpy as jnp

            from mqgan_tpu.parallel.seqpar import seq_parallel_decode

            padded, t = self._seq_pad_t(indices)
            out = seq_parallel_decode(
                self._gen, self._variables, jnp.asarray(padded),
                jnp.asarray(np.asarray(lengths, np.int32)), self._seq_mesh)
            return np.asarray(out, np.float32)[:, :t]
        indices, pad_mask, t, b = self._prepare(indices, lengths, 0)
        indices, pad_mask = self._put(indices, pad_mask)
        return np.asarray(self._decode_fn(indices, pad_mask))[:b, :t]

    def reencode(self, spec, lengths=None):
        """(B, T, mel) -> (tokens, refined mel)."""
        if self._seq_mesh is not None:
            if lengths is None:
                lengths = np.full((spec.shape[0],), spec.shape[1], np.int32)
            return self._seq_reencode(np.asarray(spec, np.float32), lengths)
        idx = self.encode(spec, lengths)
        return idx, self.decode(idx, lengths)

    def _seq_reencode(self, spec, lengths):
        """Full pipeline, time axis sharded: one fused per-window
        encode->FSQ->decode dispatch per device (parallel/seqpar.py;
        conv-exact, CBAM window approximation as in chunked eval)."""
        import jax.numpy as jnp

        from mqgan_tpu.parallel.seqpar import seq_parallel_reencode

        padded, t = self._seq_pad_t(spec, fill=0.0)
        idx, out = seq_parallel_reencode(
            self._gen, self._variables, jnp.asarray(padded),
            jnp.asarray(np.asarray(lengths, np.int32)), self._seq_mesh)
        return (np.asarray(idx, np.int32)[:, :t],
                np.asarray(out, np.float32)[:, :t])


def reencode_spectrograms(
    codec,
    input_dir: str,
    output_dir: str,
    *,
    batch_size: int = 8,
    save_tokens: bool = False,
    tokens_dir: str | None = None,
    max_chunk: int | None = None,
    halos: tuple | None = None,
) -> dict:
    """Walk input_dir, re-encode every .npy mel, mirror the tree into
    output_dir. Returns {'processed': n, 'failed': n}.

    Files longer than the largest bucket are processed in OVERLAPPING
    windows with seam-discard (core/chunking.py): each kept frame carries
    the generator's conv receptive field as context, so chunk boundaries
    are seamless (vs the round-2 overlap-free splits, whose kept frames
    near a boundary lacked context). ``halos`` overrides the default
    flagship (left, right) halo; pass (0, 0) to recover disjoint chunks."""
    files = find_npy_files(input_dir)
    print(f"Found {len(files)} spectrograms under {input_dir}")
    os.makedirs(output_dir, exist_ok=True)
    if save_tokens and tokens_dir:
        os.makedirs(tokens_dir, exist_ok=True)

    from mqgan_tpu.core.chunking import (
        FLAGSHIP_KERNEL_SIZES, FLAGSHIP_REFINER_DEPTH, chunk_plan,
        generator_halos, halo_align)

    if max_chunk is None and getattr(codec, "unbounded_length", False):
        # a sequence-parallel codec windows the time axis internally (over
        # the device mesh) — feed whole files, no host-side chunk plan
        max_chunk = 1 << 30
        halos = (0, 0)
    max_chunk = max_chunk or max(codec.buckets)
    if halos is not None:
        halo_l, halo_r = halos
    else:
        halo_l, halo_r = getattr(codec, "halos", None) or generator_halos(
            FLAGSHIP_KERNEL_SIZES, FLAGSHIP_REFINER_DEPTH)
    align = int(getattr(codec, "halo_align", None)
                or halo_align(FLAGSHIP_REFINER_DEPTH))
    processed = failed = 0

    # read-ahead: load the next batch's files while the device computes
    def _loader(q):
        for start in range(0, len(files), batch_size):
            batch_files = files[start : start + batch_size]
            try:
                mels = [np.asarray(load_npy(p), np.float32) for p in batch_files]
                q.put((batch_files, mels, None))
            except Exception as e:  # noqa: BLE001
                q.put((batch_files, None, e))
        q.put(None)

    q: "queue.Queue" = queue.Queue(maxsize=2)
    threading.Thread(target=_loader, args=(q,), daemon=True).start()

    while True:
        item = q.get()
        if item is None:
            break
        batch_files, mels, load_err = item
        try:
            if load_err is not None:
                raise load_err
            t_total = max(m.shape[0] for m in mels)
            t_max = min(t_total, max_chunk)
            out_specs = [
                np.zeros((m.shape[0], codec.mel_channels), np.float32)
                for m in mels
            ]
            out_tokens = [np.zeros((m.shape[0],), np.int32) for m in mels]

            # overlap-chunk long files to the largest bucket, discard
            # seams; strict=False shrinks halos when the exported buckets
            # are smaller than the model's receptive field (best effort)
            for span in chunk_plan(t_total, t_max, halo_l, halo_r,
                                   align=align, strict=False):
                w = span.stop - span.start
                chunk = np.zeros((len(mels), w, codec.mel_channels), np.float32)
                lens = np.zeros((len(mels),), np.int32)
                for i, m in enumerate(mels):
                    n = min(max(m.shape[0] - span.start, 0), w)
                    if n > 0:
                        chunk[i, :n] = m[span.start : span.start + n]
                    lens[i] = n
                if (lens == 0).all():
                    continue
                safe_lens = np.maximum(lens, 1)
                tokens, recon = codec.reencode(chunk, safe_lens)
                for i, m in enumerate(mels):
                    lo = span.keep_lo
                    hi = min(span.keep_hi, m.shape[0])
                    if hi > lo:
                        ll, lh = lo - span.start, hi - span.start
                        out_specs[i][lo:hi] = recon[i, ll:lh]
                        out_tokens[i][lo:hi] = tokens[i, ll:lh]

            for path, spec, toks in zip(batch_files, out_specs, out_tokens):
                rel = os.path.relpath(path, input_dir)
                dst = os.path.join(output_dir, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                np.save(dst, spec)
                if save_tokens and tokens_dir:
                    tdst = os.path.join(tokens_dir, rel)
                    os.makedirs(os.path.dirname(tdst), exist_ok=True)
                    np.save(tdst, toks.astype(np.int64))
                processed += 1
        except Exception as e:  # noqa: BLE001 — per-batch tolerance
            # (reference reencode_spectrograms.py:83-85)
            print(f"Batch starting at {batch_files[0]} failed: {e}")
            failed += len(batch_files)

    print(f"Re-encoded {processed} files ({failed} failed) -> {output_dir}")
    return {"processed": processed, "failed": failed}


def main(argv=None):
    from mqgan_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # honor JAX_PLATFORMS even under site overrides
    p = argparse.ArgumentParser(description="Re-encode mel datasets through the codec.")
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--model_dir", help="exported StableHLO artifact directory")
    p.add_argument("--checkpoint", help="orbax dir or torch .pth (needs --config)")
    p.add_argument("--config", help="model config yaml (with --checkpoint)")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--save_tokens", action="store_true")
    p.add_argument("--tokens_dir", default=None)
    p.add_argument("--data_parallel", action="store_true",
                   help="shard batches over all local devices (both "
                        "sources; the exported artifact compiles one "
                        "copy per device)")
    p.add_argument("--compile_cache", default=None,
                   help="persistent XLA compile cache dir (cuts exported-"
                        "artifact cold starts ~36x across processes)")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute for the checkpoint source (exported "
                        "artifacts already bake their dtype)")
    p.add_argument("--seq_parallel", action="store_true",
                   help="checkpoint source only: shard each call's TIME "
                        "axis over all local devices (halo'd shard_map "
                        "windows running the full encode+decode pipeline; "
                        "parallel/seqpar.py) instead of the batch axis — "
                        "whole files go through in one sharded dispatch, "
                        "no host-side chunking")
    p.add_argument("--exact_mixers", action="store_true",
                   help="checkpoint source: serve the exact "
                        "transcendental mixer MLPs instead of the "
                        "default poly_mixers='decode' Chebyshev post "
                        "mixer (tokens are bit-identical either way; "
                        "exact forgoes the measured 1.07x decode win)")
    args = p.parse_args(argv)

    if args.model_dir:
        if args.seq_parallel:
            p.error("--seq_parallel needs --checkpoint/--config (GSPMD "
                    "cannot re-shard a deserialized StableHLO call)")
        from mqgan_tpu.deploy.runtime import ExportedPreEncoder

        codec = ExportedPreEncoder(args.model_dir,
                                   compilation_cache_dir=args.compile_cache,
                                   data_parallel=args.data_parallel)
    elif args.checkpoint and args.config:
        import jax.numpy as jnp

        codec = CheckpointReencoder(args.config, args.checkpoint,
                                    dtype=jnp.bfloat16 if args.bf16 else None,
                                    data_parallel=args.data_parallel,
                                    seq_parallel=args.seq_parallel,
                                    poly_mixers=(False if args.exact_mixers
                                                 else "decode"))
    else:
        p.error("provide --model_dir, or --checkpoint with --config")

    reencode_spectrograms(
        codec, args.input_dir, args.output_dir,
        batch_size=args.batch_size, save_tokens=args.save_tokens,
        tokens_dir=args.tokens_dir,
    )


if __name__ == "__main__":
    main()
