"""Sequence-parallel (SP) inference: shard one long clip's TIME axis over
the device mesh — decode-only (token -> mel, exact) and the full
encode+FSQ+decode pipeline (mel -> tokens -> mel, conv-exact with the
documented CBAM window approximation).

The reference evaluates long sequences in one single-device pass
(/root/reference/train.py:585-599) and has no distributed inference at all.
Data parallelism (deploy/runtime.py) already scales *many* clips over
devices; this module scales ONE long clip: the mesh's devices each decode a
halo'd window of the time axis inside a single jitted ``shard_map`` and
keep only their interior frames, so per-device memory and latency scale as
~1/N while the result is numerically EQUAL to a full-length single-device
decode (the decode side is fully time-local — core/chunking.py).

Design (TPU-first):

* mesh: 1-D ``Mesh`` over N devices with axis ``"seq"``.
* tokens are replicated (a (B, T) int32 array is KB-scale — broadcasting it
  once is cheaper than a ppermute halo exchange and keeps edge windows
  trivially exact); the (B, T, mel) activations, where the memory and FLOPs
  live, exist only as per-device windows and the output is materialized
  sharded over time.
* each device i computes window start
  ``s_i = clip(i*chunk - halo_l, 0, t_pad - w)`` with
  ``w = chunk + halo_l + halo_r`` and keeps local frames
  ``[i*chunk - s_i, i*chunk - s_i + chunk)``. All of chunk / halo_l / w /
  t_pad are multiples of ``2**refiner_depth`` so every window start sits on
  the UNet pooling grid (core/chunking.halo_align); clamping binds only at
  the clip edges, where it degrades into *more* context, never less.
* pad masks follow the padded-decode convention used everywhere else in the
  repo (deploy/runtime.py, tests/test_chunking.py): position p is masked
  iff ``p >= length``, identically in the full pass and in every window, so
  kept frames match to float tolerance (tests/test_seqpar.py).

Halos are decoder_halos() (flagship: 96 left / 72 right), so at the largest
bucket (chunk=512) the redundant halo compute is ~25% — against an ~N x
latency win and an ~N x activation-memory win for clips that cannot fit one
device at all.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

import numpy as np

from mqgan_tpu.core.chunking import decoder_halos, generator_halos, halo_align

try:  # jax >= 0.6 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

SEQ_AXIS = "seq"


def seq_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices with axis ``"seq"``."""
    devices = jax.devices() if devices is None else list(devices)
    return Mesh(np.asarray(devices), (SEQ_AXIS,))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def replicate_variables(variables, mesh: Mesh):
    """Place a variables tree fully replicated over ``mesh`` (a no-op for
    trees that already live there; a broadcast for single-device trees,
    e.g. a restored checkpoint committed to device 0). Call once at load
    time for repeated serving calls."""
    from jax.sharding import NamedSharding

    return jax.device_put(variables, NamedSharding(mesh, P()))


@dataclass(frozen=True)
class SeqPlan:
    """Static geometry of one sequence-parallel decode."""

    n: int  # devices on the seq axis
    t: int  # true clip length (frames)
    chunk: int  # kept frames per device
    t_pad: int  # n * chunk
    halo_l: int
    halo_r: int
    window: int  # chunk + halo_l + halo_r, clamped to t_pad

    @property
    def redundancy(self) -> float:
        """Extra decoded frames / kept frames (halo overhead)."""
        return self.n * self.window / max(self.t_pad, 1) - 1.0


def _plan(t: int, n: int, halo_l: int, halo_r: int, align: int) -> SeqPlan:
    chunk = _round_up(max(1, math.ceil(t / n)), align)
    t_pad = chunk * n
    # windows larger than the padded clip degenerate to full-length decodes
    # on every device (exact, just redundant) — short-clip / small-N case
    window = min(chunk + halo_l + halo_r, t_pad)
    return SeqPlan(n, t, chunk, t_pad, halo_l, halo_r, window)


def plan_seq_decode(
    t: int, n: int, kernel_sizes, refiner_depth: int,
    mixer_kernel: int = 5,
) -> SeqPlan:
    halo_l, halo_r = decoder_halos(
        tuple(kernel_sizes), refiner_depth, mixer_kernel)
    return _plan(t, n, halo_l, halo_r, halo_align(refiner_depth))


def plan_seq_reencode(
    t: int, n: int, kernel_sizes, refiner_depth: int,
    mixer_kernel: int = 5,
) -> SeqPlan:
    """Like plan_seq_decode but with the COMPOSED encode+decode halos
    (core/chunking.generator_halos): the leftmost token a kept frame's
    decode reads must itself carry the encoder's conv context inside the
    window."""
    halo_l, halo_r = generator_halos(
        tuple(kernel_sizes), refiner_depth, mixer_kernel)
    return _plan(t, n, halo_l, halo_r, halo_align(refiner_depth))


def seq_parallel_decode(
    gen,
    variables: Any,
    indices: jax.Array,  # (B, T) int32 packed FSQ indices
    lengths: jax.Array,  # (B,) int32 valid frames per row
    mesh: Mesh | None = None,
):
    """Decode ``indices`` to refined mel (B, T, mel) with the time axis
    sharded over ``mesh``'s ``"seq"`` devices.

    Equal to ``gen.decode`` under the padded-decode convention (masked
    positions are those >= length); parity pinned in tests/test_seqpar.py.
    ``gen`` is a models.preencoder.PreEncoder (or anything exposing
    ``kernel_sizes``/``refiner_depth`` and a ``decode(indices, pad_mask)``
    method).
    """
    mesh = mesh if mesh is not None else seq_mesh()
    if tuple(mesh.axis_names) != (SEQ_AXIS,):
        raise ValueError(f"mesh must be 1-D over axis {SEQ_AXIS!r}")
    n = mesh.shape[SEQ_AXIS]
    b, t = indices.shape
    plan = plan_seq_decode(t, n, gen.kernel_sizes, gen.refiner_depth)
    chunk, t_pad, w = plan.chunk, plan.t_pad, plan.window
    halo_l = plan.halo_l

    idx = jnp.zeros((b, t_pad), indices.dtype).at[:, :t].set(indices)
    lengths = jnp.minimum(lengths.astype(jnp.int32), t)

    # params restored from a checkpoint are committed to ONE device;
    # shard_map needs them replicated over the seq mesh. device_put is a
    # no-op for trees already placed this way (replicate_variables).
    variables = replicate_variables(variables, mesh)
    fn = _compiled_seq_decode(gen, mesh, chunk, t_pad, w, halo_l)
    out = fn(variables, idx, lengths)
    return out[:, :t]


def seq_parallel_reencode(
    gen,
    variables: Any,
    mel: jax.Array,  # (B, T, mel) float
    lengths: jax.Array,  # (B,) int32 valid frames per row
    mesh: Mesh | None = None,
    return_recon: bool = False,
):
    """Re-encode ``mel`` (encode -> FSQ -> decode) with the time axis
    sharded over ``mesh``: each device runs the WHOLE pipeline on one
    halo'd window inside a single shard_map dispatch and keeps its
    interior (tokens, refined mel). Returns ``(indices (B, T) int32,
    x_post (B, T, mel))`` — with ``return_recon`` also the pre-refiner
    ``x_recon`` in between (full-length exact eval wants both).

    EXACT vs a single full-length pass — including the encoder's global
    channel attention: conv receptive fields are covered by the composed
    generator_halos, and the CBAM gates' global pooled statistics are
    computed over each device's interior frames (each clip frame counted
    exactly once) and psum/pmax-reduced over the seq axis, so they equal
    the full-pass statistics bit-for-bit. This makes seq-parallel
    re-encode STRONGER than the host-side chunked eval path
    (core/chunking.py), which approximates CBAM with window-local stats;
    parity on arbitrary input is pinned in tests/test_seqpar.py.
    """
    mesh = mesh if mesh is not None else seq_mesh()
    if tuple(mesh.axis_names) != (SEQ_AXIS,):
        raise ValueError(f"mesh must be 1-D over axis {SEQ_AXIS!r}")
    n = mesh.shape[SEQ_AXIS]
    b, t = mel.shape[0], mel.shape[1]
    plan = plan_seq_reencode(t, n, gen.kernel_sizes, gen.refiner_depth)
    chunk, t_pad, w = plan.chunk, plan.t_pad, plan.window
    halo_l = plan.halo_l

    x = jnp.zeros((b, t_pad, mel.shape[2]), mel.dtype).at[:, :t].set(mel)
    lengths = jnp.minimum(lengths.astype(jnp.int32), t)

    variables = replicate_variables(variables, mesh)
    fn = _compiled_seq_reencode(gen, mesh, chunk, t_pad, w, halo_l,
                                return_recon)
    out = fn(variables, x, lengths)
    return tuple(o[:, :t] for o in out)


# jit caches on function identity; keep the shard_map-wrapped callable per
# (module, mesh, geometry) so repeated serving calls don't re-trace.
_JIT_CACHE: dict = {}


def _window_geometry(i, chunk: int, t_pad: int, w: int, halo_l: int):
    """Per-device window start and kept-interior offset (shared by the
    decode-only and full-pipeline shard bodies)."""
    s = jnp.clip(i * chunk - halo_l, 0, t_pad - w)
    return s, i * chunk - s


def _compiled_seq_reencode(gen, mesh: Mesh, chunk: int, t_pad: int, w: int,
                           halo_l: int, return_recon: bool = False):
    key = ("reencode", gen, mesh, chunk, t_pad, w, halo_l, return_recon)
    fn = _JIT_CACHE.get(key)
    if fn is not None:
        return fn

    def _pipeline(m, win, mask, stats_mask):
        idx = m.encode(win, mask, stats_mask=stats_mask, seq_axis=SEQ_AXIS)
        if return_recon:
            post, recon = m.decode(idx, mask, return_recon=True)
            return idx, recon, post
        return idx, m.decode(idx, mask)

    def _shard(vars_, x_, len_):
        i = lax.axis_index(SEQ_AXIS)
        s, off = _window_geometry(i, chunk, t_pad, w, halo_l)
        win = lax.dynamic_slice_in_dim(x_, s, w, axis=1)
        pos = s + jnp.arange(w, dtype=jnp.int32)
        mask = pos[None, :] >= len_[:, None]
        # CBAM stats count each clip frame on exactly ONE device: a
        # device's interior [off, off+chunk) of valid frames. psum/pmax
        # over the seq axis then reproduce the full-pass global gate —
        # halo frames keep real values (mask), they just don't vote.
        local = jnp.arange(w, dtype=jnp.int32)
        interior = (local >= off) & (local < off + chunk)
        stats_mask = mask | ~interior[None, :]
        outs = gen.apply(vars_, win, mask, stats_mask, method=_pipeline)
        return tuple(
            lax.dynamic_slice_in_dim(o, off, chunk, axis=1) for o in outs)

    n_out = 3 if return_recon else 2
    fn = jax.jit(_shard_map(
        _shard,
        mesh=mesh,
        in_specs=(P(), P(None, None, None), P(None)),
        out_specs=(P(None, SEQ_AXIS),)
        + (P(None, SEQ_AXIS, None),) * (n_out - 1),
    ))
    _JIT_CACHE[key] = fn
    return fn


def _compiled_seq_decode(gen, mesh: Mesh, chunk: int, t_pad: int, w: int,
                         halo_l: int):
    key = ("decode", gen, mesh, chunk, t_pad, w, halo_l)
    fn = _JIT_CACHE.get(key)
    if fn is not None:
        return fn

    def _shard(vars_, idx_, len_):
        i = lax.axis_index(SEQ_AXIS)
        s, off = _window_geometry(i, chunk, t_pad, w, halo_l)
        win = lax.dynamic_slice_in_dim(idx_, s, w, axis=1)
        pos = s + jnp.arange(w, dtype=jnp.int32)
        mask = pos[None, :] >= len_[:, None]
        mel = gen.apply(vars_, win, mask, method=type(gen).decode)
        return lax.dynamic_slice_in_dim(mel, off, chunk, axis=1)

    fn = jax.jit(_shard_map(
        _shard,
        mesh=mesh,
        in_specs=(P(), P(None, None), P(None)),
        out_specs=P(None, SEQ_AXIS, None),
    ))
    _JIT_CACHE[key] = fn
    return fn
