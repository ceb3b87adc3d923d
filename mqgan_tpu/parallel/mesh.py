"""Device mesh + sharding rules.

The reference has no distributed training at all (SURVEY §2.2); here data
parallelism is first-class, tensor parallelism is available as a second
mesh axis, and sequence (context) parallelism over the crop's TIME axis as
a third. We use jit + GSPMD sharding annotations (not shard_map): batches
are sharded over the 'data' (and optionally 'seq') axes, params are
replicated over 'data'/'seq' and optionally sharded over 'model'; XLA
inserts psum/all-gather collectives over ICI automatically — including the
cross-replica reductions that keep the LeCam EMA state synced
(losses/gan.py), the halo exchanges of spatially-partitioned convolutions
under 'seq', and the global reductions behind every masked pooling/loss
mean over the sharded time axis. Numerics are proven equal to the
single-device step across mesh shapes in tests/test_parallel.py.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DCN_AXIS = "dcn"
DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"


def make_mesh(n_data: int | None = None, n_model: int = 1,
              n_seq: int = 1, n_dcn: int = 1, devices=None) -> Mesh:
    """(dcn, data, model, seq) mesh.

    ``dcn`` is the OUTERMOST axis — the multi-slice / cross-process
    dimension: on a multi-slice TPU pod (or the 2-process dryrun) each
    dcn index is one slice/process, so gradient reductions decompose
    into fast intra-slice (ICI) pieces inside the inner axes plus one
    cross-slice (DCN) reduction over ``dcn``, which is exactly how XLA
    lowers a joint P((dcn, data)) batch sharding. With n_dcn=1 (the
    default, every single-process mesh) the axis is inert."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // (n_model * n_seq * n_dcn)
    total = n_dcn * n_data * n_model * n_seq
    assert total <= len(devices), (
        f"mesh {n_dcn}x{n_data}x{n_model}x{n_seq} needs more than "
        f"{len(devices)} devices"
    )
    dev_array = np.asarray(devices[:total]).reshape(
        n_dcn, n_data, n_model, n_seq)
    return Mesh(dev_array, (DCN_AXIS, DATA_AXIS, MODEL_AXIS, SEQ_AXIS))


def batch_axes(mesh: Mesh) -> tuple:
    """The axes a batch dim shards over: (dcn, data) jointly — the dcn
    part rides DCN between slices, the data part ICI within one."""
    return tuple(a for a in (DCN_AXIS, DATA_AXIS) if a in mesh.shape)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the (dcn, data) axes."""
    return NamedSharding(mesh, P(batch_axes(mesh)))


def train_array_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Sharding for one train-batch array: batch dim over (dcn, data);
    for (B, T, ...) arrays the time dim additionally over 'seq'
    (sequence / context parallelism — per-device activation memory
    ~T/n_seq; crop lengths must divide by n_seq, which every
    power-of-two bucket does). (B,)-shaped arrays (lengths) ride the
    batch axes only."""
    if ndim >= 2 and SEQ_AXIS in mesh.shape and mesh.shape[SEQ_AXIS] > 1:
        return NamedSharding(
            mesh, P(batch_axes(mesh), SEQ_AXIS, *([None] * (ndim - 2))))
    return batch_sharding(mesh)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _param_spec(path: tuple, leaf) -> P:
    """Tensor-parallel rule: shard big kernels on their output-feature (last)
    axis over MODEL_AXIS; replicate small params. With n_model == 1 this is
    inert and exactly data-parallel."""
    ndim = np.ndim(leaf)
    if ndim >= 2 and leaf.shape[-1] % 2 == 0 and leaf.shape[-1] >= 64:
        return P(*([None] * (ndim - 1) + [MODEL_AXIS]))
    return P()


def params_shardings(mesh: Mesh, params: Any):
    """Pytree of NamedShardings for a param tree (TP on large kernels)."""
    if mesh.shape[MODEL_AXIS] == 1:
        return jax.tree.map(lambda _: replicated(mesh), params)

    def to_sharding(path, leaf):
        return NamedSharding(mesh, _param_spec(path, leaf))

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def state_shardings(mesh: Mesh, state: Any):
    """Shardings for a whole TrainState: model params + mirrored optimizer
    moments get the TP rule; scalars / rng / EMA state are replicated."""
    n_model = mesh.shape[MODEL_AXIS]

    def to_sharding(path, leaf):
        if n_model > 1 and np.ndim(leaf) >= 2 and np.shape(leaf)[-1] % n_model == 0:
            return NamedSharding(mesh, _param_spec(path, leaf))
        return replicated(mesh)

    return jax.tree_util.tree_map_with_path(to_sharding, state)


def shard_batch(mesh: Mesh, batch):
    """device_put a host batch with the data-parallel sharding."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
