"""Multi-host (multi-slice) utilities.

Single-host behavior is the identity path (tested); on a real multi-host
TPU deployment each process calls `initialize()` once, shards its file list
with `shard_files_for_host`, and assembles global batches from
process-local data with `make_global_batch` — jit + GSPMD handles the rest
(the train step is already pure and sharding-agnostic).
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize wrapper.

    With no args, attempts jax's auto-detection (TPU metadata / cluster
    env); falls back to single-host when none is found, so calling this
    unconditionally at startup is safe everywhere."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError) as e:
        if coordinator_address is not None or num_processes is not None:
            raise  # explicit multi-host request must not be swallowed
        print(f"multihost: single-host mode ({e})")


def host_info() -> tuple[int, int]:
    return jax.process_index(), jax.process_count()


def shard_files_for_host(files: Sequence[str]) -> list:
    """Deterministic round-robin file shard for this host.

    NOT used by the GAN trainer: training shards ROWS of each global batch
    (train/data.py MelLoader process_index/process_count) so batch content
    and step counts are process-count-invariant. This helper remains for
    embarrassingly-parallel work division (e.g. batch re-encode), where
    uneven shards are harmless."""
    idx, count = host_info()
    return [f for i, f in enumerate(files) if i % count == idx]


def globalize_tree(tree, shardings):
    """Place host/local pytree values onto (possibly multi-process) shardings.

    ``shardings`` is a matching pytree (or a prefix thereof via tree.map
    broadcasting rules) of NamedShardings. Single-process: plain device_put.
    Multi-process: device_put to a sharding with non-addressable devices is
    illegal, so arrays are lifted to global jax.Arrays via
    make_array_from_callback instead — each process must hold the identical
    FULL value (true for the deterministic same-seed init and for checkpoint
    restores); the callback slices out whatever shard each local device
    needs, so this works for replicated AND model-sharded (TP) specs alike.
    Typed PRNG keys are round-tripped through key_data/wrap_key_data."""
    if jax.process_count() == 1:
        return jax.tree.map(lambda x, s: jax.device_put(x, s), tree, shardings)

    def put(x, s):
        if isinstance(x, jax.Array) and jax.dtypes.issubdtype(
                x.dtype, jax.dtypes.prng_key):
            impl = jax.random.key_impl(x)
            data = np.asarray(jax.random.key_data(x))
            g = jax.make_array_from_callback(
                data.shape, s, lambda idx: data[idx])
            return jax.random.wrap_key_data(g, impl=impl)
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, s, lambda idx: x[idx])

    return jax.tree.map(put, tree, shardings)


def replicate_tree(tree, sharding):
    """globalize_tree with one replicated sharding for every leaf."""
    return globalize_tree(tree, jax.tree.map(lambda _: sharding, tree))


def make_global_batch(mesh, local_batch):
    """Assemble a globally-sharded array from per-process local data.

    local_batch: numpy array holding THIS process's rows; the global batch
    is the concatenation over processes, sharded over the mesh's
    (dcn, data) batch axes — and for (B, T, ...) arrays the TIME axis
    additionally over 'seq' (multihost x sequence parallelism: each
    row's seq shards live on ONE process's devices, enforced by the
    trainer, so this process still supplies its rows with FULL T).
    Single-process: equivalent to a device_put with the same sharding.
    """
    from mqgan_tpu.parallel.mesh import train_array_sharding

    sharding = train_array_sharding(mesh, np.ndim(local_batch))
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(local_batch))
