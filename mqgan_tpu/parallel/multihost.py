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
    """Deterministic round-robin file shard for this host."""
    idx, count = host_info()
    return [f for i, f in enumerate(files) if i % count == idx]


def make_global_batch(mesh, local_batch):
    """Assemble a globally-sharded array from per-process local data.

    local_batch: numpy array holding THIS process's rows; the global batch
    is the concatenation over processes, sharded over the mesh's data axis.
    Single-process: equivalent to a device_put with the batch sharding.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mqgan_tpu.parallel.mesh import DATA_AXIS

    sharding = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(local_batch))
