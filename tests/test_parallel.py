"""Multi-device tests on the virtual 8-CPU mesh: DP equivalence, TP
shardings, and the driver dryrun entry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from mqgan_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
    state_shardings,
)


def test_mesh_construction():
    assert jax.device_count() == 8
    m = make_mesh()
    assert m.shape[DATA_AXIS] == 8 and m.shape[MODEL_AXIS] == 1
    m2 = make_mesh(n_data=4, n_model=2)
    assert m2.shape[DATA_AXIS] == 4 and m2.shape[MODEL_AXIS] == 2


def test_data_parallel_matches_single_device(rng):
    """A jitted computation over sharded inputs equals the unsharded result."""
    mesh = make_mesh()
    x = rng.standard_normal((16, 32)).astype(np.float32)

    @jax.jit
    def f(x):
        return jnp.tanh(x) @ jnp.ones((32, 8), np.float32), jnp.mean(x)

    ref_y, ref_m = f(jnp.asarray(x))
    xs = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
    y, m = f(xs)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y), atol=1e-6)
    np.testing.assert_allclose(float(m), float(ref_m), atol=1e-6)


def test_state_shardings_rules():
    mesh = make_mesh(n_data=4, n_model=2)
    state = {
        "big_kernel": np.zeros((3, 64, 128), np.float32),
        "small": np.zeros((4,), np.float32),
        "scalar": np.zeros((), np.float32),
    }
    sh = state_shardings(mesh, state)
    assert sh["big_kernel"].spec == P(None, None, MODEL_AXIS)
    assert sh["small"].spec == P()
    assert sh["scalar"].spec == P()


@pytest.mark.slow
def test_dryrun_multichip_8():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry2", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out[0].shape == (8, 256, 128)
    assert out[2].shape == (8, 256)


def test_multihost_single_process_paths(rng):
    """Single-host identity behavior of the multi-host utilities."""
    from mqgan_tpu.parallel.multihost import (
        host_info,
        initialize,
        make_global_batch,
        shard_files_for_host,
    )

    initialize()  # no-op single-host
    idx, count = host_info()
    assert idx == 0 and count == 1

    files = [f"f{i}" for i in range(10)]
    assert shard_files_for_host(files) == files

    mesh = make_mesh()
    batch = rng.standard_normal((16, 8)).astype(np.float32)
    arr = make_global_batch(mesh, batch)
    assert arr.shape == (16, 8)
    np.testing.assert_allclose(np.asarray(arr), batch)
    # sharded over the data axis
    assert len(arr.sharding.device_set) == 8
