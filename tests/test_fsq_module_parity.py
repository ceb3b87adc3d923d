"""FSQ module parity vs the reference quantizer.FSQ (eval mode), covering
the full feature surface: projections, multi-codebook, channel_first,
symmetry-preserving bound."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mqgan_tpu.quant.fsq import FSQ
from tests.reference_loader import load_reference_modules


@pytest.fixture(scope="module")
def ref_q():
    _, quantizer, *_ = load_reference_modules()
    return quantizer


def _sync_projections(tmodel, variables):
    """Copy our initialized projection weights into the torch model so both
    run identical parameters."""
    p = variables["params"]
    with torch.no_grad():
        tmodel.project_in.weight.copy_(
            torch.from_numpy(np.asarray(p["project_in"]["kernel"]).T)
        )
        tmodel.project_out.weight.copy_(
            torch.from_numpy(np.asarray(p["project_out"]["kernel"]).T)
        )
        if "bias" in p["project_in"]:
            tmodel.project_in.bias.copy_(
                torch.from_numpy(np.asarray(p["project_in"]["bias"]))
            )
            tmodel.project_out.bias.copy_(
                torch.from_numpy(np.asarray(p["project_out"]["bias"]))
            )


def test_projectionless_parity(ref_q, rng):
    levels = [8, 5, 5, 5]
    z = rng.standard_normal((2, 20, 4)).astype(np.float32)

    tmodel = ref_q.FSQ(levels=levels)
    tmodel.eval()
    with torch.no_grad():
        t_out, t_idx = tmodel(torch.from_numpy(z))

    ours = FSQ(levels=tuple(levels))
    variables = ours.init(jax.random.key(0), jnp.asarray(z))
    j_out, j_idx = ours.apply(variables, jnp.asarray(z))

    np.testing.assert_array_equal(np.asarray(j_idx), t_idx.numpy())
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=1e-5)


def test_projection_parity(ref_q, rng):
    levels = [8, 5, 5, 5]
    dim = 32
    z = rng.standard_normal((2, 10, dim)).astype(np.float32)

    ours = FSQ(levels=tuple(levels), dim=dim)
    variables = ours.init(jax.random.key(0), jnp.asarray(z))
    assert ours.has_projections

    torch.manual_seed(0)
    tmodel = ref_q.FSQ(levels=levels, dim=dim)
    tmodel.eval()
    _sync_projections(tmodel, variables)
    with torch.no_grad():
        t_out, t_idx = tmodel(torch.from_numpy(z))

    j_out, j_idx = ours.apply(variables, jnp.asarray(z))
    np.testing.assert_array_equal(np.asarray(j_idx), t_idx.numpy())
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=1e-5)


def test_multi_codebook_parity(ref_q, rng):
    levels = [8, 5, 5]
    num_cb = 2
    z = rng.standard_normal((2, 12, 6)).astype(np.float32)  # 3 * 2 books

    tmodel = ref_q.FSQ(levels=levels, num_codebooks=num_cb)
    tmodel.eval()
    with torch.no_grad():
        t_out, t_idx = tmodel(torch.from_numpy(z))

    ours = FSQ(levels=tuple(levels), num_codebooks=num_cb)
    variables = ours.init(jax.random.key(0), jnp.asarray(z))
    j_out, j_idx = ours.apply(variables, jnp.asarray(z))

    assert j_idx.shape == (2, 12, 2)  # trailing codebook axis kept
    np.testing.assert_array_equal(np.asarray(j_idx), t_idx.numpy())
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=1e-5)


def test_channel_first_parity(ref_q, rng):
    levels = [8, 5, 5, 5]
    z = rng.standard_normal((2, 4, 15)).astype(np.float32)  # (B, d, L)

    tmodel = ref_q.FSQ(levels=levels, channel_first=True)
    tmodel.eval()
    with torch.no_grad():
        t_out, t_idx = tmodel(torch.from_numpy(z))

    ours = FSQ(levels=tuple(levels), channel_first=True)
    variables = ours.init(jax.random.key(0), jnp.asarray(z))
    j_out, j_idx = ours.apply(variables, jnp.asarray(z))

    assert j_out.shape == z.shape
    np.testing.assert_array_equal(np.asarray(j_idx), t_idx.numpy())
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=1e-5)


def test_symmetry_preserving_parity(ref_q, rng):
    levels = [7, 5, 3]
    z = rng.standard_normal((2, 9, 3)).astype(np.float32)

    tmodel = ref_q.FSQ(levels=levels, preserve_symmetry=True)
    tmodel.eval()
    with torch.no_grad():
        t_out, t_idx = tmodel(torch.from_numpy(z))

    ours = FSQ(levels=tuple(levels), preserve_symmetry=True)
    variables = ours.init(jax.random.key(0), jnp.asarray(z))
    j_out, j_idx = ours.apply(variables, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(j_idx), t_idx.numpy())
