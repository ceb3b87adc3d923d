"""Golden parity: our PreEncoder vs the PyTorch reference, same weights.

This is the "reconstructions matching PyTorch checkpoints within tolerance"
gate from BASELINE.json: we build the reference model on CPU, import its
state_dict through utils.torch_import, and compare forward/encode/decode.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mqgan_tpu.models.preencoder import PreEncoder
from mqgan_tpu.utils.torch_import import (
    import_generator_params,
    validate_against_template,
)
from tests.reference_loader import load_reference_modules

MEL = 16
CHANNELS = (8, 12)
KERNELS = (3,)
FSQ_LEVELS = (8, 5, 5, 5)
REF_DEPTH = 2
T, B = 24, 2


@pytest.fixture(scope="module")
def ref_and_ours():
    ref_pre, *_ = load_reference_modules()
    torch.manual_seed(0)
    tmodel = ref_pre.PreEncoder(
        mel_channels=MEL,
        channels=list(CHANNELS),
        kernel_sizes=list(KERNELS),
        fsq_levels=list(FSQ_LEVELS),
        dropout=0.0,
        refiner_base_channels=4,
        refiner_depth=REF_DEPTH,
        refiner_hidden_proj_divisor=8,
    )
    tmodel.eval()

    ours = PreEncoder(
        mel_channels=MEL,
        channels=CHANNELS,
        kernel_sizes=KERNELS,
        fsq_levels=FSQ_LEVELS,
        dropout=0.0,
        refiner_base_channels=4,
        refiner_depth=REF_DEPTH,
        refiner_hidden_proj_divisor=8,
    )
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, T, MEL)).astype(np.float32)
    lengths = np.array([20, 24], np.int32)

    template = ours.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(lengths))
    imported = import_generator_params(
        tmodel.state_dict(), CHANNELS, refiner_depth=REF_DEPTH
    )
    validate_against_template(imported, template["params"])
    params = {"params": imported}
    return tmodel, ours, params, x, lengths


def test_forward_parity(ref_and_ours):
    tmodel, ours, params, x, lengths = ref_and_ours
    with torch.no_grad():
        t_recon, t_post = tmodel(torch.from_numpy(x), torch.from_numpy(lengths))

    j_recon, j_post, j_idx = ours.apply(
        params, jnp.asarray(x), jnp.asarray(lengths), deterministic=True
    )

    # compare only valid frames (padded frames are zeroed in both)
    for b, L in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(j_recon)[b, :L], t_recon.numpy()[b, :L], atol=2e-4, rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(j_post)[b, :L], t_post.numpy()[b, :L], atol=5e-4, rtol=1e-3
        )


def test_encode_decode_parity(ref_and_ours):
    tmodel, ours, params, x, lengths = ref_and_ours
    from mqgan_tpu.core.masking import sequence_mask

    pad = sequence_mask(T, jnp.asarray(lengths))
    tmask = torch.from_numpy(np.asarray(pad)).unsqueeze(1)  # (B, 1, T)

    with torch.no_grad():
        t_idx = tmodel.encode(torch.from_numpy(x), tmask)
        t_dec = tmodel.decode(t_idx, tmask)

    j_idx = ours.apply(params, jnp.asarray(x), pad, method=PreEncoder.encode)
    # token indices must match exactly
    np.testing.assert_array_equal(np.asarray(j_idx), t_idx.numpy())
    assert int(jnp.max(j_idx)) < 1000 and int(jnp.min(j_idx)) >= 0

    j_dec = ours.apply(params, j_idx, pad, method=PreEncoder.decode)
    for b, L in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(j_dec)[b, :L], t_dec.numpy()[b, :L], atol=5e-4, rtol=1e-3
        )


def test_forward_consistency_with_encode_decode(ref_and_ours):
    """eval-mode forward x_post == decode(encode(x)) on valid frames."""
    _, ours, params, x, lengths = ref_and_ours
    from mqgan_tpu.core.masking import sequence_mask

    pad = sequence_mask(T, jnp.asarray(lengths))
    _, j_post, j_idx_fwd = ours.apply(
        params, jnp.asarray(x), jnp.asarray(lengths), deterministic=True
    )
    j_idx = ours.apply(params, jnp.asarray(x), pad, method=PreEncoder.encode)
    np.testing.assert_array_equal(np.asarray(j_idx_fwd), np.asarray(j_idx))
    j_dec = ours.apply(params, j_idx, pad, method=PreEncoder.decode)
    for b, L in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(j_dec)[b, :L], np.asarray(j_post)[b, :L], atol=1e-4
        )


def test_token_id_properties():
    m = PreEncoder(mel_channels=MEL, channels=CHANNELS, kernel_sizes=KERNELS,
                   fsq_levels=FSQ_LEVELS)
    assert m.codebook_size == 1000
    assert m.bos_token_id == 1001
    assert m.eos_token_id == 1002
