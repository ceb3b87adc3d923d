"""Randomized-config golden parity sweep vs the PyTorch reference.

The fixed-config parity test (test_preencoder_parity.py) pins one
architecture; this sweep varies channels/kernels/FSQ levels/refiner shape
and asserts identical tokens + matching recon for each — catching layout
or mapping bugs that only appear for particular shapes (channel changes,
even/odd kernels, deeper refiners, non-pow2 mels).
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

CONFIGS = [
    # (mel, channels, kernels, fsq_levels, ref_base, ref_depth, divisor, T)
    (24, (8, 8), (5,), (8, 5, 5, 5), 4, 1, 8, 20),
    (16, (6, 10, 14), (3, 5), (4, 4, 4), 4, 2, 4, 33),
    (32, (12, 12), (7,), (8, 8, 5, 5, 5), 8, 3, 8, 40),
]


@pytest.mark.parametrize("mel,channels,kernels,levels,rbase,rdepth,div,t",
                         CONFIGS)
def test_parity_sweep(mel, channels, kernels, levels, rbase, rdepth, div, t):
    ref_pre, *_ = load_reference_modules()
    torch.manual_seed(hash((mel, channels)) % 2**31)
    tmodel = ref_pre.PreEncoder(
        mel_channels=mel, channels=list(channels), kernel_sizes=list(kernels),
        fsq_levels=list(levels), dropout=0.0,
        refiner_base_channels=rbase, refiner_depth=rdepth,
        refiner_hidden_proj_divisor=div,
    )
    tmodel.eval()

    ours = PreEncoder(
        mel_channels=mel, channels=channels, kernel_sizes=kernels,
        fsq_levels=levels, dropout=0.0,
        refiner_base_channels=rbase, refiner_depth=rdepth,
        refiner_hidden_proj_divisor=div,
    )
    rng = np.random.default_rng(mel)
    x = rng.standard_normal((2, t, mel)).astype(np.float32)
    lengths = np.array([t, max(1, t - 7)], np.int32)

    template = ours.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(lengths))
    imported = import_generator_params(tmodel.state_dict(), channels,
                                       refiner_depth=rdepth)
    validate_against_template(imported, template["params"])
    params = {"params": imported}

    with torch.no_grad():
        t_recon, t_post = tmodel(torch.from_numpy(x), torch.from_numpy(lengths))
    j_recon, j_post, j_idx = ours.apply(
        params, jnp.asarray(x), jnp.asarray(lengths), deterministic=True
    )

    from mqgan_tpu.core.masking import sequence_mask

    pad = sequence_mask(t, jnp.asarray(lengths))
    tmask = torch.from_numpy(np.asarray(pad)).unsqueeze(1)
    with torch.no_grad():
        t_idx = tmodel.encode(torch.from_numpy(x), tmask)
    np.testing.assert_array_equal(np.asarray(j_idx), t_idx.numpy())

    for b, L in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(j_recon)[b, :L], t_recon.numpy()[b, :L],
            atol=5e-4, rtol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(j_post)[b, :L], t_post.numpy()[b, :L],
            atol=1e-3, rtol=2e-3,
        )
