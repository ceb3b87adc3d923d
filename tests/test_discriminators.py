import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mqgan_tpu.models.discriminators import (
    MelSpectrogramPatchDiscriminator2D,
    MultiBinDiscriminator,
    _maxpool2d_ceil_bool,
)
from tests.reference_loader import load_reference_modules


def test_maxpool_ceil_matches_torch(rng):
    m = rng.random((2, 13, 29)) > 0.5
    for sh, sw in [(2, 2), (1, 2), (2, 1), (3, 2)]:
        got = np.asarray(_maxpool2d_ceil_bool(jnp.asarray(m), sh, sw))
        want = (
            torch.nn.functional.max_pool2d(
                torch.from_numpy(m).float().unsqueeze(1),
                kernel_size=(sh, sw), stride=(sh, sw), ceil_mode=True,
            )
            .bool()
            .squeeze(1)
            .numpy()
        )
        np.testing.assert_array_equal(got, want)


@pytest.fixture(scope="module")
def ref_mods():
    return load_reference_modules()


def test_patch_discriminator_shapes_match_reference(rng, ref_mods):
    """Same config => same logits/mask/features shapes as the reference
    (values differ: independent init + different spectral-norm matricization)."""
    *_, ref_disc = ref_mods
    mel, tlen = 16, 32
    hidden = (8, 12)
    ks = (5, 3, 3)
    strides = ((1, 2), (2, 2), (2, 1))

    x = rng.standard_normal((2, tlen, mel)).astype(np.float32)
    lengths = np.array([25, 32], np.int32)

    tdisc = ref_disc.MelSpectrogramPatchDiscriminator2D(
        mel_channels=mel, hidden_channels=list(hidden), kernel_sizes=list(ks),
        stride=[list(s) for s in strides],
    )
    tdisc.eval()
    with torch.no_grad():
        t_logits, t_mask, t_feats = tdisc(
            torch.from_numpy(x), torch.from_numpy(lengths), return_features=True
        )

    ours = MelSpectrogramPatchDiscriminator2D(
        mel_channels=mel, hidden_channels=hidden, kernel_sizes=ks, strides=strides
    )
    variables = ours.init(
        jax.random.key(0), jnp.asarray(x), jnp.asarray(lengths), True
    )
    j_logits, j_mask, j_feats = ours.apply(
        variables, jnp.asarray(x), jnp.asarray(lengths), True
    )

    # torch (B, 1, H, W) vs ours (B, H, W, 1)
    assert t_logits.shape == (2, 1, j_logits.shape[1], j_logits.shape[2])
    assert j_logits.shape[-1] == 1
    # valid-mask semantics identical
    np.testing.assert_array_equal(
        np.asarray(j_mask), t_mask.squeeze(1).numpy()
    )
    # features skip layers 0, 1, last
    assert len(j_feats) == len(t_feats) == len(hidden) + 1 - 3
    for (jf, jm), (tf, tm) in zip(j_feats, t_feats):
        assert tf.shape == (2, jf.shape[-1], jf.shape[1], jf.shape[2])
        np.testing.assert_array_equal(np.asarray(jm), tm.squeeze(1).numpy())


def test_patch_discriminator_mask_zeroing(rng):
    mel, tlen = 8, 16
    x = rng.standard_normal((2, tlen, mel)).astype(np.float32)
    lengths = np.array([9, 16], np.int32)
    ours = MelSpectrogramPatchDiscriminator2D(
        mel_channels=mel, hidden_channels=(4, 4), kernel_sizes=(3, 3, 3),
        strides=((1, 2), (2, 2), (1, 1)),
    )
    v = ours.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(lengths))
    logits, mask = ours.apply(v, jnp.asarray(x), jnp.asarray(lengths))
    # fully padded patches have zero logits
    pad = ~np.asarray(mask)
    assert np.abs(np.asarray(logits)[..., 0][pad]).max() == 0.0
    # changing padded input content doesn't change valid logits
    x2 = x.copy()
    x2[0, 9:] = 77.0
    logits2, _ = ours.apply(v, jnp.asarray(x2), jnp.asarray(lengths))
    valid = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(logits2)[..., 0][valid], np.asarray(logits)[..., 0][valid],
        atol=1e-5,
    )


def test_multibin_shapes(rng):
    mel, tlen, n_bins = 16, 32, 4
    x = rng.standard_normal((2, tlen, mel)).astype(np.float32)
    lengths = np.array([20, 32], np.int32)
    ours = MultiBinDiscriminator(
        mel_channels=mel, n_bins=n_bins, hidden_channels=(4, 8),
        kernel_sizes=(5, 3, 3), n_no_strides=2,
    )
    v = ours.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(lengths), True)
    outs, masks, feats = ours.apply(
        v, jnp.asarray(x), jnp.asarray(lengths), True
    )
    assert len(outs) == len(masks) == len(feats) == n_bins
    # n_no_strides=2 covers the first two layers and the final logits conv
    # is always stride (1,1) (reference discriminators.py:161-167), so with
    # 3 layers T and F are never reduced here.
    assert outs[0].shape == (2, mel // n_bins, tlen, 1)
    # spectral-norm power-iteration state exists
    assert "batch_stats" in v


def test_spectral_norm_updates_stats(rng):
    mel, tlen = 8, 16
    x = rng.standard_normal((1, tlen, mel)).astype(np.float32)
    lengths = np.array([16], np.int32)
    ours = MelSpectrogramPatchDiscriminator2D(
        mel_channels=mel, hidden_channels=(4,), kernel_sizes=(3, 3),
        strides=((1, 1), (1, 1)),
    )
    v = ours.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(lengths))
    out1, _ = ours.apply(v, jnp.asarray(x), jnp.asarray(lengths))
    # update_stats=True mutates batch_stats (power iteration step)
    (out2, _), updates = ours.apply(
        v, jnp.asarray(x), jnp.asarray(lengths), False, True,
        mutable=["batch_stats"],
    )
    leaves_before = jax.tree_util.tree_leaves(v["batch_stats"])
    leaves_after = jax.tree_util.tree_leaves(updates["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves_before, leaves_after)
    )
    assert changed


def test_patch_discriminator_logit_parity(rng, ref_mods):
    """Import reference spectral-norm weights + eval-mode sigma and match
    the reference logits numerically (discriminators.py:196-242)."""
    from mqgan_tpu.utils.torch_import import import_patch_discriminator_params

    *_, ref_disc = ref_mods
    mel, tlen = 16, 32
    hidden = (8, 12)
    ks = (5, 3, 3)
    strides = ((1, 2), (2, 2), (2, 1))

    x = rng.standard_normal((2, tlen, mel)).astype(np.float32)
    lengths = np.array([25, 32], np.int32)

    torch.manual_seed(3)
    tdisc = ref_disc.MelSpectrogramPatchDiscriminator2D(
        mel_channels=mel, hidden_channels=list(hidden), kernel_sizes=list(ks),
        stride=[list(s) for s in strides],
    )
    # converge torch's power iteration (one step per train-mode forward),
    # as a trained checkpoint would be; see _sn_conv docstring
    tdisc.train()
    with torch.no_grad():
        for _ in range(100):
            tdisc(torch.from_numpy(x), torch.from_numpy(lengths))
    tdisc.eval()
    with torch.no_grad():
        t_logits, t_mask = tdisc(torch.from_numpy(x), torch.from_numpy(lengths))

    params, stats = import_patch_discriminator_params(tdisc.state_dict())
    ours = MelSpectrogramPatchDiscriminator2D(
        mel_channels=mel, hidden_channels=hidden, kernel_sizes=ks, strides=strides
    )
    j_logits, j_mask = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x), jnp.asarray(lengths),
    )
    np.testing.assert_array_equal(np.asarray(j_mask), t_mask.squeeze(1).numpy())
    np.testing.assert_allclose(
        np.asarray(j_logits)[..., 0], t_logits.squeeze(1).numpy(),
        atol=2e-5, rtol=1e-4,
    )


def test_multibin_discriminator_logit_parity(rng, ref_mods):
    from mqgan_tpu.utils.torch_import import import_multibin_discriminator_params

    *_, ref_disc = ref_mods
    mel, tlen, n_bins = 16, 32, 2
    x = rng.standard_normal((2, tlen, mel)).astype(np.float32)
    lengths = np.array([20, 32], np.int32)

    torch.manual_seed(4)
    tdisc = ref_disc.MultiBinDiscriminator(
        mel_channels=mel, n_bins=n_bins, hidden_channels=[4, 8],
        kernel_sizes=[5, 3, 3], n_no_strides=2,
    )
    tdisc.train()
    with torch.no_grad():
        for _ in range(100):
            tdisc(torch.from_numpy(x), torch.from_numpy(lengths))
    tdisc.eval()
    with torch.no_grad():
        t_outs, t_masks = tdisc(torch.from_numpy(x), torch.from_numpy(lengths))

    params, stats = import_multibin_discriminator_params(
        tdisc.state_dict(), n_bins=n_bins)
    ours = MultiBinDiscriminator(
        mel_channels=mel, n_bins=n_bins, hidden_channels=(4, 8),
        kernel_sizes=(5, 3, 3), n_no_strides=2,
    )
    j_outs, j_masks = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x), jnp.asarray(lengths),
    )
    assert len(j_outs) == n_bins
    for jo, jm, to, tm in zip(j_outs, j_masks, t_outs, t_masks):
        np.testing.assert_array_equal(np.asarray(jm), tm.squeeze(1).numpy())
        np.testing.assert_allclose(
            np.asarray(jo)[..., 0], to.squeeze(1).numpy(),
            atol=2e-5, rtol=1e-4,
        )
