"""Loss parity against the reference losses.py / train.py implementations."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from mqgan_tpu.losses.gan import (
    LeCamState,
    discriminator_loss,
    generator_loss,
)
from mqgan_tpu.losses.recon import masked_mae, masked_mel_loss
from tests.reference_loader import load_reference_modules


@pytest.fixture(scope="module")
def ref_losses():
    _, _, _, losses, _ = load_reference_modules()
    return losses


def test_generator_loss_matches_reference(rng, ref_losses):
    fake = rng.standard_normal((2, 4, 6, 1)).astype(np.float32)
    mask = rng.random((2, 4, 6, 1)) > 0.3  # True=valid

    tl = ref_losses.LSGANLoss()
    want = tl.generator_loss(
        torch.from_numpy(fake), torch.from_numpy(mask)
    ).item()
    got = float(generator_loss(jnp.asarray(fake), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_discriminator_loss_and_lecam_sequence(rng, ref_losses):
    """Run 3 sequential D-loss calls; EMA state must evolve identically
    (reference losses.py:84-108: update_ema then lecam on updated EMAs)."""
    tl = ref_losses.LSGANLoss()
    state = LeCamState.create()

    for i in range(3):
        real = rng.standard_normal((2, 4, 5, 1)).astype(np.float32) + 0.5
        fake = rng.standard_normal((2, 4, 5, 1)).astype(np.float32) - 0.5
        rmask = rng.random((2, 4, 5, 1)) > 0.2
        fmask = rng.random((2, 4, 5, 1)) > 0.2

        want = tl.discriminator_loss(
            torch.from_numpy(real), torch.from_numpy(fake),
            torch.from_numpy(rmask), torch.from_numpy(fmask),
        ).item()
        got, state = discriminator_loss(
            jnp.asarray(real), jnp.asarray(fake),
            jnp.asarray(rmask), jnp.asarray(fmask), state=state,
        )
        np.testing.assert_allclose(float(got), want, rtol=1e-4), f"step {i}"
        np.testing.assert_allclose(
            float(state.ema_real), tl.ema_real.item(), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(state.ema_fake), tl.ema_fake.item(), rtol=1e-5
        )


def test_discriminator_loss_no_lecam(rng, ref_losses):
    tl = ref_losses.LSGANLoss(use_lecam=False)
    real = rng.standard_normal((2, 3, 4, 1)).astype(np.float32)
    fake = rng.standard_normal((2, 3, 4, 1)).astype(np.float32)
    want = tl.discriminator_loss(
        torch.from_numpy(real), torch.from_numpy(fake), None, None
    ).item()
    got, _ = discriminator_loss(
        jnp.asarray(real), jnp.asarray(fake), None, None,
        state=LeCamState.create(), use_lecam=False,
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


@pytest.mark.parametrize("loss_type,group", [("mse", 1), ("mse", 4), ("charbonnier", 4)])
def test_masked_mel_loss_matches_reference(rng, ref_losses, loss_type, group):
    x = rng.standard_normal((3, 10, 8)).astype(np.float32)
    y = rng.standard_normal((3, 10, 8)).astype(np.float32)
    lengths = np.array([6, 10, 3], np.int64)

    tl = ref_losses.MaskedMelLoss(loss_type, group_size=group)
    want = tl(
        torch.from_numpy(x), torch.from_numpy(y), torch.from_numpy(lengths)
    ).item()
    got = float(
        masked_mel_loss(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(lengths),
            loss_type=loss_type, group_size=group,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_masked_mae_matches_reference(rng):
    """reference train.py:38-45."""
    pred = rng.standard_normal((2, 6, 5, 3)).astype(np.float32)
    target = rng.standard_normal((2, 6, 5, 3)).astype(np.float32)
    pad = rng.random((2, 6, 5)) > 0.6  # True=pad

    tp = torch.from_numpy(pred)
    tt = torch.from_numpy(target)
    tm = torch.from_numpy(pad).unsqueeze(-1).expand_as(tp)
    diff = (tp - tt).abs().masked_fill(tm, 0.0)
    want = (diff.sum() / ((~tm).sum() + 1e-8)).item()

    got = float(masked_mae(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(pad)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
