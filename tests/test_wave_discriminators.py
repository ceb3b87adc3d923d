"""Waveform discriminators (MPD/MSD) + adversarial vocoder losses."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mqgan_tpu.models.wave_discriminators import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    adversarial_d_loss,
    adversarial_g_loss,
    feature_matching_loss,
)

T = 400


@pytest.fixture(scope="module")
def discs():
    mpd = MultiPeriodDiscriminator(periods=(2, 3))
    msd = MultiScaleDiscriminator(n_scales=2)
    wav = jnp.zeros((2, T))
    mpd_p = mpd.init(jax.random.key(0), wav)
    msd_p = msd.init(jax.random.key(1), wav)
    return mpd, mpd_p, msd, msd_p


def test_mpd_shapes(discs, rng):
    mpd, mpd_p, *_ = discs
    wav = jnp.asarray(rng.standard_normal((2, T)).astype(np.float32))
    outs, fmaps = mpd.apply(mpd_p, wav)
    assert len(outs) == 2 and len(fmaps) == 2
    for o, f in zip(outs, fmaps):
        assert o.ndim == 4 and o.shape[0] == 2 and o.shape[-1] == 1
        assert len(f) >= 5
        assert np.isfinite(np.asarray(o)).all()
    # non-divisible lengths handled via reflect padding (T=400, p=3)


def test_msd_shapes(discs, rng):
    *_, msd, msd_p = discs
    wav = jnp.asarray(rng.standard_normal((2, T)).astype(np.float32))
    outs, fmaps = msd.apply(msd_p, wav)
    assert len(outs) == 2
    for o in outs:
        assert o.shape[0] == 2 and o.shape[-1] == 1
        assert np.isfinite(np.asarray(o)).all()


def test_adversarial_losses(discs, rng):
    mpd, mpd_p, msd, msd_p = discs
    real = jnp.asarray(rng.standard_normal((2, T)).astype(np.float32))
    fake = jnp.asarray(rng.standard_normal((2, T)).astype(np.float32))

    r_out, r_f = mpd.apply(mpd_p, real)
    f_out, f_f = mpd.apply(mpd_p, fake)
    rs_out, rs_f = msd.apply(msd_p, real)
    fs_out, fs_f = msd.apply(msd_p, fake)

    d_loss = adversarial_d_loss([r_out, rs_out], [f_out, fs_out])
    g_loss = adversarial_g_loss([f_out, fs_out])
    fm = feature_matching_loss([*r_f, *rs_f], [*f_f, *fs_f])
    for v in (d_loss, g_loss, fm):
        assert np.isfinite(float(v)) and float(v) > 0

    # gradient flows into the fake waveform through every term
    def g_obj(w):
        fo, ff = mpd.apply(mpd_p, w)
        fo2, ff2 = msd.apply(msd_p, w)
        return (adversarial_g_loss([fo, fo2])
                + feature_matching_loss([*r_f, *rs_f], [*ff, *ff2]))

    g = jax.grad(g_obj)(fake)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0

    # perfect discriminator outputs => zero-ish losses
    ones = [jnp.ones_like(o) for o in f_out]
    zeros = [jnp.zeros_like(o) for o in f_out]
    assert float(adversarial_g_loss([ones])) < 1e-6
    assert float(adversarial_d_loss([ones], [zeros])) < 1e-6
