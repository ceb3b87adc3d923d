"""Overlap-chunked eval: halo math + numeric parity vs full-length passes.

The reference evaluates full-length sequences in ONE pass
(/root/reference/train.py:585-599); we chunk to keep static shapes
(core/chunking.py). These tests pin the claims:

* chunk_plan tiles exactly, stays aligned, and respects the window bound;
* refiner_halo / decoder_halos make windowed passes numerically EQUAL to
  full passes on kept frames (the decode side is fully time-local);
* generator_halos composes the encoder receptive field on top, making the
  WHOLE encode+decode pipeline chunk-exact whenever the encoder's global
  CBAM statistics agree between windows — enforced here with a
  period-aligned input, isolating the receptive-field math from the
  documented CBAM window approximation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mqgan_tpu.core.chunking import (
    chunk_plan,
    decoder_halos,
    generator_halos,
    refiner_halo,
)


def _check_plan(spans, t, window, halo_l, halo_r, align):
    # keep regions tile [0, t) exactly
    assert spans[0].keep_lo == 0 and spans[-1].keep_hi == t
    for a, b in zip(spans, spans[1:]):
        assert a.keep_hi == b.keep_lo
    for s in spans:
        assert s.start <= s.keep_lo < s.keep_hi <= s.stop
        assert s.stop - s.start <= window
        assert s.start % align == 0
        # every kept frame has its halo inside the window except where the
        # clip itself starts/ends
        assert s.keep_lo - s.start >= halo_l or s.start == 0
        assert s.stop - s.keep_hi >= halo_r or s.stop == t


@pytest.mark.parametrize("t,window,halo_l,halo_r,align", [
    (1100, 512, 96, 72, 8),
    (513, 512, 96, 72, 8),
    (4097, 512, 200, 104, 8),
    (300, 128, 48, 36, 4),
    (2048, 256, 8, 8, 8),
])
def test_chunk_plan_invariants(t, window, halo_l, halo_r, align):
    spans = chunk_plan(t, window, halo_l, halo_r, align=align)
    _check_plan(spans, t, window, halo_l, halo_r, align)


def test_chunk_plan_short_clip_is_single_span():
    (s,) = chunk_plan(100, 512, 96, 72)
    assert (s.start, s.stop, s.keep_lo, s.keep_hi) == (0, 100, 0, 100)


def test_chunk_plan_rejects_impossible_window():
    with pytest.raises(ValueError):
        chunk_plan(1000, 128, 96, 72)


def test_chunk_plan_nonstrict_shrinks_halos_to_fit():
    """strict=False degrades gracefully for small exported bucket sets:
    halos shrink proportionally (align multiples), coverage invariants
    hold, and some overlap context is retained when possible."""
    spans = chunk_plan(150, 64, 44, 40, align=4, strict=False)
    _check_plan(spans, 150, 64, 0, 0, 4)
    # interior windows still carry (shrunken) context on both sides
    mid = spans[len(spans) // 2]
    assert mid.keep_lo - mid.start > 0 and mid.stop - mid.keep_hi > 0


def test_refiner_halo_windowed_pass_is_exact():
    """A windowed UNetRefiner pass with refiner_halo() context equals the
    full pass on kept frames: the refiner is pure convs/pools (no global
    pooling), so the halo bound is checkable to float precision."""
    from mqgan_tpu.nn.unet import UNetRefiner

    depth, t, f = 3, 384, 6
    model = UNetRefiner(base_ch=8, depth=depth, dropout=0.0, out_features=f)
    x = np.asarray(
        np.random.default_rng(0).standard_normal((1, t, f + 1)), np.float32)
    params = jax.jit(model.init)(jax.random.key(1), jnp.asarray(x))
    full = np.asarray(jax.jit(model.apply)(params, jnp.asarray(x)))

    h = refiner_halo(depth)
    window = 160
    apply = jax.jit(model.apply)
    for s in chunk_plan(t, window, h, h, align=2 ** depth):
        out = np.asarray(apply(params, jnp.asarray(x[:, s.start: s.stop])))
        np.testing.assert_allclose(
            out[:, s.local_lo: s.local_hi],
            full[:, s.keep_lo: s.keep_hi],
            atol=1e-5, rtol=1e-5,
        )


def _tiny_preencoder():
    from mqgan_tpu.models.preencoder import PreEncoder

    return PreEncoder(
        mel_channels=8,
        channels=(16, 16, 24),
        kernel_sizes=(3, 5),
        fsq_levels=(8, 5),
        dropout=0.0,
        refiner_base_channels=8,
        refiner_depth=2,
        refiner_hidden_proj_divisor=8,
    )


def test_decoder_halos_chunked_decode_is_exact():
    """Chunked token->mel decode with decoder_halos() equals full-length
    decode to ~1e-5 (VERDICT r2 #5 'done' criterion): the whole decode
    side — causal trunk (CBAM dropped), 5x5 post mixer, refiner — is
    time-local."""
    model = _tiny_preencoder()
    t = 300
    rng = np.random.default_rng(2)
    indices = np.asarray(rng.integers(0, 40, (1, t)), np.int32)
    params = jax.jit(model.init)(
        jax.random.key(0),
        jnp.zeros((1, 16, 8), jnp.float32),
        jnp.full((1,), 16, jnp.int32),
    )

    def decode(idx, mask):
        return model.apply(params, idx, mask, method=type(model).decode)

    decode = jax.jit(decode)
    # reference pass uses the same right-pad-with-mask convention as the
    # windows: masked positions carry act(bias) garbage BETWEEN a block's
    # conv1/conv2 (re-zeroed only at block output), which differs from the
    # implicit SAME zero-padding of an exact-length array in the last
    # ~refiner-halo frames (~2e-3; same intra-block semantics as the
    # reference). Matching conventions isolates the halo math under test.
    t_pad = t + 32
    idx_full = np.zeros((1, t_pad), np.int32)
    idx_full[:, :t] = indices
    mask_full = np.arange(t_pad)[None, :] >= t
    full = np.asarray(
        decode(jnp.asarray(idx_full), jnp.asarray(mask_full)))[:, :t]

    halo_l, halo_r = decoder_halos((3, 5), 2)
    window = 128
    out = np.zeros_like(full)
    for s in chunk_plan(t, window, halo_l, halo_r, align=4):
        w = s.stop - s.start
        idx_w = np.zeros((1, window), np.int32)
        idx_w[:, :w] = indices[:, s.start: s.stop]
        mask_w = np.arange(window)[None, :] >= w
        seg = np.asarray(decode(jnp.asarray(idx_w), jnp.asarray(mask_w)))
        out[:, s.keep_lo: s.keep_hi] = seg[:, s.local_lo: s.local_hi]

    np.testing.assert_allclose(out, full, atol=1e-5, rtol=1e-5)


def test_generator_halos_full_pipeline_chunk_exact_on_aligned_stats():
    """Whole encode+decode pipeline: chunked == full to ~1e-5 when every
    window sees identical global CBAM statistics. The input is periodic
    with period 4 and every window's real span is whole periods (window
    starts/stops are align=4 multiples), so the encoder's masked
    mean/max pooling agrees exactly between windows and the full pass —
    any residual difference would be a receptive-field (halo) bug,
    e.g. dropping the encoder span from the composition."""
    model = _tiny_preencoder()
    t = 512
    rng = np.random.default_rng(3)
    base = rng.standard_normal((4, 8)).astype(np.float32)
    mel = np.tile(base, (t // 4, 1))[None]  # (1, t, 8), period 4

    params = jax.jit(model.init)(
        jax.random.key(0),
        jnp.zeros((1, 16, 8), jnp.float32),
        jnp.full((1,), 16, jnp.int32),
    )

    def reencode(x, mask):
        idx = model.apply(params, x, mask, method=type(model).encode)
        out = model.apply(params, idx, mask, method=type(model).decode)
        return idx, out

    reencode = jax.jit(reencode)
    # same right-pad-with-mask convention as the windows (see the decode
    # test); pad is a whole number of periods so CBAM stats are unchanged
    t_pad = t + 32
    mel_full = np.zeros((1, t_pad, 8), np.float32)
    mel_full[:, :t] = mel
    mask_full = np.arange(t_pad)[None, :] >= t
    idx_full, full = (np.asarray(o)[:, :t] for o in reencode(
        jnp.asarray(mel_full), jnp.asarray(mask_full)))

    halo_l, halo_r = generator_halos((3, 5), 2)
    window = 256
    assert window % 4 == 0 and halo_l % 4 == 0 and halo_r % 4 == 0
    out = np.zeros_like(full)
    idx_out = np.zeros_like(idx_full)
    for s in chunk_plan(t, window, halo_l, halo_r, align=4):
        w = s.stop - s.start
        assert s.start % 4 == 0 and s.stop % 4 == 0  # whole periods
        x_w = np.zeros((1, window, 8), np.float32)
        x_w[:, :w] = mel[:, s.start: s.stop]
        mask_w = np.arange(window)[None, :] >= w
        idx_w, seg = (np.asarray(o) for o in reencode(
            jnp.asarray(x_w), jnp.asarray(mask_w)))
        out[:, s.keep_lo: s.keep_hi] = seg[:, s.local_lo: s.local_hi]
        idx_out[:, s.keep_lo: s.keep_hi] = idx_w[:, s.local_lo: s.local_hi]

    np.testing.assert_array_equal(idx_out, idx_full)
    np.testing.assert_allclose(out, full, atol=1e-5, rtol=1e-5)
