"""Sequence-parallel decode: geometry invariants + numeric parity.

The claim under test (parallel/seqpar.py): decoding one long clip with its
time axis sharded over an N-device ``"seq"`` mesh — each device a halo'd
window, interior kept — EQUALS a full-length single-pass decode on every
frame, under the repo's padded-decode convention (masked positions are
those >= length; see tests/test_chunking.py for why the convention matters
at float tolerance). The reference has no distributed inference at all
(SURVEY §2.2); this is the net-new `sp` mesh axis.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mqgan_tpu.core.chunking import halo_align
from mqgan_tpu.parallel.seqpar import (
    plan_seq_decode,
    plan_seq_reencode,
    seq_mesh,
    seq_parallel_decode,
    seq_parallel_reencode,
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


@pytest.mark.parametrize("t,n", [
    (300, 8), (513, 8), (64, 8), (1024, 4), (300, 1), (7, 8),
])
def test_plan_geometry(t, n):
    plan = plan_seq_decode(t, n, (3, 5), 2)
    align = halo_align(2)
    assert plan.t_pad == plan.chunk * n >= t
    assert plan.chunk % align == 0
    assert plan.window <= plan.t_pad
    assert plan.window % align == 0
    # every window start the kernel can produce is pooling-grid aligned
    for i in range(n):
        s = min(max(i * plan.chunk - plan.halo_l, 0),
                plan.t_pad - plan.window)
        assert s % align == 0
        # the kept region always sits inside the window with full halos,
        # except where the clip itself starts/ends
        off = i * plan.chunk - s
        assert 0 <= off <= plan.window - plan.chunk


@pytest.fixture(scope="module")
def tiny_model():
    model = _tiny_preencoder()
    params = jax.jit(model.init)(
        jax.random.key(0),
        jnp.zeros((1, 16, 8), jnp.float32),
        jnp.full((1,), 16, jnp.int32),
    )
    return model, params


def _full_padded_decode(model, params, indices, lengths, t_pad):
    """Reference pass: same padded-decode convention as the SP windows."""
    b, t = indices.shape
    idx_full = np.zeros((b, t_pad), np.int32)
    idx_full[:, :t] = indices
    mask_full = np.arange(t_pad)[None, :] >= np.asarray(lengths)[:, None]

    def decode(idx, mask):
        return model.apply(params, idx, mask, method=type(model).decode)

    out = np.asarray(jax.jit(decode)(
        jnp.asarray(idx_full), jnp.asarray(mask_full)))
    return out[:, :t]


@pytest.mark.parametrize("t,lengths", [
    (300, (300, 300)),       # full-length rows
    (513, (513, 200)),       # ragged rows: mask crosses device boundaries
    (64, (64, 17)),          # short clip: windows degenerate to full decode
])
def test_seq_parallel_decode_matches_full(tiny_model, t, lengths):
    model, params = tiny_model
    mesh = seq_mesh()  # all 8 virtual CPU devices
    rng = np.random.default_rng(3)
    b = len(lengths)
    indices = np.asarray(rng.integers(0, 40, (b, t)), np.int32)
    lens = np.asarray(lengths, np.int32)

    sp = np.asarray(seq_parallel_decode(
        model, params, jnp.asarray(indices), jnp.asarray(lens), mesh))

    plan = plan_seq_decode(t, mesh.shape["seq"], (3, 5), 2)
    full = _full_padded_decode(model, params, indices, lens, plan.t_pad)

    # frames past a row's length are pad garbage in both — compare valid only
    for r in range(b):
        np.testing.assert_allclose(
            sp[r, : lens[r]], full[r, : lens[r]], atol=1e-5, rtol=1e-5)


def test_seq_parallel_single_device_degenerates_to_full(tiny_model):
    model, params = tiny_model
    mesh = seq_mesh(jax.devices()[:1])
    rng = np.random.default_rng(4)
    indices = np.asarray(rng.integers(0, 40, (1, 100)), np.int32)
    lens = np.asarray([100], np.int32)
    sp = np.asarray(seq_parallel_decode(
        model, params, jnp.asarray(indices), jnp.asarray(lens), mesh))
    plan = plan_seq_decode(100, 1, (3, 5), 2)
    full = _full_padded_decode(model, params, indices, lens, plan.t_pad)
    np.testing.assert_allclose(sp, full, atol=1e-5, rtol=1e-5)


def _full_padded_reencode(model, params, mel, lengths, t_pad,
                          with_recon=False):
    """Reference pass for the full pipeline, same padded convention."""
    b, t = mel.shape[0], mel.shape[1]
    x_full = np.zeros((b, t_pad, mel.shape[2]), np.float32)
    x_full[:, :t] = mel
    mask_full = np.arange(t_pad)[None, :] >= np.asarray(lengths)[:, None]

    def reenc(x, mask):
        idx = model.apply(params, x, mask, method=type(model).encode)
        if with_recon:
            post, recon = model.apply(params, idx, mask, False, True,
                                      method=type(model).decode)
            return idx, recon, post
        return idx, model.apply(params, idx, mask,
                                method=type(model).decode)

    outs = jax.jit(reenc)(jnp.asarray(x_full), jnp.asarray(mask_full))
    return tuple(np.asarray(o)[:, :t] for o in outs)


@pytest.mark.parametrize("t,lengths", [
    (512, (512, 512)),   # full rows
    (512, (512, 300)),   # ragged: one row's mask crosses device boundaries
])
def test_seq_parallel_reencode_matches_full_on_any_input(
        tiny_model, t, lengths):
    """Full encode+FSQ+decode pipeline sharded over time, ARBITRARY input:
    tokens EQUAL and mel ~1e-5 vs a single full-length pass. This is the
    strong claim (stronger than host-side chunked eval, which carries the
    CBAM window approximation): conv context comes from the composed
    generator_halos, and the encoder CBAM gates' global statistics are
    psum/pmax-reduced over interior frames across the seq mesh, so
    non-stationary inputs cannot perturb token choices."""
    model, params = tiny_model
    mesh = seq_mesh()  # all 8 virtual CPU devices
    n = mesh.shape["seq"]
    plan = plan_seq_reencode(t, n, (3, 5), 2)
    assert plan.window < plan.t_pad, "want the genuinely-windowed regime"

    rng = np.random.default_rng(11)
    b = len(lengths)
    # strongly non-stationary: a drifting mean + burst injected mid-clip,
    # exactly what breaks window-local CBAM statistics
    mel = rng.standard_normal((b, t, 8)).astype(np.float32)
    mel += np.linspace(-2.0, 2.0, t, dtype=np.float32)[None, :, None]
    mel[:, t // 3 : t // 3 + 40] += 4.0
    lens = np.asarray(lengths, np.int32)

    idx_sp, out_sp = seq_parallel_reencode(
        model, params, jnp.asarray(mel), jnp.asarray(lens), mesh)
    idx_full, out_full = _full_padded_reencode(
        model, params, mel, lens, plan.t_pad)

    for r in range(b):
        np.testing.assert_array_equal(
            np.asarray(idx_sp)[r, : lens[r]], idx_full[r, : lens[r]])
        np.testing.assert_allclose(
            np.asarray(out_sp)[r, : lens[r]], out_full[r, : lens[r]],
            atol=1e-5, rtol=1e-5)


def test_seq_parallel_reencode_degenerate_windows_exact_on_any_input(
        tiny_model):
    """Short clip: every window covers the whole padded clip, so even the
    CBAM stats are the full-pass stats — parity must hold for arbitrary
    (non-periodic) input, ragged lengths included."""
    model, params = tiny_model
    mesh = seq_mesh()
    n = mesh.shape["seq"]
    t = 96
    plan = plan_seq_reencode(t, n, (3, 5), 2)
    assert plan.window == plan.t_pad, "windows must degenerate to full"

    rng = np.random.default_rng(12)
    mel = rng.standard_normal((2, t, 8)).astype(np.float32)
    lens = np.asarray([t, 50], np.int32)

    # return_recon: the pre-refiner x_recon rides the same dispatch
    # (full-length exact eval consumes both)
    idx_sp, pre_sp, out_sp = seq_parallel_reencode(
        model, params, jnp.asarray(mel), jnp.asarray(lens), mesh,
        return_recon=True)
    idx_full, pre_full, out_full = _full_padded_reencode(
        model, params, mel, lens, plan.t_pad, with_recon=True)

    for r in range(2):
        np.testing.assert_array_equal(
            np.asarray(idx_sp)[r, : lens[r]], idx_full[r, : lens[r]])
        np.testing.assert_allclose(
            np.asarray(pre_sp)[r, : lens[r]], pre_full[r, : lens[r]],
            atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out_sp)[r, : lens[r]], out_full[r, : lens[r]],
            atol=1e-5, rtol=1e-5)


def test_seq_parallel_output_is_time_sharded(tiny_model):
    """The win being claimed: the (B, T, mel) output lives sharded over the
    seq axis — per-device memory is ~T/N — not gathered to one device."""
    model, params = tiny_model
    mesh = seq_mesh()
    indices = jnp.zeros((1, 512), jnp.int32)
    lens = jnp.asarray([512], jnp.int32)
    out = seq_parallel_decode(model, params, indices, lens, mesh)
    shard_ts = {s.data.shape[1] for s in out.addressable_shards}
    assert len(out.addressable_shards) == 8
    assert max(shard_ts) < 512
