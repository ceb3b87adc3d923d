"""Pallas kernels: interpret-mode parity vs the XLA reference paths.

(Hardware benchmarks live outside the test suite; on the TPU chip the XLA
rfft path measured faster than the matmul-DFT kernel — 39 ms vs 68 ms for
8x5 s at the flagship config — so XLA stays the default. These tests pin
correctness of both kernels.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mqgan_tpu.core.config import SpectrogramConfig
from mqgan_tpu.ops.fsq_kernels import FSQEncodeHead
from mqgan_tpu.ops.stft_kernels import PallasMelFrontend, dft_mel_tables
from mqgan_tpu.quant.fsq import FSQSpec, codes_to_indices, quantize
from mqgan_tpu.signal.mel import MelFrontend


@pytest.fixture(scope="module")
def spec_cfg():
    return SpectrogramConfig(
        sampling_rate=16000, filter_length=512, hop_length=128,
        win_length=512, n_mel_channels=80, mel_fmin=0.0, mel_fmax=8000.0,
    )


def test_pallas_mel_matches_xla(spec_cfg, rng):
    wav = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32) * 0.3)
    ref = np.asarray(MelFrontend(spec_cfg)(wav))
    pal = np.asarray(PallasMelFrontend(spec_cfg, interpret=True)(wav))
    assert pal.shape == ref.shape
    np.testing.assert_allclose(pal, ref, atol=5e-4)


def test_dft_tables_shapes(spec_cfg):
    cos, sin, fbank = dft_mel_tables(spec_cfg)
    assert cos.shape == (512, 384)  # 257 -> padded to 384
    assert sin.shape == (512, 384)
    assert fbank.shape == (384, 128)  # 80 -> padded to 128
    # padding region is exactly zero so the reduction is exact
    assert float(jnp.abs(cos[:, 257:]).max()) == 0.0
    assert float(jnp.abs(fbank[257:, :]).max()) == 0.0
    assert float(jnp.abs(fbank[:, 80:]).max()) == 0.0


def test_fsq_encode_head_matches_reference_path(rng):
    spec = FSQSpec(levels=(8, 5, 5, 5))
    c = 96
    kernel = rng.standard_normal((c, 4)).astype(np.float32) * 0.3
    bias = rng.standard_normal((4,)).astype(np.float32) * 0.1
    h = rng.standard_normal((3, 70, c)).astype(np.float32)

    head = FSQEncodeHead(kernel, bias, spec, interpret=True)
    got = np.asarray(head(jnp.asarray(h)))

    z = h @ kernel + bias
    want = np.asarray(codes_to_indices(quantize(jnp.asarray(z), spec), spec))
    np.testing.assert_array_equal(got, want)
    assert got.min() >= 0 and got.max() < spec.codebook_size


def test_fsq_encode_head_odd_sizes(rng):
    """Non-multiple-of-tile N exercises the pad/trim path."""
    spec = FSQSpec(levels=(8, 5, 5, 5))
    kernel = rng.standard_normal((32, 4)).astype(np.float32)
    bias = np.zeros(4, np.float32)
    h = rng.standard_normal((1, 13, 32)).astype(np.float32)
    head = FSQEncodeHead(kernel, bias, spec, interpret=True)
    got = np.asarray(head(jnp.asarray(h)))
    z = h @ kernel
    want = np.asarray(codes_to_indices(quantize(jnp.asarray(z), spec), spec))
    np.testing.assert_array_equal(got, want)


# --- fused ResidualBlock1D (ops/block_kernels.py) ---------------------------

from mqgan_tpu.core.masking import sequence_mask
from mqgan_tpu.nn.blocks import ResidualBlock1D


@pytest.mark.parametrize(
    "cin,cout,k,causal",
    [(128, 128, 3, False), (128, 256, 5, False),
     (256, 128, 7, True), (128, 128, 3, True)],
)
def test_fused_block_matches_xla(rng, cin, cout, k, causal):
    """Whole-block Pallas fusion == XLA path (fp32, ragged lengths)."""
    b, t = 3, 37
    x = jnp.asarray(rng.standard_normal((b, t, cin)).astype(np.float32))
    mask = sequence_mask(t, jnp.asarray([t, 20, 1], jnp.int32))
    kw = dict(kernel_size=k, act="taptx", causal=causal, norm="weight")
    blk = ResidualBlock1D(cin, cout, **kw)
    params = blk.init(jax.random.PRNGKey(0), x, mask, True)
    ref = blk.apply(params, x, mask, True)

    fused = ResidualBlock1D(cin, cout, fused=True, **kw)
    got = fused.apply(params, x, mask, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    # identical param trees: the flag can flip on a trained checkpoint
    p2 = fused.init(jax.random.PRNGKey(0), x, mask, True)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))


def test_fused_block_unsupported_config_falls_back(rng):
    """Non-weight norm silently uses the XLA path (still correct)."""
    b, t, c = 2, 16, 128
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    mask = sequence_mask(t, jnp.asarray([t, 9], jnp.int32))
    kw = dict(kernel_size=3, act="taptx", causal=False, norm="layer")
    blk = ResidualBlock1D(c, c, **kw)
    params = blk.init(jax.random.PRNGKey(0), x, mask, True)
    got = ResidualBlock1D(c, c, fused=True, **kw).apply(params, x, mask, True)
    ref = blk.apply(params, x, mask, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref))


def test_fused_block_no_mask_and_bf16(rng):
    """pad_mask=None and bf16 compute both work through the fused path."""
    b, t, c = 2, 24, 128
    x32 = rng.standard_normal((b, t, c)).astype(np.float32)
    kw = dict(kernel_size=3, act="taptx", causal=False, norm="weight",
              dtype=jnp.bfloat16)
    blk = ResidualBlock1D(c, c, **kw)
    params = blk.init(jax.random.PRNGKey(0), jnp.asarray(x32), None, True)
    ref = blk.apply(params, jnp.asarray(x32), None, True)
    got = ResidualBlock1D(c, c, fused=True, **kw).apply(
        params, jnp.asarray(x32), None, True)
    assert got.dtype == ref.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.1, rtol=0.1)
