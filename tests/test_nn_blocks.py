import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mqgan_tpu.core.masking import sequence_mask
from mqgan_tpu.nn.activations import APTx, aptx
from mqgan_tpu.nn.attention import CBAM1D
from mqgan_tpu.nn.blocks import ResidualBlock1D
from mqgan_tpu.nn.conv import WNConv, conv1d, fold_weight_norm
from mqgan_tpu.nn.mixer2d import MelMixer2D
from mqgan_tpu.nn.norm import InstanceNorm1d
from mqgan_tpu.nn.pooling import (
    causal_masked_avg_pool,
    causal_masked_max_pool,
    masked_avg_pool,
    masked_max_pool,
)
from mqgan_tpu.nn.se import ChannelSELayerMasked
from mqgan_tpu.nn.unet import UNetRefiner


def test_aptx_matches_reference_formula(rng):
    x = rng.standard_normal((4, 8)).astype(np.float32)
    # (alpha + tanh(beta x)) * gamma * x (reference attentions.py:35)
    want = (1.0 + np.tanh(1.0 * x)) * 0.5 * x
    np.testing.assert_allclose(np.asarray(aptx(jnp.asarray(x))), want, atol=1e-6)

    mod = APTx(trainable=True)
    params = mod.init(jax.random.key(0), jnp.asarray(x))
    assert float(params["params"]["beta"]) == 1.0
    assert float(params["params"]["gamma"]) == 0.5
    out = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)


def test_wnconv_matches_torch_conv1d(rng):
    """Same weights => same outputs as torch Conv1d with padding='same'."""
    k, cin, cout = 5, 8, 16
    x = rng.standard_normal((2, 32, cin)).astype(np.float32)
    mod = conv1d(cout, k, use_weight_norm=False)
    params = mod.init(jax.random.key(0), jnp.asarray(x))
    kernel = np.asarray(params["params"]["kernel"])  # (K, I, O)
    bias = np.asarray(params["params"]["bias"])

    tconv = torch.nn.Conv1d(cin, cout, k, padding="same")
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(kernel.transpose(2, 1, 0)))
        tconv.bias.copy_(torch.from_numpy(bias))
    want = tconv(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy().transpose(0, 2, 1)

    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_weight_norm_init_and_fold(rng):
    x = rng.standard_normal((1, 16, 4)).astype(np.float32)
    mod = conv1d(8, 3, use_weight_norm=True)
    params = mod.init(jax.random.key(0), jnp.asarray(x))
    v = np.asarray(params["params"]["v"])
    g = np.asarray(params["params"]["g"])
    # g init == ||v|| per out channel -> effective kernel == v at init
    np.testing.assert_allclose(g, np.sqrt((v ** 2).sum(axis=(0, 1))), rtol=1e-6)

    out_wn = mod.apply(params, jnp.asarray(x))

    folded = fold_weight_norm(params["params"])
    assert "kernel" in folded and "v" not in folded
    plain = conv1d(8, 3, use_weight_norm=False)
    out_folded = plain.apply({"params": folded}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_wn), np.asarray(out_folded), atol=1e-6)


def test_causal_conv_no_future_leakage(rng):
    x = rng.standard_normal((1, 20, 4)).astype(np.float32)
    mod = conv1d(4, 5, dilation=2, causal=True)
    params = mod.init(jax.random.key(0), jnp.asarray(x))
    base = np.asarray(mod.apply(params, jnp.asarray(x)))
    # perturb the future: outputs at t <= 9 must not change
    x2 = x.copy()
    x2[:, 10:] += 100.0
    out2 = np.asarray(mod.apply(params, jnp.asarray(x2)))
    np.testing.assert_allclose(out2[:, :10], base[:, :10], atol=1e-5)
    assert not np.allclose(out2[:, 10:], base[:, 10:])


def test_causal_conv_matches_torch_left_pad(rng):
    """Causal = left pad d*(k-1) then valid conv (reference attentions.py:453)."""
    k, d, c = 3, 2, 4
    x = rng.standard_normal((1, 16, c)).astype(np.float32)
    mod = conv1d(c, k, dilation=d, causal=True, use_weight_norm=False)
    params = mod.init(jax.random.key(0), jnp.asarray(x))
    kernel = np.asarray(params["params"]["kernel"])
    bias = np.asarray(params["params"]["bias"])

    tconv = torch.nn.Conv1d(c, c, k, dilation=d, padding=0)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(kernel.transpose(2, 1, 0)))
        tconv.bias.copy_(torch.from_numpy(bias))
    xt = torch.from_numpy(x.transpose(0, 2, 1))
    xt = torch.nn.functional.pad(xt, (d * (k - 1), 0))
    want = tconv(xt).detach().numpy().transpose(0, 2, 1)
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_masked_pools(rng):
    x = rng.standard_normal((2, 6, 3)).astype(np.float32)
    m = np.asarray(sequence_mask(6, jnp.array([4, 6])))
    mx = np.asarray(masked_max_pool(jnp.asarray(x), jnp.asarray(m)))
    av = np.asarray(masked_avg_pool(jnp.asarray(x), jnp.asarray(m)))
    np.testing.assert_allclose(mx[0], x[0, :4].max(axis=0), atol=1e-6)
    np.testing.assert_allclose(mx[1], x[1].max(axis=0), atol=1e-6)
    np.testing.assert_allclose(av[0], x[0, :4].mean(axis=0), rtol=1e-5)

    cmx = np.asarray(causal_masked_max_pool(jnp.asarray(x), jnp.asarray(m)))
    cav = np.asarray(causal_masked_avg_pool(jnp.asarray(x), jnp.asarray(m)))
    for t in range(4):
        np.testing.assert_allclose(cmx[0, t], x[0, : t + 1].max(axis=0), atol=1e-6)
        np.testing.assert_allclose(cav[0, t], x[0, : t + 1].mean(axis=0), rtol=1e-5)
    # beyond the valid prefix, the running stats freeze (padded => ignored)
    np.testing.assert_allclose(cmx[0, 5], x[0, :4].max(axis=0), atol=1e-6)
    np.testing.assert_allclose(
        cav[0, 5], x[0, :4].sum(axis=0) / 4.0, rtol=1e-5
    )


def test_instance_norm_matches_torch(rng):
    c = 6
    x = rng.standard_normal((2, 10, c)).astype(np.float32)
    mod = InstanceNorm1d(c)
    params = mod.init(jax.random.key(0), jnp.asarray(x))
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    tnorm = torch.nn.InstanceNorm1d(c, affine=True)
    want = tnorm(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_cbam_masks_and_shapes(rng, causal):
    x = rng.standard_normal((2, 12, 16)).astype(np.float32)
    m = np.asarray(sequence_mask(12, jnp.array([8, 12])))
    x = np.where(m[..., None], 0.0, x).astype(np.float32)
    mod = CBAM1D(channels=16, causal=causal)
    params = mod.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(m))
    out = np.asarray(mod.apply(params, jnp.asarray(x), jnp.asarray(m)))
    assert out.shape == x.shape
    # padded positions zeroed (reference attentions.py:417)
    assert np.abs(out[0, 8:]).max() == 0.0

    # mask invariance: garbage in padded inputs must not affect valid outputs
    x_g = x.copy()
    x_g[0, 8:] = 99.0
    x_g = np.where(m[..., None], x_g, x)  # garbage only at padded
    # inputs to CBAM are pre-masked by contract; instead vary padded length:
    out_short = np.asarray(
        mod.apply(params, jnp.asarray(x[:, :10]), jnp.asarray(m[:, :10]))
    )
    np.testing.assert_allclose(out_short[0, :8], out[0, :8], atol=1e-5)


def test_residual_block_shapes_and_causality(rng):
    x = rng.standard_normal((2, 24, 8)).astype(np.float32)
    m = np.asarray(sequence_mask(24, jnp.array([20, 24])))
    x = np.where(m[..., None], 0.0, x).astype(np.float32)

    blk = ResidualBlock1D(8, 12, kernel_size=3, act="taptx", causal=True,
                          norm="weight", dropout=0.0)
    params = blk.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(m))
    out = np.asarray(blk.apply(params, jnp.asarray(x), jnp.asarray(m)))
    assert out.shape == (2, 24, 12)
    assert np.abs(out[0, 20:]).max() == 0.0

    # causality: future perturbation does not change the past
    x2 = x.copy()
    x2[:, 15:20] += 10.0
    out2 = np.asarray(blk.apply(params, jnp.asarray(x2), jnp.asarray(m)))
    np.testing.assert_allclose(out2[:, :15], out[:, :15], atol=1e-5)

    # non-causal block with CBAM
    blk_nc = ResidualBlock1D(8, 12, kernel_size=5, act="taptx", causal=False,
                             norm="weight", dropout=0.0)
    p2 = blk_nc.init(jax.random.key(1), jnp.asarray(x), jnp.asarray(m))
    out_nc = np.asarray(blk_nc.apply(p2, jnp.asarray(x), jnp.asarray(m)))
    assert out_nc.shape == (2, 24, 12)
    assert "cbam" in p2["params"]
    assert "cbam" not in params["params"]  # causal drops CBAM (attentions.py:489-496)


def test_mel_mixer_shapes_and_mask(rng):
    x = rng.standard_normal((2, 16, 32)).astype(np.float32)
    m = np.asarray(sequence_mask(16, jnp.array([12, 16])))
    x = np.where(m[..., None], 0.0, x).astype(np.float32)
    mod = MelMixer2D(features=24, dropout=0.0)
    params = mod.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(m))
    out = np.asarray(mod.apply(params, jnp.asarray(x), jnp.asarray(m)))
    assert out.shape == (2, 16, 32)

    out_h, hidden = mod.apply(params, jnp.asarray(x), jnp.asarray(m), True, True)
    assert hidden.shape == (2, 16, 32, 24)
    np.testing.assert_allclose(np.asarray(out_h), out, atol=1e-6)


@pytest.mark.parametrize("chunk", [8, 5, 64])  # divides T, ragged, > T
def test_mel_mixer_chunked_hidden_matches_plain(rng, chunk):
    """hidden_chunk_t (bounded-memory hidden) == whole-tensor path."""
    x = jnp.asarray(rng.standard_normal((2, 21, 12)).astype(np.float32))
    m = sequence_mask(21, jnp.array([21, 13]))
    plain = MelMixer2D(features=24)
    params = plain.init(jax.random.key(0), x, m, True)
    chunked = MelMixer2D(features=24, hidden_chunk_t=chunk)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(
                chunked.init(jax.random.key(0), x, m, True)))
    for mask in (m, None):
        ref = plain.apply(params, x, mask, True)
        got = chunked.apply(params, x, mask, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-6)
    # training path: dropout draws differ bitwise; grads must flow finite
    g = jax.grad(lambda p: jnp.sum(chunked.apply(
        p, x, m, False, rngs={"dropout": jax.random.key(3)}) ** 2))(params)
    assert all(bool(jnp.all(jnp.isfinite(l)))
               for l in jax.tree_util.tree_leaves(g))


@pytest.mark.parametrize("t", [24, 29])  # non-multiple of 2^depth too
def test_unet_refiner_shapes_and_mask(rng, t):
    f = 36  # mel(32) + hidden(4)
    x = rng.standard_normal((2, t, f)).astype(np.float32)
    m = np.asarray(sequence_mask(t, jnp.array([t - 5, t])))
    x = np.where(m[..., None], 0.0, x).astype(np.float32)
    mod = UNetRefiner(base_ch=8, depth=3, dropout=0.0, out_features=32)
    params = mod.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(m))
    out = np.asarray(mod.apply(params, jnp.asarray(x), jnp.asarray(m)))
    assert out.shape == (2, t, 32)
    assert np.isfinite(out).all()


@pytest.mark.parametrize("cin,cout", [(1, 64), (64, 64), (6, 4)])
def test_packed_convblock_matches_plain(rng, cin, cout):
    """Packed-W ConvBlock == plain ConvBlock: same params, same output."""
    from mqgan_tpu.nn.unet import ConvBlock

    x = jnp.asarray(rng.standard_normal((2, 6, 10, cin)).astype(np.float32))
    m = sequence_mask(6, jnp.array([6, 4]))
    plain = ConvBlock(cout, dropout=0.1)
    params = plain.init(jax.random.key(0), x, m, True)
    ref = plain.apply(params, x, m, True)

    packed = ConvBlock(cout, dropout=0.1, packed=True)
    p2 = packed.init(jax.random.key(0), x, m, True)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))
    got = packed.apply(params, x, m, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)

    # odd W falls back to the plain path
    odd = packed.apply(params, x[:, :, :9], m, True)
    want = plain.apply(params, x[:, :, :9], m, True)
    np.testing.assert_allclose(np.asarray(odd), np.asarray(want))


def test_int8_convblock_close_to_plain(rng):
    """int8 MXU ConvBlock: same params, small quantization deviation."""
    from mqgan_tpu.nn.unet import ConvBlock

    x = jnp.asarray(rng.standard_normal((2, 8, 12, 16)).astype(np.float32))
    m = sequence_mask(8, jnp.array([8, 5]))
    plain = ConvBlock(16, dropout=0.0)
    params = plain.init(jax.random.key(0), x, m, True)
    q = ConvBlock(16, dropout=0.0, int8=True)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(q.init(jax.random.key(0), x, m,
                                                   True)))
    ref = np.asarray(plain.apply(params, x, m, True))
    got = np.asarray(q.apply(params, x, m, True))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() < 0.05 * scale
    assert np.abs(got - ref).max() > 0  # actually quantized

    # non-deterministic calls fall back to the float path (training-safe)
    r_f = q.apply(params, x, m, False, rngs={"dropout": jax.random.key(1)})
    assert np.isfinite(np.asarray(r_f)).all()


def test_int8_refiner_output_deviation_small(rng):
    from mqgan_tpu.nn.unet import UNetRefiner

    x = jnp.asarray(rng.standard_normal((2, 24, 36)).astype(np.float32))
    m = sequence_mask(24, jnp.array([24, 17]))
    ref_mod = UNetRefiner(base_ch=8, depth=2, dropout=0.0, out_features=32)
    params = ref_mod.init(jax.random.key(0), x, m)
    q_mod = UNetRefiner(base_ch=8, depth=2, dropout=0.0, out_features=32,
                        int8=True)
    ref = np.asarray(ref_mod.apply(params, x, m))
    got = np.asarray(q_mod.apply(params, x, m))
    denom = max(np.abs(ref).max(), 1e-6)
    assert np.abs(got - ref).max() < 0.1 * denom


def test_se_layer_masked(rng):
    x = rng.standard_normal((2, 6, 8, 4)).astype(np.float32)
    m = np.zeros((2, 6, 8), bool)
    m[0, 4:] = True
    mod = ChannelSELayerMasked(num_channels=4, reduction_ratio=2)
    params = mod.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(m))
    out = np.asarray(mod.apply(params, jnp.asarray(x), jnp.asarray(m)))
    assert out.shape == x.shape

    # masked squeeze ignores padded region: scaling identical if padded
    # values change
    x2 = x.copy()
    x2[0, 4:] = 123.0
    out2 = np.asarray(mod.apply(params, jnp.asarray(x2), jnp.asarray(m)))
    np.testing.assert_allclose(out2[0, :4], out[0, :4], rtol=1e-5)
