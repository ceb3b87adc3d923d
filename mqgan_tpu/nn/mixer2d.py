"""MelMixer2D — the generator's "mel-mixer" block.

Behavioral spec (reference ConvBlock2D, preencoder.py:205-301, as used at
preencoder.py:322,351): treat the (channels, time) feature plane as a 1-chan
image; depthwise 5x5 weight-norm conv + pointwise expansion to `features`
planes, mask, APTx, dropout, then 1x1 conv back to a single plane.

Layout here: input (B, T, C) -> image (B, T, C, 1) NHWC; the mask (B, T)
broadcasts along the channel-as-space axis exactly like the reference's
(B,1,1,T) mask broadcast over H.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mqgan_tpu.core.masking import apply_mask
from mqgan_tpu.nn.activations import aptx, make_activation
from mqgan_tpu.nn.conv import WNConv


def _fast_dropout_contract(h, w2, key, keep_p):
    """Moment-matched Gaussian replacement for dropout(h) @ w2.

    Inverted Bernoulli dropout on h followed by the feature contraction has
    mean sum_f w2 h and variance (1-p)/p * sum_f w2^2 h^2 per output
    element; draw one standard normal per OUTPUT element instead of one
    Bernoulli per HIDDEN element. Gradients flow through both moments.
    """
    mu = jnp.einsum("btcf,f->btc", h, w2)
    var = jnp.einsum("btcf,f->btc", jnp.square(h), jnp.square(w2),
                     preferred_element_type=jnp.float32)
    var = var * ((1.0 - keep_p) / keep_p)
    eps = jax.random.normal(key, mu.shape, jnp.float32)
    # double-where safe sqrt: var is exactly 0 at padded/zero hiddens and
    # d sqrt(0) = inf would poison the backward (inf * 0 = NaN)
    pos = var > 0
    std = jnp.sqrt(jnp.where(pos, var, 1.0))
    noise = jnp.where(pos, eps * std, 0.0)
    return mu + noise.astype(mu.dtype)


class MelMixer2D(nn.Module):
    """fused=True evaluates the whole mixer as one Pallas kernel
    (ops/mixer_kernels.py) that never materializes the (B, T, C, features)
    hidden.  Inference-only (deterministic), depthwise variant with the
    fixed aptx act and lane-aligned C; assumes contiguous pad masks.  Param
    tree is unchanged; unsupported configs fall back to the XLA path, which
    stays the default and the parity reference."""

    features: int  # pointwise expansion width (== channels[0] in reference)
    kernel_size: int = 5
    depthwise: bool = True
    use_weight_norm: bool = True
    act: str = "aptx"
    dropout: float = 0.1
    fused: bool = False
    # hidden_chunk_t: evaluate the pointwise-MLP (pw -> act -> dropout ->
    # conv_out) in sequential chunks of this many time frames so the
    # (B, T, C, features) hidden never materializes at once — at flagship
    # B=64 T=256 that hidden is 8 GB bf16 and is what blocks large-batch
    # training (each chunk is checkpointed, so the backward stores only the
    # (B, T, C) dw output).  None = plain whole-tensor path (the parity
    # reference).  Same math; the dropout draw differs bitwise from the
    # plain path (iid elementwise either way).
    hidden_chunk_t: int | None = None
    # poly_approx: serving-only fast path — the deterministic pointwise MLP
    # is a scalar function g of the depthwise output (the expansion reads a
    # single input plane), so replace the `features`-wide APTx evaluation
    # per element with a per-batch-range Chebyshev interpolant of g
    # (ops/mixer_poly.py).  Same param tree; non-deterministic calls fall
    # back to the exact path.  Accuracy is measured in
    # tests/test_mixer_poly.py and docs/SERVING.md.
    poly_approx: bool = False
    poly_degree: int = 160
    # fast_dropout: EXPERIMENTAL training path — replace the Bernoulli mask
    # on the (B, T, C, features) hidden with Gaussian noise on the
    # contraction output carrying the exact dropout mean and variance
    # (fast-dropout, Wang & Manning 2013):
    #   out = sum_f w2 h            (mean of inverted dropout)
    #       + eps * sqrt((1-p)/p * sum_f w2^2 h^2),  eps ~ N(0,1) per (b,t,c)
    # `features`x fewer random draws per call; the draw cost was measured
    # at 59% of the flagship step under threefry and is still the largest
    # single dropout cost under rbg (benchmarks/README.md). Changes the
    # noise distribution (per-output Gaussian instead of summed Bernoulli),
    # NOT reference behavior — off by default.
    fast_dropout: bool = False
    dtype: jnp.dtype | None = None

    def _folded_mlp_params(self, dw_out, dtype):
        """Declare the pointwise-MLP params (pw, conv_out) on the shared
        param tree via tiny dummy calls (outputs DCE'd under jit) and return
        the folded scalar-map weights (w1, b1, w2, b2) in ``dtype``. Every
        fast path that re-implements the pointwise MLP (poly, chunked,
        fast-dropout contraction) goes through this one helper so the
        param tree and the weight-norm fold cannot diverge from the plain
        XLA parity path."""
        pw = WNConv(self.features, (1, 1),
                    use_weight_norm=self.use_weight_norm,
                    dtype=self.dtype, name="pw")
        co = WNConv(1, (1, 1), use_weight_norm=False, dtype=self.dtype,
                    name="conv_out")
        d = pw(dw_out[:1, :1, :1])
        _ = co(d)
        pp = pw.variables["params"]
        if self.use_weight_norm:
            from mqgan_tpu.nn.conv import weight_norm_kernel
            w1 = weight_norm_kernel(pp["v"], pp["g"], dtype).reshape(-1)
        else:
            w1 = pp["kernel"].astype(dtype).reshape(-1)
        b1 = pp["bias"].astype(dtype)
        cp = co.variables["params"]
        w2 = cp["kernel"].astype(dtype).reshape(-1)  # (features,)
        b2 = cp["bias"].astype(dtype)  # (1,)
        return w1, b1, w2, b2

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, T, C)
        pad_mask: jax.Array | None = None,  # (B, T)
        deterministic: bool = True,
        return_hidden: bool = False,
    ):
        img = x[..., None]  # (B, T, C, 1)

        def mask4(t):
            if pad_mask is None:
                return t
            return jnp.where(pad_mask[:, :, None, None], jnp.zeros((), t.dtype), t)

        use_fused = (
            self.fused and deterministic and not return_hidden
            and self.depthwise and self.act == "aptx"
            and x.shape[-1] % 128 == 0
        )
        if use_fused:
            from mqgan_tpu.ops.mixer_kernels import fused_mel_mixer

            k = (self.kernel_size, self.kernel_size)
            dw = WNConv(1, k, use_weight_norm=self.use_weight_norm,
                        dtype=self.dtype, name="dw")
            pw = WNConv(self.features, (1, 1),
                        use_weight_norm=self.use_weight_norm,
                        dtype=self.dtype, name="pw")
            co = WNConv(1, (1, 1), use_weight_norm=False, dtype=self.dtype,
                        name="conv_out")
            # tiny dummy calls declare the identical param tree; outputs
            # are unused and DCE'd under jit
            d = dw(img[:1, :8, :8])
            d = pw(d)
            _ = co(d)
            mask = (pad_mask if pad_mask is not None
                    else jnp.zeros(x.shape[:2], bool))
            lengths = jnp.sum(~mask, axis=1).astype(jnp.int32)
            params = {"dw": dw.variables["params"],
                      "pw": pw.variables["params"],
                      "conv_out": co.variables["params"]}
            return fused_mel_mixer(
                x.astype(self.dtype or x.dtype), lengths, params)

        use_poly = (
            self.poly_approx and deterministic and not return_hidden
            and self.depthwise and self.act == "aptx"
        )
        if use_poly:
            from mqgan_tpu.ops.mixer_poly import poly_mixer_apply

            k = (self.kernel_size, self.kernel_size)
            dw_out = WNConv(1, k, use_weight_norm=self.use_weight_norm,
                            dtype=self.dtype, name="dw")(img)
            dw_out = mask4(dw_out)
            w1, b1, w2, b2 = self._folded_mlp_params(dw_out, jnp.float32)
            return poly_mixer_apply(
                dw_out[..., 0], pad_mask, w1, b1, w2, b2[0],
                degree=self.poly_degree)

        use_chunked = (
            self.hidden_chunk_t is not None and self.depthwise
            and not return_hidden and self.act == "aptx"
        )
        if use_chunked:
            k = (self.kernel_size, self.kernel_size)
            dw_out = WNConv(1, k, use_weight_norm=self.use_weight_norm,
                            dtype=self.dtype, name="dw")(img)
            dw_out = mask4(dw_out)
            cdt = self.dtype or x.dtype
            w1, b1, w2, b2 = self._folded_mlp_params(dw_out, cdt)

            b, t, c, _ = dw_out.shape
            tc = min(self.hidden_chunk_t, t)
            n = -(-t // tc)
            pad_t = n * tc - t
            s = dw_out[..., 0]  # (B, T, C)
            if pad_mask is not None:
                pm = pad_mask
            else:
                pm = jnp.zeros((b, t), bool)
            if pad_t:
                s = jnp.pad(s, ((0, 0), (0, pad_t), (0, 0)))
                pm = jnp.pad(pm, ((0, 0), (0, pad_t)), constant_values=True)
            s = s.reshape(b, n, tc, c).transpose(1, 0, 2, 3)
            pm = pm.reshape(b, n, tc).transpose(1, 0, 2)
            use_dropout = not deterministic and self.dropout > 0.0
            if use_dropout:
                keys = jax.random.split(self.make_rng("dropout"), n)
            else:  # unused placeholder with a matching leading axis
                keys = jnp.zeros((n,), jnp.uint32)

            keep_p = 1.0 - self.dropout

            @jax.checkpoint
            def chunk_fn(args):
                sc, mc, key = args  # (B, tc, C), (B, tc), key or dummy
                h = sc[..., None] * w1 + b1  # (B, tc, C, features)
                h = jnp.where(mc[:, :, None, None], jnp.zeros((), h.dtype), h)
                h = aptx(h)  # fixed aptx, same as the plain path's act
                if use_dropout and self.fast_dropout:
                    return _fast_dropout_contract(
                        h, w2, key, keep_p) + b2[0]
                if use_dropout:
                    keep = jax.random.bernoulli(key, keep_p, h.shape)
                    h = jnp.where(keep, h / keep_p, jnp.zeros((), h.dtype))
                return jnp.einsum("btcf,f->btc", h, w2) + b2[0]

            out = jax.lax.map(chunk_fn, (s, pm, keys))
            out = out.transpose(1, 0, 2, 3).reshape(b, n * tc, c)
            return out[:, :t]

        k = (self.kernel_size, self.kernel_size)
        if self.depthwise:
            # input has 1 plane, so depthwise == a single 5x5 conv, then the
            # pointwise expansion (reference _make_conv with groups=in_ch=1).
            out = WNConv(1, k, use_weight_norm=self.use_weight_norm,
                         dtype=self.dtype, name="dw")(img)
            out = mask4(out)
            out = WNConv(self.features, (1, 1),
                         use_weight_norm=self.use_weight_norm,
                         dtype=self.dtype, name="pw")(out)
        else:
            out = WNConv(self.features, k, use_weight_norm=self.use_weight_norm,
                         dtype=self.dtype, name="conv")(img)

        out = mask4(out)
        hidden = make_activation(self.act)(out)
        use_fast = (self.fast_dropout and not deterministic
                    and self.dropout > 0.0 and not return_hidden)
        if use_fast:
            co = WNConv(1, (1, 1), use_weight_norm=False, dtype=self.dtype,
                        name="conv_out")
            _ = co(hidden[:1, :1, :1])  # declare the identical param tree
            cp = co.variables["params"]
            w2 = cp["kernel"].astype(hidden.dtype).reshape(-1)
            b2 = cp["bias"].astype(hidden.dtype)
            key = self.make_rng("dropout")
            return _fast_dropout_contract(
                hidden, w2, key, 1.0 - self.dropout) + b2[0]
        out = nn.Dropout(rate=self.dropout, deterministic=deterministic)(hidden)
        # back to a single plane (reference conv_out, preencoder.py:268)
        out = WNConv(1, (1, 1), use_weight_norm=False, dtype=self.dtype,
                     name="conv_out")(out)
        out = out[..., 0]  # (B, T, C)

        if return_hidden:
            return out, hidden
        return out
