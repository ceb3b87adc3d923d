"""StreamingDecoder: exact parity with offline decode + latency contract.

The reference has NO streaming path (whole-clip TorchScript decode only,
preencoder.py:453-504); this is net-new serving surface. Exactness claim:
every streamed frame equals the offline decode of the whole clip under
the padded-decode convention, with algorithmic latency halo_r frames.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mqgan_tpu.core.chunking import decoder_halos
from mqgan_tpu.deploy.streaming import StreamingDecoder

from tests.test_chunking import _tiny_preencoder


@pytest.fixture(scope="module")
def tiny_decode():
    model = _tiny_preencoder()
    params = jax.jit(model.init)(
        jax.random.key(0),
        jnp.zeros((1, 16, 8), jnp.float32),
        jnp.full((1,), 16, jnp.int32),
    )

    @jax.jit
    def decode(idx, mask):
        return model.apply(params, idx, mask, method=type(model).decode)

    def decode_fn(idx, mask):
        return np.asarray(decode(jnp.asarray(idx), jnp.asarray(mask)))

    return decode_fn


def _offline(decode_fn, indices, window_pad=32):
    """Whole-clip decode under the padded convention (see test_chunking)."""
    t = len(indices)
    idx = np.zeros((1, t + window_pad), np.int32)
    idx[0, :t] = indices
    mask = np.arange(t + window_pad)[None, :] >= t
    return decode_fn(idx, mask)[0, :t]


@pytest.mark.parametrize("chunk", [1, 7, 32, 111])
def test_streaming_matches_offline(tiny_decode, chunk):
    halo_l, halo_r = decoder_halos((3, 5), 2)
    t = 300
    rng = np.random.default_rng(4)
    indices = np.asarray(rng.integers(0, 40, (t,)), np.int32)
    offline = _offline(tiny_decode, indices)

    dec = StreamingDecoder(tiny_decode, halo_l, halo_r, window=128, align=4)
    assert dec.latency_frames == halo_r
    got, emitted_at = [], []
    for pos in range(0, t, chunk):
        out = dec.feed(indices[pos: pos + chunk])
        if out.size:
            got.append(out)
        emitted_at.append((min(pos + chunk, t), sum(g.shape[0] for g in got)))
    tail = dec.flush()
    if tail.size:
        got.append(tail)
    streamed = np.concatenate(got, axis=0)

    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, atol=1e-5, rtol=1e-5)
    # latency contract: never more than halo_r frames behind the feed,
    # and never emits frames lacking halo_r of future context
    for fed, emitted in emitted_at:
        assert emitted <= max(0, fed - halo_r) + 1e-9
    # fully caught up (minus latency) by the end of the feed loop
    assert emitted_at[-1][1] >= t - halo_r - dec.align


def test_streaming_chunk_size_invariance(tiny_decode):
    """The emitted stream is identical regardless of feed partitioning."""
    halo_l, halo_r = decoder_halos((3, 5), 2)
    t = 220
    indices = np.asarray(
        np.random.default_rng(5).integers(0, 40, (t,)), np.int32)

    def run(chunks):
        dec = StreamingDecoder(tiny_decode, halo_l, halo_r, window=128,
                               align=4)
        outs = []
        pos = 0
        for c in chunks:
            out = dec.feed(indices[pos: pos + c])
            if out.size:
                outs.append(out)
            pos += c
        assert pos == t
        tail = dec.flush()
        if tail.size:
            outs.append(tail)
        return np.concatenate(outs, axis=0)

    a = run([13] * 16 + [12])
    b = run([220])
    c = run([1] * 220)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)


def test_streaming_reset_and_window_validation(tiny_decode):
    halo_l, halo_r = decoder_halos((3, 5), 2)
    with pytest.raises(ValueError):
        StreamingDecoder(tiny_decode, halo_l, halo_r, window=64, align=4)
    dec = StreamingDecoder(tiny_decode, halo_l, halo_r, window=128, align=4)
    idx = np.asarray(np.random.default_rng(6).integers(0, 40, 150), np.int32)
    dec.feed(idx)
    dec.flush()
    with pytest.raises(RuntimeError):
        dec.feed(idx)
    dec.reset()
    out = dec.feed(idx)
    tail = dec.flush()
    total = (out.shape[0] if out.size else 0) + tail.shape[0]
    assert total == 150
