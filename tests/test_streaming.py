"""StreamingDecoder / StreamingEncoder: parity with the offline passes +
latency contracts.

The reference has NO streaming path (whole-clip TorchScript only,
preencoder.py:420-504); this is net-new serving surface. Decode claim:
every streamed frame equals the offline decode of the whole clip under
the padded-decode convention, with algorithmic latency halo_r frames.
Encode claim: conv-exact with latency encoder_halo frames, token-exact
vs offline whenever window CBAM stats match clip stats (periodic input),
and chunk-size invariant always.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mqgan_tpu.core.chunking import decoder_halos, encoder_halo
from mqgan_tpu.deploy.streaming import StreamingDecoder, StreamingEncoder

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


@pytest.fixture(scope="module")
def tiny_codec():
    """(encode_fn, decode_fn, model) sharing one param set."""
    model = _tiny_preencoder()
    params = jax.jit(model.init)(
        jax.random.key(0),
        jnp.zeros((1, 16, 8), jnp.float32),
        jnp.full((1,), 16, jnp.int32),
    )

    @jax.jit
    def encode(mel, mask):
        return model.apply(params, mel, mask, method=type(model).encode)

    @jax.jit
    def decode(idx, mask):
        return model.apply(params, idx, mask, method=type(model).decode)

    def encode_fn(mel, mask):
        return np.asarray(encode(jnp.asarray(mel), jnp.asarray(mask)))

    def decode_fn(idx, mask):
        return np.asarray(decode(jnp.asarray(idx), jnp.asarray(mask)))

    return encode_fn, decode_fn


def _offline_encode(encode_fn, mel, window_pad=32):
    t = len(mel)
    x = np.zeros((1, t + window_pad, mel.shape[1]), np.float32)
    x[0, :t] = mel
    mask = np.arange(t + window_pad)[None, :] >= t
    return encode_fn(x, mask)[0, :t]


def _periodic_mel(t, period, channels=8, seed=9):
    one = np.random.default_rng(seed).standard_normal(
        (period, channels)).astype(np.float32)
    return np.tile(one, (t // period, 1))


@pytest.mark.parametrize("chunk", [1, 17, 64])
def test_streaming_encode_matches_offline_on_aligned_stats(
        tiny_codec, chunk):
    """Token-exact streaming encode when every window sees the same CBAM
    statistics (periodic input, period = align so every window start and
    the clip length are whole periods — same device as test_chunking's
    full-pipeline claim). Conv halos are what is actually under test."""
    encode_fn, _ = tiny_codec
    halo = encoder_halo((3, 5))
    t, align = 256, 4
    mel = _periodic_mel(t, period=align)
    offline = _offline_encode(encode_fn, mel)

    enc = StreamingEncoder(encode_fn, halo, window=128, mel_channels=8,
                           align=align)
    # CBAM stats must be position-determined -> a frame waits for its
    # whole window (the window size is the latency knob)
    assert enc.latency_frames == 128 - halo
    outs = []
    for pos in range(0, t, chunk):
        out = enc.feed(mel[pos: pos + chunk])
        if out.size:
            outs.append(out)
    tail = enc.flush()
    if tail.size:
        outs.append(tail)
    streamed = np.concatenate(outs, axis=0)
    assert streamed.shape == offline.shape
    np.testing.assert_array_equal(streamed, offline)


def test_streaming_encode_chunk_size_invariance(tiny_codec):
    """Arbitrary (non-periodic) input: the emitted tokens may differ from
    offline (CBAM window stats, module docstring) but NEVER depend on the
    feed partitioning — window geometry is a function of position only."""
    encode_fn, _ = tiny_codec
    halo = encoder_halo((3, 5))
    t = 200
    mel = np.random.default_rng(10).standard_normal((t, 8)).astype(np.float32)

    def run(chunks):
        enc = StreamingEncoder(encode_fn, halo, window=128, mel_channels=8)
        outs, pos = [], 0
        for c in chunks:
            out = enc.feed(mel[pos: pos + c])
            if out.size:
                outs.append(out)
            pos += c
        assert pos == t
        tail = enc.flush()
        if tail.size:
            outs.append(tail)
        return np.concatenate(outs, axis=0)

    a = run([11] * 18 + [2])
    b = run([200])
    c = run([1] * 200)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)


def test_streaming_duplex_matches_offline_reencode(tiny_codec):
    """Full live duplex: mel chunks -> StreamingEncoder -> tokens ->
    StreamingDecoder -> mel, on stats-aligned (periodic) input, equals the
    offline whole-clip encode+decode to float tolerance. Total latency is
    (enc window - enc halo) + decoder halo_r."""
    encode_fn, decode_fn = tiny_codec
    e_halo = encoder_halo((3, 5))
    d_l, d_r = decoder_halos((3, 5), 2)
    t, align = 256, 4
    mel = _periodic_mel(t, period=align, seed=11)

    idx_off = _offline_encode(encode_fn, mel)
    idx_pad = np.zeros((1, t + 32), np.int32)
    idx_pad[0, :t] = idx_off
    mask = np.arange(t + 32)[None, :] >= t
    mel_off = decode_fn(idx_pad, mask)[0, :t]

    enc = StreamingEncoder(encode_fn, e_halo, window=128, mel_channels=8,
                           align=align)
    dec = StreamingDecoder(decode_fn, d_l, d_r, window=128, align=align)
    outs = []
    for pos in range(0, t, 32):
        toks = enc.feed(mel[pos: pos + 32])
        if toks.size:
            out = dec.feed(toks)
            if out.size:
                outs.append(out)
    toks = enc.flush()
    if toks.size:
        out = dec.feed(toks)
        if out.size:
            outs.append(out)
    tail = dec.flush()
    if tail.size:
        outs.append(tail)
    streamed = np.concatenate(outs, axis=0)
    assert streamed.shape == mel_off.shape
    np.testing.assert_allclose(streamed, mel_off, atol=1e-5, rtol=1e-5)


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
