"""StreamingCodecServer: continuous batching of concurrent live sessions.

Net-new serving surface (the reference has neither streaming nor a
serving batcher). Claims pinned here: (a) a session served through the
batcher emits the same stream as a solo StreamingDecoder/StreamingEncoder
— batching is invisible to clients; (b) concurrent sessions' spans
actually coalesce into shared dispatches; (c) close() fails cleanly.
"""

import threading

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mqgan_tpu.core.chunking import decoder_halos, encoder_halo
from mqgan_tpu.deploy.streaming import StreamingDecoder, StreamingEncoder
from mqgan_tpu.deploy.streaming_server import StreamingCodecServer

from tests.test_chunking import _tiny_preencoder
from tests.test_streaming import _periodic_mel


@pytest.fixture(scope="module")
def tiny_batched_codec():
    """(encode_fn, decode_fn) accepting any leading batch size."""
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


def _make_server(tiny_batched_codec, **kw):
    encode_fn, decode_fn = tiny_batched_codec
    kw.setdefault("max_batch", 4)
    kw.setdefault("max_delay_ms", 100.0)  # generous linger: force coalescing
    return StreamingCodecServer(
        decode_fn=decode_fn, encode_fn=encode_fn, window=128,
        mel_channels=8, dec_halos=decoder_halos((3, 5), 2),
        enc_halo=encoder_halo((3, 5)), align=4, **kw)


def _drive(session, stream, chunk=32):
    outs = []
    for pos in range(0, len(stream), chunk):
        out = session.feed(stream[pos: pos + chunk])
        if out.size:
            outs.append(out)
    tail = session.flush()
    if tail.size:
        outs.append(tail)
    return np.concatenate(outs, axis=0)


def test_batched_decode_sessions_match_solo(tiny_batched_codec):
    encode_fn, decode_fn = tiny_batched_codec
    halo_l, halo_r = decoder_halos((3, 5), 2)
    rng = np.random.default_rng(0)
    streams = [np.asarray(rng.integers(0, 40, (220,)), np.int32)
               for _ in range(4)]
    solo = [
        _drive(StreamingDecoder(decode_fn, halo_l, halo_r, window=128,
                                align=4), s)
        for s in streams
    ]

    with _make_server(tiny_batched_codec) as srv:
        got = [None] * 4
        errs = []

        def client(i):
            try:
                got[i] = _drive(srv.open_decoder(), streams[i])
            except Exception as e:  # noqa: BLE001 — surface in main thread
                errs.append(e)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errs, errs
        stats = srv.stats()["decode"]

    for g, s in zip(got, solo):
        assert g is not None
        assert g.shape == s.shape
        # batched rows ride one (4, W) dispatch vs the solo (1, W) one;
        # same math, float-level tolerance
        np.testing.assert_allclose(g, s, atol=1e-5, rtol=1e-5)
    # the whole point: concurrent sessions' spans shared dispatches
    assert stats["requests"] > stats["batches"]
    assert stats["mean_batch_size"] > 1.2
    assert stats["queued"] == 0


def test_duplex_session_matches_direct_duplex(tiny_batched_codec):
    encode_fn, decode_fn = tiny_batched_codec
    e_halo = encoder_halo((3, 5))
    d_l, d_r = decoder_halos((3, 5), 2)
    mel = _periodic_mel(256, period=4, seed=11)

    enc = StreamingEncoder(encode_fn, e_halo, window=128, mel_channels=8,
                           align=4)
    dec = StreamingDecoder(decode_fn, d_l, d_r, window=128, align=4)
    direct = []
    for pos in range(0, len(mel), 32):
        out = dec.feed(enc.feed(mel[pos: pos + 32]))
        if out.size:
            direct.append(out)
    out = dec.feed(enc.flush())
    if out.size:
        direct.append(out)
    tail = dec.flush()
    if tail.size:
        direct.append(tail)
    direct = np.concatenate(direct, axis=0)

    with _make_server(tiny_batched_codec) as srv:
        ses = srv.open_duplex()
        # server encoder aligns to the refiner grid? No: encoder align=1 in
        # open_encoder (matches StreamingEncoder default); the direct
        # encoder above used align=4, so re-run direct with align=1 geometry
        # if shapes ever differ. Here both emit every input frame.
        got = _drive(ses, mel, chunk=32)
        assert ses.latency_frames == (128 - e_halo) + d_r

    assert got.shape == direct.shape
    # direct enc used align=4 (a multiple of 1) on period-4 input, so the
    # window geometry differences cannot change CBAM stats: tokens match
    np.testing.assert_allclose(got, direct, atol=1e-5, rtol=1e-5)


def test_server_close_rejects_new_spans(tiny_batched_codec):
    srv = _make_server(tiny_batched_codec, max_delay_ms=1.0)
    dec = srv.open_decoder()
    dec.feed(np.zeros(200, np.int32))
    srv.close()
    with pytest.raises(RuntimeError):
        dec.feed(np.zeros(64, np.int32))
