"""HTTP streaming sessions: chunked feeds over the wire must be
bit-identical to solo in-process streamers, plus session lifecycle and
error mapping."""

import io
import json
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mqgan_tpu.models.preencoder import PreEncoder

MEL = 16


@pytest.fixture(scope="module")
def export_dir(tmp_path_factory):
    from mqgan_tpu.deploy.export import export_preencoder

    gen = PreEncoder(
        mel_channels=MEL, channels=(8, 12), kernel_sizes=(3,),
        fsq_levels=(8, 5, 5, 5), dropout=0.0,
        refiner_base_channels=4, refiner_depth=2,
    )
    mel = jnp.zeros((1, 32, MEL), jnp.float32)
    lengths = jnp.full((1,), 32, jnp.int32)
    params = gen.init(jax.random.key(0), mel, lengths)
    out = str(tmp_path_factory.mktemp("http_stream_export"))
    export_preencoder(gen, params, out, buckets=(64, 128),
                      config_dict={"mel_channels": MEL}, verify=False)
    return out


@pytest.fixture(scope="module")
def server(export_dir):
    from mqgan_tpu.deploy.http_streaming import (
        StreamingHTTPServer, StreamingHTTPService)

    service = StreamingHTTPService(export_dir, stream_max_delay_ms=10.0)
    with StreamingHTTPServer(service, port=0) as srv:
        yield srv


def _post_npy(url, arr=None):
    body = b""
    if arr is not None:
        buf = io.BytesIO()
        np.save(buf, arr, allow_pickle=False)
        body = buf.getvalue()
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=120) as resp:
        return np.load(io.BytesIO(resp.read()), allow_pickle=False)


def _post_json(url, obj=None):
    req = urllib.request.Request(
        url, data=json.dumps(obj or {}).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=120) as resp:
        return json.loads(resp.read())


def _get_json(url):
    with urllib.request.urlopen(url, timeout=120) as resp:
        return json.loads(resp.read())


def test_http_duplex_stream_matches_solo(server, rng):
    """Chunked mel feeds through the HTTP duplex = a solo in-process
    DuplexSession fed the same chunks, bit for bit."""
    from mqgan_tpu.deploy.streaming_server import StreamingCodecServer

    info = _post_json(server.url + "/stream/open", {"kind": "duplex"})
    sid = info["session"]
    assert info["mel_channels"] == MEL and info["window"] == 128

    chunks = [rng.standard_normal((n, MEL)).astype(np.float32)
              for n in (48, 33, 64, 17)]
    got = []
    for c in chunks:
        got.append(_post_npy(f"{server.url}/stream/{sid}/feed", c))
    got.append(_post_npy(f"{server.url}/stream/{sid}/flush"))
    http_out = np.concatenate([g for g in got if g.size], axis=0)

    with StreamingCodecServer.from_runtime(server.service.runtime) as scs:
        solo = scs.open_duplex()
        ref = [solo.feed(c) for c in chunks] + [solo.flush()]
    ref_out = np.concatenate([r for r in ref if r.size], axis=0)
    np.testing.assert_array_equal(http_out, ref_out)

    ack = _post_json(f"{server.url}/stream/{sid}/close")
    assert ack["closed"]


def test_http_encoder_decoder_roundtrip(server, rng):
    """Encode a clip through an encoder session, decode the tokens through
    a decoder session; tokens must match the offline runtime encode."""
    rt = server.service.runtime
    mel = rng.standard_normal((100, MEL)).astype(np.float32)

    enc = _post_json(server.url + "/stream/open", {"kind": "encoder"})
    outs = [_post_npy(f"{server.url}/stream/{enc['session']}/feed", mel[:57]),
            _post_npy(f"{server.url}/stream/{enc['session']}/feed", mel[57:]),
            _post_npy(f"{server.url}/stream/{enc['session']}/flush")]
    tokens = np.concatenate([o for o in outs if o.size])
    # streamed encode reproduces the offline *chunked* encode policy,
    # which on a clip this short (<= one window) is the exact encode
    direct = rt.encode(mel[None], np.asarray([100], np.int32))[0]
    np.testing.assert_array_equal(tokens, direct)

    dec = _post_json(server.url + "/stream/open", {"kind": "decoder"})
    outs = [_post_npy(f"{server.url}/stream/{dec['session']}/feed",
                      tokens.astype(np.int64)),
            _post_npy(f"{server.url}/stream/{dec['session']}/flush")]
    mel_out = np.concatenate([o for o in outs if o.size], axis=0)
    assert mel_out.shape == (100, MEL)


def test_http_stream_flush_resets_for_reuse(server, rng):
    """After flush, the same session processes a second clip from scratch —
    identical output for identical input."""
    clip = rng.standard_normal((80, MEL)).astype(np.float32)
    info = _post_json(server.url + "/stream/open", {"kind": "duplex"})
    sid = info["session"]

    def run_clip():
        parts = [_post_npy(f"{server.url}/stream/{sid}/feed", clip),
                 _post_npy(f"{server.url}/stream/{sid}/flush")]
        return np.concatenate([p for p in parts if p.size], axis=0)

    first, second = run_clip(), run_clip()
    np.testing.assert_array_equal(first, second)
    _post_json(f"{server.url}/stream/{sid}/close")


def test_http_stream_lifecycle_and_errors(server, rng):
    stats = _get_json(server.url + "/stream/stats")
    assert "sessions" in stats

    # unknown session -> 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post_npy(server.url + "/stream/deadbeef/feed",
                  rng.standard_normal((4, MEL)).astype(np.float32))
    assert ei.value.code == 404
    # bad kind -> 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post_json(server.url + "/stream/open", {"kind": "telepathy"})
    assert ei.value.code == 400
    # wrong chunk shape -> 400
    info = _post_json(server.url + "/stream/open", {"kind": "duplex"})
    sid = info["session"]
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post_npy(f"{server.url}/stream/{sid}/feed",
                  rng.standard_normal((4, MEL + 2)).astype(np.float32))
    assert ei.value.code == 400
    # decoder fed floats -> 400
    dec = _post_json(server.url + "/stream/open", {"kind": "decoder"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post_npy(f"{server.url}/stream/{dec['session']}/feed",
                  rng.standard_normal((4,)).astype(np.float32))
    assert ei.value.code == 400
    # closed session -> 404 on further feeds
    _post_json(f"{server.url}/stream/{sid}/close")
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post_npy(f"{server.url}/stream/{sid}/feed",
                  rng.standard_normal((4, MEL)).astype(np.float32))
    assert ei.value.code == 404
    # codec endpoints still work on the streaming server
    health = _get_json(server.url + "/healthz")
    assert health["ok"]


def test_idle_sessions_are_swept(export_dir, rng):
    from mqgan_tpu.deploy.http_streaming import StreamingHTTPService

    service = StreamingHTTPService(export_dir, idle_timeout_s=0.05)
    try:
        info = service.open_stream("duplex")
        sid = info["session"]
        import time

        time.sleep(0.1)
        # the sweep runs on the next open; the stale session must be gone
        service.open_stream("duplex")
        from mqgan_tpu.deploy.http_server import _HTTPError

        with pytest.raises(_HTTPError):
            service._get(sid)
    finally:
        service.close()
