"""HTTP serving front end: wire-format round-trips vs direct runtime calls,
concurrent clients through the micro-batcher, and error-status mapping."""

import io
import json
import threading
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
    out = str(tmp_path_factory.mktemp("http_export"))
    export_preencoder(gen, params, out, buckets=(32, 64),
                      config_dict={"mel_channels": MEL}, verify=False)
    return out


@pytest.fixture(scope="module")
def server(export_dir):
    from mqgan_tpu.deploy.http_server import CodecHTTPServer, CodecHTTPService

    service = CodecHTTPService(export_dir, max_batch=8, max_delay_ms=20.0)
    with CodecHTTPServer(service, port=0) as srv:
        yield srv


def _post(url, arr, length=None, raw=None):
    body = raw
    if body is None:
        buf = io.BytesIO()
        np.save(buf, arr, allow_pickle=False)
        body = buf.getvalue()
    req = urllib.request.Request(url, data=body, method="POST")
    if length is not None:
        req.add_header("X-Clip-Length", str(length))
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.status, resp.read()


def _get_json(url):
    with urllib.request.urlopen(url, timeout=60) as resp:
        return json.loads(resp.read())


def test_http_roundtrip_matches_direct(server, rng):
    rt = server.service.runtime
    mel = rng.standard_normal((20, MEL)).astype(np.float32)

    status, body = _post(server.url + "/encode", mel)
    assert status == 200
    tokens = np.load(io.BytesIO(body), allow_pickle=False)
    direct = rt.encode(mel[None], np.asarray([20], np.int32))[0]
    np.testing.assert_array_equal(tokens, direct)

    status, body = _post(server.url + "/decode", tokens)
    assert status == 200
    mel_out = np.load(io.BytesIO(body), allow_pickle=False)
    direct_mel = rt.decode(tokens[None], np.asarray([20], np.int32))[0]
    np.testing.assert_allclose(mel_out, direct_mel, atol=1e-6)

    status, body = _post(server.url + "/reencode", mel)
    assert status == 200
    out = np.load(io.BytesIO(body), allow_pickle=False)
    np.testing.assert_array_equal(out["tokens"], direct)
    assert out["mel"].shape == (20, MEL)


def test_http_clip_length_header_masks_tail(server, rng):
    """X-Clip-Length marks trailing frames as padding — tokens must equal a
    direct call with the same explicit length."""
    rt = server.service.runtime
    mel = rng.standard_normal((24, MEL)).astype(np.float32)
    status, body = _post(server.url + "/encode", mel, length=17)
    assert status == 200
    tokens = np.load(io.BytesIO(body), allow_pickle=False)
    direct = rt.encode(mel[None], np.asarray([17], np.int32))[0]
    np.testing.assert_array_equal(tokens[:17], direct[:17])


def test_http_concurrent_clients_all_served(server, rng):
    """Many simultaneous clients: every response matches its own clip's
    direct result (the micro-batcher must not cross wires) and the stats
    endpoint accounts for all of them."""
    rt = server.service.runtime
    before = _get_json(server.url + "/stats")["encode"]["requests"]
    clips = [rng.standard_normal((16 + i, MEL)).astype(np.float32)
             for i in range(10)]
    results = [None] * len(clips)
    errors = []

    def client(i):
        try:
            status, body = _post(server.url + "/encode", clips[i])
            assert status == 200
            results[i] = np.load(io.BytesIO(body), allow_pickle=False)
        except Exception as e:  # noqa: BLE001
            errors.append((i, e))

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(len(clips))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    for i, clip in enumerate(clips):
        direct = rt.encode(
            clip[None], np.asarray([clip.shape[0]], np.int32))[0]
        np.testing.assert_array_equal(results[i], direct)
    stats = _get_json(server.url + "/stats")["encode"]
    assert stats["requests"] - before == len(clips)


def test_http_health_and_errors(server, rng):
    health = _get_json(server.url + "/healthz")
    assert health["ok"] and health["mel_channels"] == MEL
    assert health["buckets"] == [32, 64]
    assert set(health["ops"]) == {"encode", "decode", "reencode"}

    # wrong channel count -> 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server.url + "/encode",
              rng.standard_normal((10, MEL + 1)).astype(np.float32))
    assert ei.value.code == 400
    # clip longer than the largest exported bucket -> 413
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server.url + "/encode",
              rng.standard_normal((65, MEL)).astype(np.float32))
    assert ei.value.code == 413
    # garbage body -> 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server.url + "/encode", None, raw=b"not an npy payload")
    assert ei.value.code == 400
    # unknown op -> 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server.url + "/transcode",
              rng.standard_normal((10, MEL)).astype(np.float32))
    assert ei.value.code == 404
    # decode with a float payload -> 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server.url + "/decode",
              rng.standard_normal((10,)).astype(np.float32))
    assert ei.value.code == 400
    # bad X-Clip-Length -> 400
    req = urllib.request.Request(
        server.url + "/encode", data=b"\x93NUMPY", method="POST")
    req.add_header("X-Clip-Length", "banana")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=60)
    assert ei.value.code == 400
