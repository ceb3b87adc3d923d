"""CodecClient against a live streaming HTTP server: whole-clip parity,
streaming sessions, error surfacing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mqgan_tpu.models.preencoder import PreEncoder

MEL = 16


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from mqgan_tpu.deploy.export import export_preencoder
    from mqgan_tpu.deploy.http_streaming import (
        StreamingHTTPServer, StreamingHTTPService)

    gen = PreEncoder(
        mel_channels=MEL, channels=(8, 12), kernel_sizes=(3,),
        fsq_levels=(8, 5, 5, 5), dropout=0.0,
        refiner_base_channels=4, refiner_depth=2,
    )
    mel = jnp.zeros((1, 32, MEL), jnp.float32)
    lengths = jnp.full((1,), 32, jnp.int32)
    params = gen.init(jax.random.key(0), mel, lengths)
    out = str(tmp_path_factory.mktemp("client_export"))
    export_preencoder(gen, params, out, buckets=(64, 128),
                      config_dict={"mel_channels": MEL}, verify=False)
    service = StreamingHTTPService(out, stream_max_delay_ms=10.0)
    with StreamingHTTPServer(service, port=0) as srv:
        yield srv


def test_client_whole_clip_roundtrip(server, rng):
    from mqgan_tpu.deploy.http_client import CodecClient

    c = CodecClient(server.url)
    rt = server.service.runtime
    assert c.health()["mel_channels"] == MEL

    mel = rng.standard_normal((40, MEL)).astype(np.float32)
    tokens = c.encode(mel)
    np.testing.assert_array_equal(
        tokens, rt.encode(mel[None], np.asarray([40], np.int32))[0])
    mel2 = c.decode(tokens)
    assert mel2.shape == (40, MEL)
    t2, m2 = c.reencode(mel)
    np.testing.assert_array_equal(t2, tokens)
    np.testing.assert_allclose(m2, mel2, atol=1e-6)
    assert c.stats()["encode"]["requests"] >= 1


def test_client_streaming_session(server, rng):
    from mqgan_tpu.deploy.http_client import CodecClient
    from mqgan_tpu.deploy.streaming_server import StreamingCodecServer

    c = CodecClient(server.url)
    chunks = [rng.standard_normal((n, MEL)).astype(np.float32)
              for n in (70, 90, 30)]
    with c.open_duplex() as stream:
        assert stream.window == 128 and stream.latency_frames > 0
        got = [stream.feed(ch) for ch in chunks] + [stream.flush()]
    http_out = np.concatenate([g for g in got if g.size], axis=0)

    with StreamingCodecServer.from_runtime(server.service.runtime) as scs:
        solo = scs.open_duplex()
        ref = [solo.feed(ch) for ch in chunks] + [solo.flush()]
    ref_out = np.concatenate([r for r in ref if r.size], axis=0)
    np.testing.assert_array_equal(http_out, ref_out)

    # the context manager closed the session server-side
    assert c.stream_stats()["sessions"] == 0


def test_client_error_surfacing(server, rng):
    from mqgan_tpu.deploy.http_client import (
        CodecClient, CodecHTTPStatusError)

    c = CodecClient(server.url)
    with pytest.raises(CodecHTTPStatusError) as ei:
        c.encode(rng.standard_normal((200, MEL)).astype(np.float32))
    assert ei.value.status == 413 and "bucket" in ei.value.message
    with pytest.raises(CodecHTTPStatusError) as ei:
        c.encode(rng.standard_normal((10, MEL + 3)).astype(np.float32))
    assert ei.value.status == 400
