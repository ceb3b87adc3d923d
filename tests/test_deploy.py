"""Deployment tests: export -> runtime roundtrip (incl. the reference's
different-length verification), batch re-encode, vocoder wrapper."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mqgan_tpu.models.preencoder import PreEncoder

MEL = 16


@pytest.fixture(scope="module")
def small_gen():
    gen = PreEncoder(
        mel_channels=MEL, channels=(8, 12), kernel_sizes=(3,),
        fsq_levels=(8, 5, 5, 5), dropout=0.0,
        refiner_base_channels=4, refiner_depth=2,
    )
    mel = jnp.zeros((1, 32, MEL), jnp.float32)
    lengths = jnp.full((1,), 32, jnp.int32)
    params = gen.init(jax.random.key(0), mel, lengths)
    return gen, params


@pytest.fixture(scope="module")
def export_dir(small_gen, tmp_path_factory):
    from mqgan_tpu.deploy.export import export_preencoder

    gen, params = small_gen
    out = str(tmp_path_factory.mktemp("export"))
    # verify=True runs the different-length roundtrip check internally
    export_preencoder(gen, params, out, buckets=(32, 64),
                      config_dict={"mel_channels": MEL}, verify=True)
    return out


def test_export_artifacts(export_dir):
    names = os.listdir(export_dir)
    assert "manifest.json" in names
    assert "encode_T32.shlo" in names and "decode_T64.shlo" in names
    assert "model_config.json" in names


def test_runtime_matches_eager(export_dir, small_gen, rng):
    from mqgan_tpu.core.masking import sequence_mask
    from mqgan_tpu.deploy.runtime import ExportedPreEncoder

    gen, params = small_gen
    rt = ExportedPreEncoder(export_dir)
    assert rt.mel_channels == MEL
    assert rt.fsq_levels == [8, 5, 5, 5]
    assert rt.codebook_size == 1000
    assert rt.bos_token_id == 1001 and rt.eos_token_id == 1002

    spec = rng.standard_normal((3, 32, MEL)).astype(np.float32)
    lengths = np.array([32, 20, 7], np.int32)

    idx_rt = rt.encode(spec, lengths)
    pad = sequence_mask(32, jnp.asarray(lengths))
    idx_eager = np.asarray(
        gen.apply(params, jnp.asarray(spec), pad, method=PreEncoder.encode)
    )
    np.testing.assert_array_equal(idx_rt, idx_eager)

    out_rt = rt.decode(idx_rt, lengths)
    out_eager = np.asarray(
        gen.apply(params, jnp.asarray(idx_eager), pad, method=PreEncoder.decode)
    )
    np.testing.assert_allclose(out_rt, out_eager, atol=1e-4)


def test_runtime_data_parallel_matches_single_device(export_dir, rng):
    """data_parallel=True fans the batch out over the 8 virtual CPU
    devices (one compiled copy per device) and must return exactly the
    single-device results — including a batch that is NOT a multiple of
    the device count (repeat-padded rows are trimmed) and mixed lengths."""
    from mqgan_tpu.deploy.runtime import ExportedPreEncoder

    if jax.local_device_count() < 2:
        pytest.skip("needs a multi-device (virtual CPU) mesh")
    rt1 = ExportedPreEncoder(export_dir)
    rtn = ExportedPreEncoder(export_dir, data_parallel=True)
    assert rtn.n_devices == jax.local_device_count()

    spec = rng.standard_normal((5, 30, MEL)).astype(np.float32)
    lengths = np.array([30, 22, 7, 30, 13], np.int32)

    idx1 = rt1.encode(spec, lengths)
    idxn = rtn.encode(spec, lengths)
    np.testing.assert_array_equal(idx1, idxn)

    out1 = rt1.decode(idx1, lengths)
    outn = rtn.decode(idx1, lengths)
    np.testing.assert_allclose(outn, out1, atol=1e-5)

    t1, r1 = rt1.reencode(spec, lengths)
    tn, rn = rtn.reencode(spec, lengths)
    np.testing.assert_array_equal(t1, tn)
    np.testing.assert_allclose(rn, r1, atol=1e-5)

    # pre-fused-program artifacts fall back to separate encode->decode
    # dispatches inside reencode(); that path must fan out identically
    rtn._ree = {}
    tn2, rn2 = rtn.reencode(spec, lengths)
    np.testing.assert_array_equal(t1, tn2)
    np.testing.assert_allclose(rn2, r1, atol=1e-5)


def test_runtime_bucket_padding(export_dir, rng):
    """Non-bucket lengths pad to the next bucket and trim exactly."""
    from mqgan_tpu.deploy.runtime import ExportedPreEncoder

    rt = ExportedPreEncoder(export_dir)
    spec = rng.standard_normal((1, 45, MEL)).astype(np.float32)  # 32 < 45 < 64
    idx = rt.encode(spec)
    assert idx.shape == (1, 45)
    out = rt.decode(idx)
    assert out.shape == (1, 45, MEL)

    with pytest.raises(ValueError, match="largest exported bucket"):
        rt.encode(rng.standard_normal((1, 100, MEL)).astype(np.float32))


def test_int8_refiner_export_roundtrip(small_gen, tmp_path, rng):
    """--int8_refiner export: same tokens (encode has no refiner), close
    refined mels, manifest records the quantization."""
    from mqgan_tpu.deploy.export import export_preencoder
    from mqgan_tpu.deploy.runtime import ExportedPreEncoder

    gen, params = small_gen
    out = str(tmp_path / "int8_export")
    export_preencoder(gen.clone(int8_refiner=True), params, out,
                      buckets=(32,), config_dict={"mel_channels": MEL},
                      verify=True)
    rt_q = ExportedPreEncoder(out)
    assert rt_q.manifest["int8_refiner"] is True

    spec = rng.standard_normal((2, 32, MEL)).astype(np.float32)
    idx_q, mel_q = rt_q.reencode(spec)
    from mqgan_tpu.core.masking import sequence_mask
    pad = sequence_mask(32, jnp.asarray([32, 32]))
    idx_ref = np.asarray(
        gen.apply(params, jnp.asarray(spec), pad, method=PreEncoder.encode))
    np.testing.assert_array_equal(idx_q, idx_ref)
    mel_ref = np.asarray(
        gen.apply(params, jnp.asarray(idx_ref), pad,
                  method=PreEncoder.decode))
    denom = max(np.abs(mel_ref).max(), 1e-6)
    assert np.abs(mel_q - mel_ref).max() < 0.1 * denom


def test_poly_mixers_export_roundtrip(small_gen, tmp_path, rng):
    """--poly_mixers export: Chebyshev mixer path bakes into the StableHLO
    programs; manifest records it; outputs deviate only at interpolation
    level from the exact path."""
    from mqgan_tpu.deploy.export import export_preencoder
    from mqgan_tpu.deploy.runtime import ExportedPreEncoder

    gen, params = small_gen
    out = str(tmp_path / "poly_export")
    export_preencoder(gen.clone(poly_mixers=True), params, out,
                      buckets=(32,), config_dict={"mel_channels": MEL},
                      verify=True)
    rt_p = ExportedPreEncoder(out)
    assert rt_p.manifest["poly_mixers"] is True

    spec = rng.standard_normal((2, 32, MEL)).astype(np.float32)
    idx_p, mel_p = rt_p.reencode(spec)
    from mqgan_tpu.core.masking import sequence_mask
    pad = sequence_mask(32, jnp.asarray([32, 32]))
    idx_ref = np.asarray(
        gen.apply(params, jnp.asarray(spec), pad, method=PreEncoder.encode))
    # pre-mixer interpolation error can flip FSQ rounding only at code
    # boundaries
    assert np.mean(idx_p == idx_ref) > 0.98
    mel_ref = np.asarray(
        gen.apply(params, jnp.asarray(idx_p), pad, method=PreEncoder.decode))
    denom = max(np.abs(mel_ref).max(), 1e-6)
    assert np.abs(mel_p - mel_ref).max() < 5e-3 * denom


def test_codec_server_batches_and_matches_direct(export_dir, rng):
    """Micro-batching server == direct runtime per clip, and concurrent
    same-bucket submissions actually coalesce into shared batches."""
    from mqgan_tpu.deploy.runtime import ExportedPreEncoder
    from mqgan_tpu.deploy.server import CodecServer

    rt = ExportedPreEncoder(export_dir)
    clips = [rng.standard_normal((t, MEL)).astype(np.float32)
             for t in (32, 20, 45, 7, 64, 30, 50, 32)]

    with CodecServer(runtime=rt, op="reencode", max_batch=8,
                     max_delay_ms=60.0) as srv:
        futs = [srv.submit(c) for c in clips]
        # generous: the first flush jit-compiles the bucket program on the
        # 1-core CI host
        results = [f.result(timeout=600) for f in futs]
        stats = srv.stats.summary()

    assert stats["requests"] == len(clips)
    # two buckets (32, 64) -> far fewer launches than clips
    assert stats["batches"] < len(clips)
    assert stats["mean_batch_size"] > 1.0

    for clip, (idx, mel) in zip(clips, results):
        t = clip.shape[0]
        assert idx.shape == (t,) and mel.shape == (t, MEL)
        ref_idx, ref_mel = rt.reencode(clip[None])
        np.testing.assert_array_equal(idx, ref_idx[0])
        np.testing.assert_allclose(mel, ref_mel[0], atol=1e-5)


def test_codec_server_encode_op_and_errors(export_dir, rng):
    from mqgan_tpu.deploy.runtime import ExportedPreEncoder
    from mqgan_tpu.deploy.server import CodecServer

    rt = ExportedPreEncoder(export_dir)
    with CodecServer(runtime=rt, op="encode", max_batch=4,
                     max_delay_ms=1.0) as srv:
        clip = rng.standard_normal((20, MEL)).astype(np.float32)
        idx = srv(clip)
        np.testing.assert_array_equal(idx, rt.encode(clip[None])[0])
        with pytest.raises(ValueError, match="largest exported bucket"):
            srv.submit(rng.standard_normal((100, MEL)).astype(np.float32))
    with pytest.raises(RuntimeError, match="closed"):
        srv.submit(clip)


def test_codec_server_ingress_bound(export_dir, rng):
    """Sustained overload produces backpressure, not unbounded queues:
    submissions beyond max_queue are rejected (and counted) while every
    accepted request still completes; block_on_full=True never rejects."""
    from mqgan_tpu.deploy.runtime import ExportedPreEncoder
    from mqgan_tpu.deploy.server import CodecServer, ServerOverloadedError

    rt = ExportedPreEncoder(export_dir)
    clip = rng.standard_normal((20, MEL)).astype(np.float32)

    # max_batch > submissions + long linger: the worker is guaranteed to be
    # waiting out the linger while we fill the queue, so the accept/reject
    # counts are deterministic
    with CodecServer(runtime=rt, op="encode", max_batch=64, max_delay_ms=5000,
                     max_queue=6) as srv:
        futs, rejects = [], 0
        for _ in range(4 * 6):
            try:
                futs.append(srv.submit(clip))
            except ServerOverloadedError:
                rejects += 1
        assert len(futs) == 6 and rejects == 18
        assert srv.stats.queued == 6
        # accepted work still completes once the worker flushes
        for f in futs:
            f.result(timeout=600)
        s = srv.stats.summary()
        assert s["rejected"] == 18 and s["requests"] == 6 and s["queued"] == 0

    # blocking mode: concurrent submitters throttle instead of rejecting
    import threading

    with CodecServer(runtime=rt, op="encode", max_batch=4, max_delay_ms=1.0,
                     max_queue=2, block_on_full=True) as srv:
        results, errs = [], []

        def client():
            try:
                results.append(srv.submit(clip).result(timeout=600))
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        threads = [threading.Thread(target=client) for _ in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not errs and len(results) == 12
        assert srv.stats.summary()["rejected"] == 0


def test_reencode_cli_from_export(export_dir, tmp_path, rng):
    from mqgan_tpu.deploy.reencode import reencode_spectrograms
    from mqgan_tpu.deploy.runtime import ExportedPreEncoder

    src = tmp_path / "src"
    (src / "nested").mkdir(parents=True)
    lengths = [20, 64, 150]  # 150 > largest bucket -> chunked
    for i, t in enumerate(lengths):
        where = src / ("nested" if i == 1 else ".")
        np.save(where / f"m{i}.npy",
                rng.standard_normal((t, MEL)).astype(np.float32))
    # one broken file for the error-tolerance path
    (src / "broken.npy").write_bytes(b"not-an-npy")

    dst = tmp_path / "dst"
    toks = tmp_path / "toks"
    rt = ExportedPreEncoder(export_dir)
    stats = reencode_spectrograms(
        rt, str(src), str(dst), batch_size=1, save_tokens=True,
        tokens_dir=str(toks),
    )
    assert stats["processed"] == 3 and stats["failed"] == 1
    out0 = np.load(dst / "m0.npy")
    assert out0.shape == (20, MEL) and np.isfinite(out0).all()
    out1 = np.load(dst / "nested" / "m1.npy")
    assert out1.shape == (64, MEL)
    out2 = np.load(dst / "m2.npy")
    assert out2.shape == (150, MEL)
    t0 = np.load(toks / "m0.npy")
    assert t0.shape == (20,) and t0.dtype == np.int64
    assert 0 <= t0.min() and t0.max() < 1000


def test_reencode_from_checkpoint_path(tmp_path, small_gen, rng):
    """CheckpointReencoder: orbax generator-only checkpoint source."""
    from mqgan_tpu.deploy.reencode import CheckpointReencoder
    from mqgan_tpu.utils.checkpoint import save_generator_only

    gen, params = small_gen
    ckpt = save_generator_only(str(tmp_path), params["params"], "gen")

    import yaml

    cfg = {
        "model": {
            "mel_channels": MEL,
            "generator": {
                "channels": [8, 12], "kernel_sizes": [3], "dropout": 0.0,
                "fsq_levels": [8, 5, 5, 5], "refiner_base_channels": 4,
                "refiner_depth": 2,
            },
        },
        "data": {"crop_len": [32]},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    codec = CheckpointReencoder(str(cfg_path), ckpt, buckets=(32, 64))
    spec = rng.standard_normal((2, 40, MEL)).astype(np.float32)
    toks, out = codec.reencode(spec)
    assert toks.shape == (2, 40)
    assert out.shape == (2, 40, MEL)
    assert np.isfinite(out).all()

    # must agree with eager apply
    from mqgan_tpu.core.masking import sequence_mask

    idx = codec.encode(spec)
    pad = np.zeros((2, 40), bool)
    # eager path needs bucket padding too; compare via decode consistency
    np.testing.assert_allclose(out, codec.decode(idx), atol=1e-5)


def test_vocoder_wrapper_roundtrip(tmp_path, rng):
    """ISTFTNetFE with a stub generator: export_ts/load_ts round-trip and
    int16 PCM inference (reference istftnetfe.py:12-17,39-79)."""
    import jax.numpy as jnp

    from mqgan_tpu.signal.stft import TPUSTFT
    from mqgan_tpu.signal.vocoder import ISTFTNetFE, MAX_WAV_VALUE

    n_fft, hop = 16, 4
    n_freq = n_fft // 2 + 1
    mel_ch = 8

    def stub_gen(mel):
        # mel (B, mel_ch, T) -> (spec, phase) each (B, F, T)
        b, _, t = mel.shape
        spec = jnp.abs(jnp.mean(mel, axis=1, keepdims=True)) * jnp.ones(
            (b, n_freq, t)
        )
        phase = jnp.zeros((b, n_freq, t))
        return spec, phase

    fe = ISTFTNetFE(gen=stub_gen, stft=TPUSTFT(n_fft, hop, n_fft))
    mel = jnp.asarray(rng.standard_normal((1, mel_ch, 20)).astype(np.float32))
    wav = fe(mel)
    assert wav.shape[0] == 1 and wav.shape[1] == 1

    pcm = fe.infer(mel)
    assert pcm.dtype == np.int16

    out_dir = str(tmp_path / "voc")
    fe.export_ts(out_dir, sampling_rate=22050, mel_channels=mel_ch,
                 example_frames=20)
    fe2 = ISTFTNetFE.load_ts(out_dir)
    assert fe2.sampling_rate == 22050
    wav2 = fe2(np.asarray(mel))
    np.testing.assert_allclose(np.asarray(wav)[0, 0], np.asarray(wav2)[0, 0],
                               atol=1e-4)


def test_reencode_data_parallel(tmp_path, small_gen, rng):
    """Data-parallel CheckpointReencoder over the 8-device CPU mesh must
    match the single-device result, including non-multiple batch sizes."""
    import yaml

    from mqgan_tpu.deploy.reencode import CheckpointReencoder
    from mqgan_tpu.utils.checkpoint import save_generator_only

    gen, params = small_gen
    ckpt = save_generator_only(str(tmp_path), params["params"], "gen_dp")
    cfg = {
        "model": {
            "mel_channels": MEL,
            "generator": {
                "channels": [8, 12], "kernel_sizes": [3], "dropout": 0.0,
                "fsq_levels": [8, 5, 5, 5], "refiner_base_channels": 4,
                "refiner_depth": 2,
            },
        },
        "data": {"crop_len": [32]},
    }
    cfg_path = tmp_path / "cfg_dp.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    single = CheckpointReencoder(str(cfg_path), ckpt, buckets=(32, 64))
    dp = CheckpointReencoder(str(cfg_path), ckpt, buckets=(32, 64),
                             data_parallel=True)
    assert dp._n_dev == 8

    spec = rng.standard_normal((5, 40, MEL)).astype(np.float32)  # 5 % 8 != 0
    idx_s = single.encode(spec)
    idx_d = dp.encode(spec)
    assert idx_d.shape == (5, 40)
    np.testing.assert_array_equal(idx_s, idx_d)
    out_s = single.decode(idx_s)
    out_d = dp.decode(idx_d)
    np.testing.assert_allclose(out_s, out_d, atol=1e-5)


def test_reencode_seq_parallel(tmp_path, small_gen, rng):
    """seq_parallel=True CheckpointReencoder: decode's time axis sharded
    over the 8-device CPU mesh must match the single-device bucket path,
    and must accept sequences LONGER than the largest bucket (seqpar pads
    to its own grid instead of the bucket grid)."""
    import yaml

    from mqgan_tpu.deploy.reencode import CheckpointReencoder
    from mqgan_tpu.utils.checkpoint import save_generator_only

    gen, params = small_gen
    ckpt = save_generator_only(str(tmp_path), params["params"], "gen_sp")
    cfg = {
        "model": {
            "mel_channels": MEL,
            "generator": {
                "channels": [8, 12], "kernel_sizes": [3], "dropout": 0.0,
                "fsq_levels": [8, 5, 5, 5], "refiner_base_channels": 4,
                "refiner_depth": 2,
            },
        },
        "data": {"crop_len": [32]},
    }
    cfg_path = tmp_path / "cfg_sp.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    with pytest.raises(ValueError, match="mutually exclusive"):
        CheckpointReencoder(str(cfg_path), ckpt, buckets=(32, 64),
                            data_parallel=True, seq_parallel=True)

    single = CheckpointReencoder(str(cfg_path), ckpt, buckets=(32, 64))
    sp = CheckpointReencoder(str(cfg_path), ckpt, buckets=(32, 64),
                             seq_parallel=True)

    spec = rng.standard_normal((2, 40, MEL)).astype(np.float32)
    lens = np.asarray([40, 23], np.int32)
    idx = single.encode(spec, lens)
    out_s = single.decode(idx, lens)
    out_p = sp.decode(idx, lens)
    assert out_p.shape == out_s.shape
    for r in range(2):
        np.testing.assert_allclose(out_p[r, : lens[r]], out_s[r, : lens[r]],
                                   atol=1e-5)

    # full pipeline (encode+FSQ+decode per window): with 40 valid frames
    # every window that keeps a valid frame spans ALL valid frames, so the
    # encoder's CBAM stats equal the full pass — tokens exactly match the
    # single-device bucket path, mel to float tolerance
    idx_p, out_pp = sp.reencode(spec, lens)
    out_ss = single.decode(idx, lens)
    for r in range(2):
        np.testing.assert_array_equal(idx_p[r, : lens[r]], idx[r, : lens[r]])
        np.testing.assert_allclose(out_pp[r, : lens[r]],
                                   out_ss[r, : lens[r]], atol=1e-5)
    np.testing.assert_array_equal(sp.encode(spec, lens), idx_p)

    # longer than the largest bucket: the bucket path can't represent this
    # in one dispatch; the seq-parallel path decodes it exactly in one
    long_idx = np.asarray(rng.integers(0, 1000, (1, 100)), np.int32)
    out_long = sp.decode(long_idx)
    assert out_long.shape == (1, 100, MEL)
    assert np.isfinite(out_long).all()

    # ... and re-encodes arbitrary-length mel in one sharded dispatch,
    # with no host-side chunk plan (unbounded_length advertises this)
    assert sp.unbounded_length and not single.unbounded_length
    long_spec = rng.standard_normal((1, 300, MEL)).astype(np.float32)
    idx_long, out_long2 = sp.reencode(long_spec)
    assert idx_long.shape == (1, 300) and out_long2.shape == (1, 300, MEL)
    assert np.isfinite(out_long2).all()


def test_fused_reencode_artifact(export_dir, rng):
    """The fused reencode program matches separate encode->decode exactly."""
    from mqgan_tpu.deploy.runtime import ExportedPreEncoder

    rt = ExportedPreEncoder(export_dir)
    assert rt._ree, "fused reencode artifacts missing from export"
    spec = rng.standard_normal((2, 40, MEL)).astype(np.float32)
    lengths = np.array([40, 33], np.int32)
    idx_f, out_f = rt.reencode(spec, lengths)
    idx_s = rt.encode(spec, lengths)
    out_s = rt.decode(idx_s, lengths)
    np.testing.assert_array_equal(idx_f, idx_s)
    np.testing.assert_allclose(out_f, out_s, atol=1e-5)


def test_streaming_from_runtime_uses_manifest_halos(tmp_path, rng):
    """The exported manifest carries decoder_halos + halo_align and
    StreamingDecoder.from_runtime consumes them (not a flagship fallback);
    warm-up feeds return correctly-shaped (0, mel) arrays so callers can
    np.concatenate every chunk; the streamed output matches the runtime's
    offline decode exactly."""
    from mqgan_tpu.core.chunking import decoder_halos, halo_align
    from mqgan_tpu.deploy.export import export_preencoder
    from mqgan_tpu.deploy.runtime import ExportedPreEncoder
    from mqgan_tpu.deploy.streaming import StreamingDecoder

    # depth-1 refiner: small halos so the 64-frame bucket fits them
    gen = PreEncoder(
        mel_channels=MEL, channels=(8, 12), kernel_sizes=(3,),
        fsq_levels=(8, 5, 5, 5), dropout=0.0,
        refiner_base_channels=4, refiner_depth=1,
    )
    mel = jnp.zeros((1, 32, MEL), jnp.float32)
    params = gen.init(jax.random.key(0), mel, jnp.full((1,), 32, jnp.int32))
    out = str(tmp_path / "exp")
    export_preencoder(gen, params, out, buckets=(64,),
                      config_dict={"mel_channels": MEL}, verify=False)

    rt = ExportedPreEncoder(out)
    want_halos = decoder_halos((3,), 1)
    assert rt.decoder_halos == want_halos
    assert rt.halo_align == halo_align(1) == 2

    sd = StreamingDecoder.from_runtime(rt)
    assert (sd.halo_l, sd.halo_r) == want_halos
    assert sd.align == 2 and sd.window == 64

    toks = rng.integers(0, 1000, size=(50,)).astype(np.int32)
    chunks = [sd.feed(toks[i: i + 7]) for i in range(0, 50, 7)]
    assert all(c.ndim == 2 and c.shape[1] == MEL for c in chunks), (
        "warm-up chunks must already be (0, mel)")
    streamed = np.concatenate(chunks + [sd.flush()], axis=0)
    offline = np.asarray(
        rt.decode(toks[None, :], np.array([50], np.int32)))[0]
    assert streamed.shape == offline.shape == (50, MEL)
    np.testing.assert_allclose(streamed, offline, atol=1e-5)


def test_checkpoint_reencode_poly_default(tmp_path, small_gen, rng):
    """The serving default is poly_mixers='decode' (VERDICT r4 #6:
    recommended == default): tokens are BIT-IDENTICAL to the exact-mixer
    path, decode deviates only at interpolation level, --exact_mixers
    opts out, and seq_parallel forces exact (per-window Chebyshev fits
    would break its exact-vs-full contract)."""
    import yaml

    from mqgan_tpu.deploy.reencode import CheckpointReencoder
    from mqgan_tpu.utils.checkpoint import save_generator_only

    gen, params = small_gen
    ckpt = save_generator_only(str(tmp_path), params["params"], "gen")
    cfg = {
        "model": {
            "mel_channels": MEL,
            "generator": {
                "channels": [8, 12], "kernel_sizes": [3], "dropout": 0.0,
                "fsq_levels": [8, 5, 5, 5], "refiner_base_channels": 4,
                "refiner_depth": 2,
            },
        },
        "data": {"crop_len": [32]},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    default = CheckpointReencoder(str(cfg_path), ckpt, buckets=(32,))
    exact = CheckpointReencoder(str(cfg_path), ckpt, buckets=(32,),
                                poly_mixers=False)
    assert default._gen.poly_mixers == "decode"
    assert exact._gen.poly_mixers is False

    spec = rng.standard_normal((2, 32, MEL)).astype(np.float32)
    toks_d, out_d = default.reencode(spec)
    toks_e, out_e = exact.reencode(spec)
    np.testing.assert_array_equal(toks_d, toks_e)  # the parity gate
    # decode carries interpolation-level deviation only (not identical,
    # not large): bound relative to the exact output's range
    dev = np.abs(out_d - out_e).max() / (np.abs(out_e).max() + 1e-9)
    assert dev < 0.05, dev

    sp = CheckpointReencoder(str(cfg_path), ckpt, buckets=(32,),
                             seq_parallel=True)
    assert sp._gen.poly_mixers is False
