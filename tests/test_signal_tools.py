"""Tests for the data-prep tooling: audio IO/resample, convert CLI, QC."""

import os
import wave

import numpy as np
import pytest

from mqgan_tpu.signal.audio import UnsupportedFormatError, load_audio, resample, to_mono
from mqgan_tpu.signal.qc import mel_qc, scan_and_move


def write_wav(path, data_f32, sr):
    pcm = (np.clip(data_f32, -1, 1) * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(pcm.shape[0])
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.T.tobytes())


def test_load_audio_wav(tmp_path, rng):
    sr = 16000
    data = np.clip(
        rng.standard_normal((1, sr * 2)).astype(np.float32) * 0.3, -1, 1
    )
    p = tmp_path / "x.wav"
    write_wav(p, data, sr)
    wav, got_sr = load_audio(str(p))
    assert got_sr == sr
    assert wav.shape == data.shape
    np.testing.assert_allclose(wav, data, atol=1e-3)

    with pytest.raises(UnsupportedFormatError):
        (tmp_path / "y.mp3").write_bytes(b"xx")
        load_audio(str(tmp_path / "y.mp3"))


def test_resample_sine_preserves_frequency():
    sr, new_sr, f = 48000, 16000, 440.0
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * f * t)[None, :].astype(np.float32)
    y = resample(x, sr, new_sr)
    assert abs(y.shape[1] - new_sr) <= 1
    # dominant frequency preserved
    spec = np.abs(np.fft.rfft(y[0]))
    peak = np.argmax(spec) * new_sr / y.shape[1]
    assert abs(peak - f) < 2.0

    m = to_mono(np.stack([x[0], -x[0]]))
    assert m.shape[0] == 1
    assert np.abs(m).max() < 1e-6


def test_convert_cli_end_to_end(tmp_path, rng):
    from mqgan_tpu.signal.convert import main as convert_main

    sr = 16000
    src = tmp_path / "audio" / "genre"
    src.mkdir(parents=True)
    # valid 2s clip
    write_wav(src / "good.wav", rng.standard_normal((1, sr * 2)) * 0.2, sr)
    # too short (<1s) -> gated out
    write_wav(src / "short.wav", rng.standard_normal((1, sr // 2)) * 0.2, sr)
    # wrong-rate clip -> resampled
    write_wav(src / "rate.wav", rng.standard_normal((1, 44100)) * 0.2, 22050)

    cfg = tmp_path / "spec.yaml"
    cfg.write_text(f"""
io:
  input_folder: {tmp_path / 'audio'}
  output_folder: {tmp_path / 'mels'}
  audio_extensions: [".wav"]
spectrogram:
  sampling_rate: {sr}
  filter_length: 512
  hop_length: 128
  win_length: 512
  n_mel_channels: 40
  mel_fmin: 0.0
  mel_fmax: 8000.0
""")
    convert_main(["--config", str(cfg), "--num_workers", "1"])

    out = tmp_path / "mels" / "genre"
    assert (out / "good_mel.npy").exists()
    assert not (out / "short_mel.npy").exists()
    assert (out / "rate_mel.npy").exists()

    mel = np.load(out / "good_mel.npy")
    assert mel.shape == (sr * 2 // 128 + 1, 40)
    # log-clamped range
    assert mel.min() >= np.log(1e-5) - 1e-5
    # resume-skip: rerun leaves mtime unchanged
    mtime = os.path.getmtime(out / "good_mel.npy")
    convert_main(["--config", str(cfg), "--num_workers", "1"])
    assert os.path.getmtime(out / "good_mel.npy") == mtime


def test_mel_qc_heuristics(rng):
    # healthy mel: log of smoothed noise
    good = np.log(np.clip(np.abs(
        rng.standard_normal((200, 80)) + np.sin(np.arange(200))[:, None]
    ), 1e-5, None)).astype(np.float32)
    bad_flags, rep = mel_qc(good)
    assert not bad_flags, rep["reasons"]

    # constant mel: rank1 + no flux + static centroid -> bad
    const = np.full((200, 80), -3.0, np.float32)
    bad_flags, rep = mel_qc(const)
    assert bad_flags and len(rep["reasons"]) > 1

    # NaN -> bad
    nan = good.copy()
    nan[5, 5] = np.nan
    assert mel_qc(nan)[0]

    # out-of-range -> bad
    assert mel_qc(good + 100.0)[0]

    # 1-D -> bad
    assert mel_qc(np.zeros(10, np.float32))[0]

    # transposed input is handled
    _, rep = mel_qc(good.T)
    assert rep.get("transposed")


def test_scan_and_move(tmp_path, rng):
    src = tmp_path / "src" / "sub"
    src.mkdir(parents=True)
    good = np.log(np.clip(np.abs(
        rng.standard_normal((200, 80)) + np.sin(np.arange(200))[:, None]
    ), 1e-5, None)).astype(np.float32)
    np.save(src / "good.npy", good)
    np.save(src / "bad.npy", np.full((100, 80), -3.0, np.float32))
    (src / "broken.npy").write_bytes(b"junk")

    stats = scan_and_move(
        tmp_path / "src", tmp_path / "bad", tmp_path / "report.csv"
    )
    assert stats == {"total": 3, "bad": 2}
    assert (src / "good.npy").exists()
    assert not (src / "bad.npy").exists()
    assert (tmp_path / "bad" / "bad.npy").exists()
    assert (tmp_path / "bad" / "broken.npy").exists()
    report = (tmp_path / "report.csv").read_text()
    assert "load_error" in report and "bad.npy" in report
