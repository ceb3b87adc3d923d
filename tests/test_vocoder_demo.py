"""Griffin-Lim fallback vocoder + end-to-end demo script tests."""

import os
import subprocess
import sys
import wave

import numpy as np
import pytest

import jax.numpy as jnp

from mqgan_tpu.core.config import SpectrogramConfig
from mqgan_tpu.signal.griffin_lim import GriffinLimVocoder, griffin_lim, mel_pseudo_inverse
from mqgan_tpu.signal.mel import MelFrontend
from mqgan_tpu.signal.stft import stft


def test_griffin_lim_recovers_sine():
    sr, n_fft, hop = 16000, 512, 128
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None]
    mag = jnp.abs(stft(jnp.asarray(x), n_fft, hop, n_fft))
    wav = np.asarray(griffin_lim(mag, n_fft, hop, n_fft, n_iter=16))[0, 0]

    spec = np.abs(np.fft.rfft(wav[2000:14000]))
    peak_hz = spec.argmax() * sr / len(wav[2000:14000])
    assert abs(peak_hz - 440) < 8, peak_hz
    # energy concentrated at the peak
    assert spec.max() > 10 * np.median(spec)


def test_mel_roundtrip_through_griffin_lim():
    cfg = SpectrogramConfig(
        sampling_rate=16000, filter_length=512, hop_length=128,
        win_length=512, n_mel_channels=80, mel_fmin=0.0, mel_fmax=8000.0,
    )
    inv = mel_pseudo_inverse(cfg)
    assert inv.shape == (80, 257)

    t = np.arange(16000) / 16000
    x = (0.4 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    mel = MelFrontend(cfg)(jnp.asarray(x))
    voc = GriffinLimVocoder(cfg, n_iter=8)
    wav = np.asarray(voc(mel))
    assert wav.shape[0:2] == (1, 1)
    assert np.isfinite(wav).all()
    # dominant frequency survives mel -> linear -> phase recovery
    w = wav[0, 0]
    spec = np.abs(np.fft.rfft(w))
    peak_hz = spec.argmax() * 16000 / len(w)
    assert abs(peak_hz - 300) < 15, peak_hz


@pytest.mark.slow
def test_demo_script_end_to_end(tmp_path):
    rng = np.random.default_rng(0)
    sr = 16000
    t = np.arange(int(sr * 1.5)) / sr
    x = 0.4 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.standard_normal(len(t))
    pcm = (np.clip(x, -1, 1) * 32767).astype(np.int16)
    wav_in = tmp_path / "in.wav"
    with wave.open(str(wav_in), "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(sr)
        w.writeframes(pcm.tobytes())

    spec_yaml = tmp_path / "spec.yaml"
    spec_yaml.write_text(f"""
io: {{input_folder: x, output_folder: y, audio_extensions: [".wav"]}}
spectrogram:
  sampling_rate: {sr}
  filter_length: 512
  hop_length: 128
  win_length: 512
  n_mel_channels: 32
  mel_fmin: 0.0
  mel_fmax: 8000.0
""")
    model_yaml = tmp_path / "model.yaml"
    model_yaml.write_text("""
model:
  mel_channels: 32
  generator:
    channels: [16, 24]
    kernel_sizes: [3]
    dropout: 0.0
    fsq_levels: [8, 5, 5, 5]
    refiner_base_channels: 8
    refiner_depth: 2
data: {crop_len: [64]}
""")
    out_wav = tmp_path / "out.wav"
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, "/root/repo/examples/audio_reconstruction_demo.py",
         "--wav", str(wav_in), "--out", str(out_wav),
         "--spec_config", str(spec_yaml), "--random",
         "--config", str(model_yaml), "--gl_iters", "4"],
        capture_output=True, text=True, env=env, timeout=560,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "tokens:" in res.stdout and "wrote" in res.stdout
    assert out_wav.exists()
    with wave.open(str(out_wav)) as w:
        assert w.getframerate() == sr
        assert w.getnframes() > sr  # ~1.5s survived
