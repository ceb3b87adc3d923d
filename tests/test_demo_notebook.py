"""The notebook-form demo (examples/audio_reconstruction_demo.ipynb)
actually executes: cells run top-to-bottom against a synthesized wav and
a random tiny codec (the notebook's smoke mode), producing finite
reconstructions — the interactive twin of the reference
audio_reconstruction_demo.ipynb, with the script form tested elsewhere."""

import json
import os
import wave

import numpy as np
import pytest


@pytest.fixture()
def demo_env(tmp_path, monkeypatch):
    sr, mel = 22050, 20
    audio = tmp_path / "audio"
    audio.mkdir()
    rng = np.random.default_rng(0)
    t = np.arange(int(sr * 1.2)) / sr
    x = sum(0.2 * np.sin(2 * np.pi * f * t + p)
            for f, p in ((220, 0.0), (931, 1.1), (2217, 2.3)))
    x = x + 0.01 * rng.standard_normal(t.shape)
    pcm = (np.clip(x, -1, 1) * 32767).astype(np.int16)
    with wave.open(str(audio / "demo.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())

    spec = tmp_path / "spec.yaml"
    spec.write_text(f"""
io:
  input_folder: {audio}
  output_folder: {tmp_path / 'mels'}
spectrogram:
  sampling_rate: {sr}
  filter_length: 1024
  hop_length: 256
  win_length: 1024
  n_mel_channels: {mel}
""")
    model = tmp_path / "model.yaml"
    model.write_text(f"""
model:
  mel_channels: {mel}
  generator:
    channels: [8, 12]
    kernel_sizes: [3]
    fsq_levels: [8, 5, 5]
    refiner_base_channels: 4
    refiner_depth: 2
""")
    monkeypatch.setenv("MQGAN_DEMO_AUDIO", str(audio))
    monkeypatch.setenv("MQGAN_DEMO_RANDOM_CONFIG", str(model))
    monkeypatch.setenv("MQGAN_DEMO_SPEC", str(spec))
    monkeypatch.setenv("MQGAN_DEMO_MAX_FILES", "1")
    monkeypatch.delenv("MQGAN_DEMO_CODEC", raising=False)
    monkeypatch.delenv("MQGAN_DEMO_VOCODER", raising=False)
    monkeypatch.setenv("MPLBACKEND", "Agg")


def test_notebook_cells_execute(demo_env):
    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "audio_reconstruction_demo.ipynb")
    with open(path) as f:
        nb = json.load(f)
    code_cells = [c for c in nb["cells"] if c["cell_type"] == "code"]
    assert len(code_cells) == 4  # reference notebook structure
    ns = {}
    for i, cell in enumerate(code_cells):
        src = "".join(cell["source"])
        exec(compile(src, f"<cell {i + 1}>", "exec"), ns)  # noqa: S102
    results = ns["demo_results"]
    assert len(results) == 1
    assert np.isfinite(results[0]["mse"])
    assert results[0]["n_tokens"] > 0
