"""Trainable iSTFTNet-style vocoder: shapes, FE integration, MR-STFT loss,
and a gradient-descent smoke (loss decreases on one clip)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from mqgan_tpu.losses.stft_loss import multi_resolution_stft_loss
from mqgan_tpu.models.istft_vocoder import ISTFTNetGenerator, build_vocoder_fe

N_MELS = 16
T_FRAMES = 12


@pytest.fixture(scope="module")
def small_gen():
    gen = ISTFTNetGenerator(
        n_mels=N_MELS, upsample_rates=(4, 4), upsample_kernel_sizes=(9, 9),
        upsample_initial_channel=32, istft_n_fft=8,
        resblock_kernel_sizes=(3,), resblock_dilations=(1, 2),
    )
    mel = jnp.zeros((2, N_MELS, T_FRAMES))
    params = gen.init(jax.random.key(0), mel)
    return gen, params


def test_generator_shapes(small_gen, rng):
    gen, params = small_gen
    mel = jnp.asarray(rng.standard_normal((2, N_MELS, T_FRAMES)).astype(np.float32))
    spec, phase = gen.apply(params, mel)
    t_up = T_FRAMES * 16  # 4*4
    assert spec.shape == (2, 5, t_up)  # 8//2+1 freq bins
    assert phase.shape == (2, 5, t_up)
    assert float(jnp.min(spec)) > 0  # exp head
    assert float(jnp.max(jnp.abs(phase))) <= np.pi + 1e-5
    assert np.isfinite(np.asarray(spec)).all()


def test_vocoder_fe_integration(small_gen, rng):
    """Generator + TPUSTFT through the reference-compatible wrapper yields
    waveforms at hop = prod(upsample) * istft_hop samples per frame."""
    gen, params = small_gen
    istft_hop = 2
    fe = build_vocoder_fe(gen, params, istft_hop=istft_hop)
    mel = jnp.asarray(rng.standard_normal((1, N_MELS, T_FRAMES)).astype(np.float32))
    wav = fe(mel)
    assert wav.shape[0] == 1 and wav.shape[1] == 1
    # samples ~= frames * total_hop (istft trims n_fft//2 each side)
    total_hop = 16 * istft_hop
    assert abs(wav.shape[2] - T_FRAMES * total_hop) <= gen.istft_n_fft
    pcm = fe.infer(mel)
    assert pcm.dtype == np.int16
    # CPU-pinned inverse STFT variant (reference infer_cpuistft,
    # istftnetfe.py:19-30) matches the default path
    pcm_cpu = fe.infer_cpuistft(mel)
    assert pcm_cpu.dtype == np.int16
    np.testing.assert_allclose(pcm_cpu, pcm, atol=1)


def test_mr_stft_loss_properties(rng):
    x = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    res = ((256, 64, 256), (512, 128, 512))
    self_loss = float(multi_resolution_stft_loss(x, x, res))
    cross_loss = float(multi_resolution_stft_loss(x, y, res))
    assert self_loss < 1e-4
    assert cross_loss > self_loss
    # differentiable
    g = jax.grad(lambda a: multi_resolution_stft_loss(a, y, res))(x)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0


@pytest.mark.slow
def test_vocoder_trains(small_gen, rng):
    """A few Adam steps on one target clip must reduce the MR-STFT loss —
    gradients flow end-to-end through generator + iSTFT."""
    gen, params = small_gen
    istft_hop = 2
    from mqgan_tpu.signal.stft import istft

    mel = jnp.asarray(rng.standard_normal((1, N_MELS, T_FRAMES)).astype(np.float32))
    t = np.arange(T_FRAMES * 32 - 8) / 100.0
    target = jnp.asarray((0.3 * np.sin(2 * np.pi * 5 * t))[None].astype(np.float32))

    res = ((64, 16, 64), (128, 32, 128))

    def loss_fn(p):
        spec, phase = gen.apply(p, mel)
        wav = istft(spec, phase, gen.istft_n_fft, istft_hop, gen.istft_n_fft)[:, 0, :]
        n = min(wav.shape[1], target.shape[1])
        return multi_resolution_stft_loss(wav[:, :n], target[:, :n], res)

    tx = optax.adam(2e-3)
    opt = tx.init(params)
    losses = []

    @jax.jit
    def step(p, o):
        l, g = jax.value_and_grad(loss_fn)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    p = params
    for i in range(30):
        p, opt, l = step(p, opt)
        losses.append(float(l))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, (losses[0], losses[-1])


@pytest.mark.slow
def test_vocoder_trainer_cli(tmp_path, rng):
    import wave as wave_mod

    from mqgan_tpu.train.vocoder_trainer import main as voc_main

    sr = 16000
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    for i in range(3):
        t = np.arange(sr) / sr
        x = 0.3 * np.sin(2 * np.pi * (200 + 100 * i) * t)
        pcm = (x * 32767).astype(np.int16)
        with wave_mod.open(str(wav_dir / f"c{i}.wav"), "wb") as w:
            w.setnchannels(1); w.setsampwidth(2); w.setframerate(sr)
            w.writeframes(pcm.tobytes())

    spec = tmp_path / "spec.yaml"
    spec.write_text(f"""
io: {{input_folder: x, output_folder: y, audio_extensions: [".wav"]}}
spectrogram:
  sampling_rate: {sr}
  filter_length: 256
  hop_length: 64
  win_length: 256
  n_mel_channels: {N_MELS}
  mel_fmin: 0.0
  mel_fmax: 8000.0
""")
    out = tmp_path / "run"
    export_dir = tmp_path / "voc_export"
    voc_main([
        "--wav_dir", str(wav_dir), "--spec_config", str(spec),
        "--out_dir", str(out), "--steps", "12", "--batch_size", "2",
        "--segment_frames", "16", "--upsample_rates", "4", "4",
        "--istft_n_fft", "8", "--upsample_initial_channel", "16",
        "--log_every", "4", "--save_every", "12",
        "--export_dir", str(export_dir),
    ])
    import json

    with open(out / "vocoder_metrics.jsonl") as f:
        recs = [json.loads(l) for l in f]
    losses = [r["vocoder/loss"] for r in recs if "vocoder/loss" in r]
    assert losses and all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # learning
    assert any(p.startswith("vocoder_step_") for p in os.listdir(out))

    # the exported artifact vocodes arbitrary lengths (symbolic b, t)
    from mqgan_tpu.signal.vocoder import ISTFTNetFE

    fe = ISTFTNetFE.load_ts(str(export_dir))
    assert fe.sampling_rate == sr
    for t_frames in (10, 23):
        wav = fe(rng.standard_normal((1, N_MELS, t_frames)).astype(np.float32))
        assert wav.shape[0:2] == (1, 1)
        assert np.isfinite(np.asarray(wav)).all()


@pytest.mark.slow
def test_vocoder_trainer_adversarial(tmp_path, rng):
    """Adversarial stage: MPD/MSD join after adv_start_step; losses finite
    and logged."""
    import json
    import wave as wave_mod

    from mqgan_tpu.train.vocoder_trainer import main as voc_main

    sr = 16000
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    t = np.arange(sr) / sr
    x = 0.3 * np.sin(2 * np.pi * 330 * t)
    with wave_mod.open(str(wav_dir / "c.wav"), "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(sr)
        w.writeframes((x * 32767).astype(np.int16).tobytes())

    spec = tmp_path / "spec.yaml"
    spec.write_text(f"""
io: {{input_folder: x, output_folder: y, audio_extensions: [".wav"]}}
spectrogram:
  sampling_rate: {sr}
  filter_length: 256
  hop_length: 64
  win_length: 256
  n_mel_channels: {N_MELS}
  mel_fmin: 0.0
  mel_fmax: 8000.0
""")
    out = tmp_path / "run_adv"
    voc_main([
        "--wav_dir", str(wav_dir), "--spec_config", str(spec),
        "--out_dir", str(out), "--steps", "6", "--batch_size", "2",
        "--segment_frames", "16", "--upsample_rates", "4", "4",
        "--istft_n_fft", "8", "--upsample_initial_channel", "16",
        "--log_every", "1", "--save_every", "6",
        "--adversarial", "--adv_start_step", "3",
        "--mpd_periods", "2", "3", "--msd_scales", "2",
    ])
    with open(out / "vocoder_metrics.jsonl") as f:
        recs = [json.loads(l) for l in f]
    adv_recs = [r for r in recs if "vocoder/d_loss" in r]
    assert adv_recs, "adversarial stage never engaged"
    for r in adv_recs:
        assert np.isfinite(r["vocoder/d_loss"])
        assert np.isfinite(r["vocoder/adv"])
        assert np.isfinite(r["vocoder/fm"])
