"""Vocoder feature-extractor wrapper — the ISTFTNetFE equivalent.

Behavioral spec (reference istftnetfe.py:6-79 / feature_extractors.py:10-84):
wraps an *external* iSTFTNet-style generator (mel -> (spec, phase); the
network itself ships separately, reference README.md:153-155) together with
an inverse STFT to produce waveforms:

  forward: wav = istft(gen(mel))
  infer:   int16 PCM via x 32768
  export_ts/load_ts: artifact + JSON config round-trip

The generator is any callable mel(B, n_mels, T) -> (spec, phase) each
(B, F, T): a jitted flax apply, a deserialized StableHLO artifact, or a test
stub. export/load use jax.export, mirroring the TorchScript flow.
"""

from __future__ import annotations

import json
import os
from typing import Callable

import numpy as np

from mqgan_tpu.signal.stft import TPUSTFT

MAX_WAV_VALUE = 32768.0  # reference istftnetfe.py:4


class ISTFTNetFE:
    def __init__(self, gen: Callable | None, stft: TPUSTFT | None):
        self.gen = gen
        self.stft = stft
        self.sampling_rate = None

    def __call__(self, mel):
        spec, phase = self.gen(mel)
        return self.stft.inverse(spec, phase)  # (B, 1, samples)

    forward = __call__

    def infer(self, mel) -> np.ndarray:
        """mel -> int16 PCM (reference istftnetfe.py:12-17)."""
        wav = np.asarray(self(mel)).squeeze()
        return (wav * MAX_WAV_VALUE).astype(np.int16)

    def infer_cpuistft(self, mel) -> np.ndarray:
        """mel -> int16 PCM with the inverse STFT pinned to the host CPU
        (reference istftnetfe.py:19-30): the generator runs on whatever
        device it is bound to; spec/phase come back to the host and the
        OLA runs on a CPU-placed jit — useful when the accelerator should
        only hold the network, or for exact-fp32 synthesis tails."""
        import jax

        spec, phase = self.gen(mel)
        cpu = jax.devices("cpu")[0]
        spec = jax.device_put(np.asarray(spec), cpu)
        phase = jax.device_put(np.asarray(phase), cpu)
        with jax.default_device(cpu):
            wav = np.asarray(self.stft.inverse(spec, phase)).squeeze()
        return (wav * MAX_WAV_VALUE).astype(np.int16)

    # -- artifact round-trip (reference export_ts/load_ts, :39-79) --------
    def export_ts(self, out_dir: str, sampling_rate: int, mel_channels: int = 160,
                  example_frames: int = 600):
        """example_frames is kept for reference-API compatibility; the
        artifact is batch- AND length-polymorphic (symbolic b, t)."""
        del example_frames
        import jax
        import jax.numpy as jnp
        from jax import export as jexport

        os.makedirs(out_dir, exist_ok=True)
        b, t = jexport.symbolic_shape("b, t")
        exp = jexport.export(jax.jit(self.gen), platforms=("cpu", "tpu"))(
            jax.ShapeDtypeStruct((b, mel_channels, t), jnp.float32)
        )
        with open(os.path.join(out_dir, "istft_gen.shlo"), "wb") as f:
            f.write(exp.serialize())
        cfg = {
            "gen_istft_n_fft": self.stft.filter_length,
            "gen_istft_hop_size": self.stft.hop_length,
            "gen_istft_win_length": self.stft.win_length,
            "sampling_rate": sampling_rate,
            "mel_channels": mel_channels,
        }
        with open(os.path.join(out_dir, "config.json"), "w") as f:
            json.dump(cfg, f)
        return out_dir

    @classmethod
    def load_ts(cls, in_dir: str) -> "ISTFTNetFE":
        from jax import export as jexport

        with open(os.path.join(in_dir, "config.json")) as f:
            cfg = json.load(f)
        with open(os.path.join(in_dir, "istft_gen.shlo"), "rb") as f:
            exp = jexport.deserialize(f.read())
        stft = TPUSTFT(
            filter_length=cfg["gen_istft_n_fft"],
            hop_length=cfg["gen_istft_hop_size"],
            win_length=cfg.get("gen_istft_win_length", cfg["gen_istft_n_fft"]),
        )
        fe = cls(gen=exp.call, stft=stft)
        fe.sampling_rate = cfg["sampling_rate"]
        return fe
