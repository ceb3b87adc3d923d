"""Typed configuration for mqgan_tpu.

Loads the exact YAML schemas shipped by the reference (spec-config:
/root/reference/configs/spec_config_hifispeech.yaml:1-17; model-config:
/root/reference/configs/model_config_hifispeech.yaml:1-58) into frozen
dataclasses so every downstream component gets static, hashable shape
information — a requirement for XLA compilation caching.

Note on loss weights: the reference configs set `recon_lambda: 15.0` but the
training code reads `recon_lambda_pre` / `recon_lambda_post` with defaults
1.0 / 2.0 (reference train.py:479-482), so the configured value is dead. We
reproduce the *effective* behaviour and accept the same keys.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Mapping, Sequence

import yaml


def _tuple(x) -> tuple:
    if x is None:
        return ()
    if isinstance(x, (list, tuple)):
        return tuple(_tuple(v) if isinstance(v, (list, tuple)) else v for v in x)
    return (x,)


@dataclass(frozen=True)
class SpectrogramConfig:
    """Mirrors reference spec_config `spectrogram` section."""

    sampling_rate: int = 44100
    filter_length: int = 2048  # n_fft
    hop_length: int = 512
    win_length: int = 2048
    n_mel_channels: int = 128
    mel_fmin: float = 0.0
    mel_fmax: float = 22050.0
    target_amplitude: float = 0.95

    @property
    def n_freqs(self) -> int:
        return self.filter_length // 2 + 1


@dataclass(frozen=True)
class IOConfig:
    input_folder: str = "data/input_audio"
    output_folder: str = "data/spectrograms"
    audio_extensions: tuple = (
        ".wav", ".mp3", ".flac", ".aac", ".ogg", ".m4a", ".wma",
        ".aif", ".aiff", ".opus", ".amr",
    )


@dataclass(frozen=True)
class SpecConfig:
    io: IOConfig = field(default_factory=IOConfig)
    spectrogram: SpectrogramConfig = field(default_factory=SpectrogramConfig)

    @staticmethod
    def from_dict(d: Mapping[str, Any]) -> "SpecConfig":
        io_d = dict(d.get("io", {}))
        if "audio_extensions" in io_d:
            io_d["audio_extensions"] = _tuple(io_d["audio_extensions"])
        spec_d = dict(d.get("spectrogram", {}))
        return SpecConfig(io=IOConfig(**io_d), spectrogram=SpectrogramConfig(**spec_d))

    @staticmethod
    def from_yaml(path: str) -> "SpecConfig":
        with open(path) as f:
            return SpecConfig.from_dict(yaml.safe_load(f))

    def validate(self) -> None:
        """Required-key check, mirroring reference convert_spectrograms.py:78-88."""
        s = self.spectrogram
        if s.filter_length <= 0 or s.hop_length <= 0 or s.win_length <= 0:
            raise ValueError("filter_length/hop_length/win_length must be positive")
        if s.win_length > s.filter_length:
            raise ValueError("win_length must be <= filter_length")
        if s.n_mel_channels <= 0:
            raise ValueError("n_mel_channels must be positive")
        if not self.io.audio_extensions:
            raise ValueError("audio_extensions must be non-empty")


@dataclass(frozen=True)
class GeneratorConfig:
    channels: tuple = (512, 512, 512, 768)
    kernel_sizes: tuple = (3, 3, 5, 7)
    dropout: float = 0.1
    fsq_levels: tuple = (8, 5, 5, 5)
    # training-time FSQ noise dropout (reference quantizer.py:64,142-162;
    # defaults off like the reference PreEncoder usage) — a codebook-collapse
    # mitigation: per-sample skip-quantize / uniform-offset noise
    fsq_noise_dropout: float = 0.0
    refiner_base_channels: int = 64
    refiner_depth: int = 3
    refiner_hidden_proj_divisor: int = 8
    # rematerialize mixer/refiner activations in the backward pass: trades
    # ~one extra forward through those modules for the memory that otherwise
    # blocks large-batch training (B=64 flagship OOMs without it)
    remat: bool = False
    # additionally recompute each refiner ConvBlock in the backward (stores
    # only block inputs). The flagship never needs it (and it measured
    # slower at equal batch, benchmarks/README.md round 2); bigger refiners
    # do — hifimusic (160 mels, base 96) B=64 OOMs on refiner feature-map
    # temps (18.31G of 15.75G HBM) even with the chunked mixers
    remat_refiner: bool = False
    # EXPERIMENTAL: moment-matched Gaussian dropout on the mel-mixer hiddens
    # (fast-dropout, Wang & Manning 2013): instead of Bernoulli-masking the
    # (B, T, mel, channels[0]) hidden (4.29G draws per flagship mixer call,
    # redrawn in the checkpointed backward), add N(0,1)-scaled noise with
    # the exact dropout mean/variance to the contraction output — 512x
    # fewer random draws. Changes the regularization noise distribution
    # (not the reference's dropout); off by default.
    fast_dropout: bool = False
    # time-chunk size for the checkpointed mixer-hidden evaluation under
    # remat (nn/mixer2d.py hidden_chunk_t). Larger chunks cut lax.map
    # serialization overhead in the backward at the cost of a bigger
    # per-chunk hidden ((B, chunk, mel, channels[0]) bf16)
    mixer_chunk_t: int = 32

    @property
    def codebook_size(self) -> int:
        size = 1
        for level in self.fsq_levels:
            size *= level
        return size

    @property
    def bos_token_id(self) -> int:
        # reference preencoder.py:340
        return self.codebook_size + 1

    @property
    def eos_token_id(self) -> int:
        # reference preencoder.py:341
        return self.codebook_size + 2


@dataclass(frozen=True)
class PatchDiscriminatorConfig:
    hidden_channels: tuple = (256, 256, 384, 512, 512)
    kernel_sizes: tuple = (5, 5, 5, 3, 3, 3)
    strides: tuple = ((1, 2), (2, 2), (2, 2), (2, 1), (2, 1), (2, 1))


@dataclass(frozen=True)
class MultiBinDiscriminatorConfig:
    hidden_channels: tuple = (128, 128, 256, 256, 384)
    kernel_sizes: tuple = (7, 5, 3, 3, 3, 3)
    n_bins: int = 8
    n_no_strides: int = 2


@dataclass(frozen=True)
class ModelConfig:
    mel_channels: int = 128
    generator: GeneratorConfig = field(default_factory=GeneratorConfig)
    discriminator_patch: PatchDiscriminatorConfig = field(
        default_factory=PatchDiscriminatorConfig
    )
    discriminator_multibin: MultiBinDiscriminatorConfig = field(
        default_factory=MultiBinDiscriminatorConfig
    )


@dataclass(frozen=True)
class LossWeights:
    fm_lambda: float = 0.25
    Gloss_lambda: float = 15.0
    # `recon_lambda` is accepted for config compatibility but unused by the
    # reference trainer (train.py:479-482 reads *_pre/*_post via .get).
    recon_lambda: float = 15.0
    recon_lambda_pre: float = 1.0
    recon_lambda_post: float = 2.0


@dataclass(frozen=True)
class TrainingConfig:
    num_epochs: int = 1000
    lr: float = 1e-4
    beta1: float = 0.9
    beta2: float = 0.999
    lr_d_factor: float = 1.15
    d_beta1: float = 0.5
    d_beta2: float = 0.999
    warmup_steps: int = 1000
    discriminator_train_start_epoch: int = 8
    loss_weights: LossWeights = field(default_factory=LossWeights)
    use_fm_loss: bool = False
    clip_grad_norm: float = 1.0
    seed: int = 42
    # PRNG implementation for the training key tree. "rbg" (XLA
    # RngBitGenerator, hardware-backed) runs dropout-mask generation 7.6x
    # faster than "threefry2x32" on TPU v5e (311.6 vs 41.2 Gelem/s,
    # benchmarks/README.md "Dropout/RNG") — and dropout was measured at
    # 59% of the flagship B=64 --remat warmup step under threefry
    # (benchmarks/ablate_step.py). Trade-off: rbg streams are
    # backend-dependent (CPU vs TPU runs see different dropout draws;
    # iid either way), and a resumed run must keep the impl it was
    # trained with (the checkpointed key's shape differs).
    rng_impl: str = "rbg"
    no_cuda: bool = False  # accepted for compat; meaningless on TPU
    pretrained: str | None = None


@dataclass(frozen=True)
class DataConfig:
    data_dir: str = "data/real"
    output_dir: str = "training_output"
    validation_split: float = 0.02
    # int or tuple of ints; tuple => one bucket chosen per batch at random
    # (reference train.py:157-162).
    crop_len: Any = (256, 192, 128)
    batch_size: int = 16
    num_workers: int = 0


@dataclass(frozen=True)
class WandbConfig:
    entity: str | None = None
    project: str = "MQGAN"


@dataclass(frozen=True)
class LoggingConfig:
    eval_interval: int = 2
    save_interval: int = 2
    # write checkpoints on a background thread (orbax AsyncCheckpointer):
    # the train loop resumes as soon as the state is snapshotted to host
    # memory instead of blocking on disk serialization. The trainer drains
    # pending saves at exit (and orbax serializes save-after-save itself).
    async_save: bool = False
    num_plot_examples: int = 10
    # Codebook-collapse guardrail: warn loudly when the logged
    # codebook_usage stays below `codebook_usage_floor` for
    # `codebook_collapse_patience` consecutive metric logs. The collapse
    # mode is real and silent — recon keeps improving while the FSQ
    # quantizer degenerates to one code (measured on-chip:
    # benchmarks/convergence_ab_fsqnoise.json, usage 0.005 vs 0.24 with
    # generator.fsq_noise_dropout 0.5, the reference's mitigation knob,
    # reference quantizer.py:142-162). floor <= 0 disables the check.
    codebook_usage_floor: float = 0.02
    codebook_collapse_patience: int = 5
    wandb: WandbConfig = field(default_factory=WandbConfig)


@dataclass(frozen=True)
class TrainConfig:
    """Top-level config == reference model-config YAML schema."""

    project_name: str = "MQGAN"
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    logging: LoggingConfig = field(default_factory=LoggingConfig)

    @property
    def crop_lens(self) -> tuple:
        cl = self.data.crop_len
        if isinstance(cl, (list, tuple)):
            return tuple(int(c) for c in cl)
        return (int(cl),)

    @staticmethod
    def from_dict(d: Mapping[str, Any]) -> "TrainConfig":
        data_d = dict(d.get("data", {}))
        if "crop_len" in data_d:
            data_d["crop_len"] = _tuple(data_d["crop_len"]) if isinstance(
                data_d["crop_len"], (list, tuple)
            ) else int(data_d["crop_len"])

        model_d = dict(d.get("model", {}))
        gen_d = dict(model_d.pop("generator", {}))
        for k in ("channels", "kernel_sizes", "fsq_levels"):
            if k in gen_d:
                gen_d[k] = _tuple(gen_d[k])
        patch_d = dict(model_d.pop("discriminator_patch", {}))
        for k in ("hidden_channels", "kernel_sizes", "strides"):
            if k in patch_d:
                patch_d[k] = _tuple(patch_d[k])
        mb_d = dict(model_d.pop("discriminator_multibin", {}))
        for k in ("hidden_channels", "kernel_sizes"):
            if k in mb_d:
                mb_d[k] = _tuple(mb_d[k])

        train_d = dict(d.get("training", {}))
        lw_d = dict(train_d.pop("loss_weights", {}))
        log_d = dict(d.get("logging", {}))
        wandb_d = dict(log_d.pop("wandb", {}))
        # tolerate extra project key inside wandb
        wandb_d = {k: v for k, v in wandb_d.items() if k in ("entity", "project")}

        def _known(section: str, d_in: Mapping[str, Any], cls):
            """Filter to the dataclass's fields, WARNING on dropped keys —
            a typo like `epochs:` (vs the reference's `num_epochs`,
            model_config_*.yaml:34) must not silently fall back to the
            default."""
            names = {f.name for f in dataclasses.fields(cls)}
            unknown = sorted(set(d_in) - names)
            if unknown:
                import warnings

                warnings.warn(
                    f"config: ignoring unknown key(s) {unknown} in "
                    f"'{section}' (known: {sorted(names)})", stacklevel=3)
            return {k: v for k, v in d_in.items() if k in names}

        train_d = _known("training", train_d, TrainingConfig)
        lw_d = _known("training.loss_weights", lw_d, LossWeights)

        return TrainConfig(
            project_name=d.get("project_name", "MQGAN"),
            data=DataConfig(**data_d),
            model=ModelConfig(
                mel_channels=model_d.get("mel_channels", 128),
                generator=GeneratorConfig(**gen_d),
                discriminator_patch=PatchDiscriminatorConfig(**patch_d),
                discriminator_multibin=MultiBinDiscriminatorConfig(**mb_d),
            ),
            training=TrainingConfig(
                **train_d,
                loss_weights=LossWeights(**lw_d),
            ),
            logging=LoggingConfig(
                **_known("logging", log_d, LoggingConfig),
                wandb=WandbConfig(**wandb_d),
            ),
        )

    @staticmethod
    def from_yaml(path: str) -> "TrainConfig":
        with open(path) as f:
            return TrainConfig.from_dict(yaml.safe_load(f))

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)
