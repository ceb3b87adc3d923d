"""Batch wav -> log-mel conversion CLI.

Behavioral spec (reference convert_spectrograms.py:37-133): walk the input
tree, mirror the directory structure into the output folder, skip files
whose output already exists (resume), resample to the configured rate, gate
clips outside [1 s, 15 s], extract torchaudio-parity log-mels
(signal/mel.py), save `{name}_mel.npy`; fan work out over
`multiprocessing.cpu_count()` worker processes with static chunking.

The mel front end (signal/mel.py) is jitted and pinned to CPU: every file
has a distinct length, so an accelerator backend would pay one compile per
file (minutes per file through a tunneled backend), and the reference's
converter is CPU torchaudio anyway.  The CLI's `--platform` flag (default
cpu) pins each worker process via jax.config — the env var alone is not
enough where site config re-forces an accelerator platform.

Usage: python -m mqgan_tpu.signal.convert --config spec_config.yaml
       [--input_folder ...] [--output_folder ...]
"""

from __future__ import annotations

import argparse
import multiprocessing
import os
from typing import List, Tuple

import numpy as np

from mqgan_tpu.core.config import SpecConfig
from mqgan_tpu.signal.audio import UnsupportedFormatError, load_audio, resample, to_mono

MIN_DURATION_S = 1.0  # reference convert_spectrograms.py:57
MAX_DURATION_S = 15.0


class MelExtractor:
    """Per-process wav->log-mel pipeline (lazy jitted CPU frontend)."""

    def __init__(self, config: SpecConfig):
        self.config = config
        self._frontend = None  # lazy: created per process

    @property
    def frontend(self):
        if self._frontend is None:
            import jax

            from mqgan_tpu.signal.mel import MelFrontend

            # host-side tool: pin the CPU backend — every file has a
            # distinct length, which would mean one accelerator compile
            # per file (the reference's converter is CPU torchaudio too)
            try:
                cpu = jax.devices("cpu")[0]
            except RuntimeError:
                cpu = None  # platform list excludes CPU (e.g. forced TPU)
            self._frontend = MelFrontend(self.config.spectrogram, device=cpu)
        return self._frontend

    def process_file(self, file_path: str, output_dir: str) -> bool:
        base = os.path.splitext(os.path.basename(file_path))[0]
        out_path = os.path.join(output_dir, f"{base}_mel.npy")
        if os.path.isfile(out_path):  # resume-skip (reference :47-48)
            return True
        try:
            wav, sr = load_audio(file_path)
            target_sr = self.config.spectrogram.sampling_rate
            if sr and sr != target_sr:
                wav = resample(wav, sr, target_sr)
            wav = to_mono(wav)

            duration = wav.shape[1] / target_sr
            if duration < MIN_DURATION_S or duration > MAX_DURATION_S:
                return False  # duration gate (reference :56-58)

            mel = np.asarray(self.frontend(wav[0]))  # (frames, n_mels)
            np.save(out_path, mel)
            return True
        except UnsupportedFormatError as e:
            print(f"Skipping {file_path}: {e}")
            return False
        except Exception as e:  # noqa: BLE001 (reference :63-65)
            print(f"Error processing {file_path}: {e}")
            return False


def _run_shard(shard_id: int, tasks: List[Tuple[str, str]], config: SpecConfig,
               platform: str | None = None):
    if platform:
        # per-process: the env var alone can be re-forced by site config,
        # so pin the platform through jax.config before first device use
        import jax

        jax.config.update("jax_platforms", platform)
    extractor = MelExtractor(config)
    n = len(tasks)
    for i, (file_path, output_dir) in enumerate(tasks):
        os.makedirs(output_dir, exist_ok=True)
        extractor.process_file(file_path, output_dir)
        if (i + 1) % 50 == 0:
            print(f"[shard {shard_id}] {i + 1}/{n}")


def shard_tasks(tasks: List, n: int) -> List[List]:
    """Static round-robin assignment of tasks to n worker shards
    (the reference fans out with static chunking too,
    convert_spectrograms.py:74-76; striping balances mixed file sizes
    better and is order-independent per shard)."""
    return [tasks[i::n] for i in range(n)]


def collect_tasks(config: SpecConfig) -> List[Tuple[str, str]]:
    tasks = []
    in_dir = config.io.input_folder
    out_dir = config.io.output_folder
    exts = tuple(config.io.audio_extensions) + (".npy",)
    for root, _, files in os.walk(in_dir):
        rel = os.path.relpath(root, in_dir)
        out_sub = os.path.join(out_dir, rel)
        for fn in files:
            if fn.lower().endswith(exts):
                tasks.append((os.path.join(root, fn), out_sub))
    return tasks


def run(config: SpecConfig, num_workers: int | None = None,
        platform: str | None = None):
    config.validate()
    os.makedirs(config.io.output_folder, exist_ok=True)
    tasks = collect_tasks(config)
    print(f"{len(tasks)} audio files to convert")
    if not tasks:
        return

    num_workers = num_workers or multiprocessing.cpu_count()
    if num_workers <= 1 or len(tasks) < 4:
        _run_shard(0, tasks, config, platform)
        return
    shards = shard_tasks(tasks, num_workers)
    procs = []
    for i, shard in enumerate(shards):
        if not shard:
            continue
        p = multiprocessing.Process(target=_run_shard,
                                    args=(i, shard, config, platform))
        p.start()
        procs.append(p)
    for p in procs:
        p.join()


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Convert audio files to log-mel spectrograms."
    )
    parser.add_argument("--config", type=str, default="spec_config.yaml")
    parser.add_argument("--input_folder", type=str, default=None)
    parser.add_argument("--output_folder", type=str, default=None)
    parser.add_argument("--num_workers", type=int, default=None)
    parser.add_argument("--platform", type=str, default="cpu",
                        help="JAX platform for the mel frontend (default "
                             "cpu — distinct per-file lengths mean one "
                             "accelerator compile per file, so host CPU is "
                             "the right backend for this data-prep tool "
                             "even when the ambient JAX_PLATFORMS names an "
                             "accelerator)")
    args = parser.parse_args(argv)

    import dataclasses

    config = SpecConfig.from_yaml(args.config)
    io = config.io
    if args.input_folder:
        io = dataclasses.replace(io, input_folder=args.input_folder)
    if args.output_folder:
        io = dataclasses.replace(io, output_folder=args.output_folder)
    config = dataclasses.replace(config, io=io)

    run(config, num_workers=args.num_workers, platform=args.platform)


if __name__ == "__main__":
    main()
