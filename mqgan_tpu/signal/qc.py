"""Dataset QC: statistical screening of log-mel .npy files.

Behavioral spec (reference qc_mels.py:12-164): per-file heuristics —
NaN/Inf, value range, spectral flux, per-bin temporal std, time-vs-freq
gradient anisotropy, spectral-centroid variance, SVD rank-1 energy — a file
is bad when MORE THAN ONE reason fires; bad files are moved to a quarantine
directory with a CSV audit report.

Offline host tooling: plain numpy (matches the reference's own choice).

Usage: python -m mqgan_tpu.signal.qc SRC DST [--csv out.csv] [--mirror]
"""

from __future__ import annotations

import argparse
import csv
import os
import shutil
from pathlib import Path

import numpy as np


def mel_qc(mel: np.ndarray, expect_bins: int | None = None,
           value_range=(-20.0, 10.0)):
    """Returns (is_bad, report). Thresholds mirror reference qc_mels.py:74-91."""
    rep: dict = {}
    if mel.ndim != 2:
        rep["ndim_not_2"] = True
        return True, rep

    t, m = mel.shape
    if t < m:
        mel = mel.T
        t, m = mel.shape
        rep["transposed"] = True

    if expect_bins is not None and m != expect_bins:
        rep["reason"] = "wrong_bins"
        return True, rep

    if not np.isfinite(mel).all():
        rep["reason"] = "nan_or_inf"
        return True, rep

    vmin, vmax = float(mel.min()), float(mel.max())
    rep["range"] = vmax - vmin
    lo, hi = value_range
    if vmin < lo - 5 or vmax > hi + 5:
        return True, {"reason": "values_out_of_expected_range"}

    if t > 1:
        d = np.diff(mel, axis=0)
        flux = float(np.mean(np.sqrt((d ** 2).sum(axis=1) / (m + 1e-8))))
    else:
        flux = 0.0

    med_time_std = float(np.median(np.std(mel, axis=0)))

    dt = float(np.mean(np.abs(np.diff(mel, axis=0)))) if t > 1 else 0.0
    df = float(np.mean(np.abs(np.diff(mel, axis=1)))) if m > 1 else 0.0
    ratio_t_over_f = (dt + 1e-8) / (df + 1e-8)

    w = np.exp(mel - np.max(mel, axis=1, keepdims=True))
    idx = np.arange(m, dtype=np.float32)[None, :]
    cent = (w * idx).sum(axis=1) / (w.sum(axis=1) + 1e-8)
    cent_var = float(np.var(cent))

    x = mel - mel.mean(axis=0, keepdims=True)
    try:
        s = np.linalg.svd(x, compute_uv=False)
        rank1_energy = float((s[0] ** 2) / (np.sum(s ** 2) + 1e-8))
    except np.linalg.LinAlgError:
        rank1_energy = 1.0  # fail safe -> flag as bad

    rep.update(
        flux=flux, med_time_std=med_time_std, ratio_t_over_f=ratio_t_over_f,
        cent_var=cent_var, rank1_energy=rank1_energy,
        value_min=vmin, value_max=vmax,
    )

    reasons = []
    if rank1_energy > 0.985:
        reasons.append("rank1_like")
    if flux < 0.03 and med_time_std < 0.12:
        reasons.append("very_low_temporal_change")
    if ratio_t_over_f < 0.15:
        reasons.append("time_grad_tiny_vs_freq")
    if cent_var < 5.0:
        reasons.append("centroid_static")
    if rep["range"] < 0.6:
        reasons.append("nearly_constant_values")

    bad = len(reasons) > 1  # reference qc_mels.py:91
    rep["reasons"] = reasons
    return bad, rep


CSV_HEADER = [
    "rel_path", "abs_path", "moved_to", "reasons", "rank1_energy", "flux",
    "median_time_std", "ratio_time_over_freq", "centroid_var", "value_min",
    "value_max", "range",
]


def scan_and_move(src_dir, bad_dir, csv_path, expect_bins=None,
                  value_low=-20.0, value_high=10.0, mirror=False):
    src_dir, bad_dir, csv_path = Path(src_dir), Path(bad_dir), Path(csv_path)
    bad_dir.mkdir(parents=True, exist_ok=True)
    csv_path.parent.mkdir(parents=True, exist_ok=True)

    total = bad = 0
    with csv_path.open("w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(CSV_HEADER)
        for npy_file in src_dir.rglob("*.npy"):
            total += 1
            rel = npy_file.relative_to(src_dir)
            dst = bad_dir / (rel if mirror else rel.name)
            try:
                mel = np.load(npy_file)
            except Exception as e:  # unreadable => quarantine
                dst.parent.mkdir(parents=True, exist_ok=True)
                shutil.move(str(npy_file), str(dst))
                writer.writerow([str(rel), str(npy_file), str(dst),
                                 f"load_error:{e}"] + [""] * 8)
                bad += 1
                continue

            is_bad, rep = mel_qc(mel, expect_bins=expect_bins,
                                 value_range=(value_low, value_high))
            if is_bad:
                dst.parent.mkdir(parents=True, exist_ok=True)
                shutil.move(str(npy_file), str(dst))
                reasons = ";".join(rep.get("reasons", [rep.get("reason", "unknown")]))
                writer.writerow([
                    str(rel), str(npy_file), str(dst), reasons,
                    rep.get("rank1_energy", ""), rep.get("flux", ""),
                    rep.get("med_time_std", ""), rep.get("ratio_t_over_f", ""),
                    rep.get("cent_var", ""), rep.get("value_min", ""),
                    rep.get("value_max", ""), rep.get("range", ""),
                ])
                bad += 1

    print(f"Done. Checked {total} files. Flagged & moved {bad}. CSV -> {csv_path}")
    return {"total": total, "bad": bad}


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Scan .npy mels, quarantine bad ones, log reasons to CSV"
    )
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--csv", default="bad_mels.csv")
    p.add_argument("--expect-bins", type=int, default=None)
    p.add_argument("--val-min", type=float, default=-20.0)
    p.add_argument("--val-max", type=float, default=10.0)
    p.add_argument("--mirror", action="store_true")
    args = p.parse_args(argv)
    scan_and_move(args.src, args.dst, args.csv, args.expect_bins,
                  args.val_min, args.val_max, args.mirror)


if __name__ == "__main__":
    main()
