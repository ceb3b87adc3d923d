"""Token-dump QC statistics (deploy/token_stats.py)."""

import json
import os

import numpy as np

from mqgan_tpu.deploy.token_stats import compute_token_stats, main


def _write(dirpath, name, arr):
    os.makedirs(dirpath, exist_ok=True)
    np.save(os.path.join(dirpath, name), arr)


def test_uniform_tokens_full_usage(tmp_path):
    """All codes used uniformly: usage 1.0, unigram perplexity = K, and
    iid data has bigram conditional perplexity ~= unigram."""
    d = str(tmp_path / "toks")
    rng = np.random.default_rng(0)
    k = 64
    for i in range(4):
        _write(d, f"f{i}.npy", rng.integers(0, k, 4000, dtype=np.int64))
    s = compute_token_stats(d, codebook_size=k)
    assert s.n_files == 4 and s.n_tokens == 16000
    assert s.used_codes == k and s.usage == 1.0
    assert abs(s.unigram_perplexity - k) / k < 0.05
    assert abs(s.bigram_perplexity - k) / k < 0.15  # iid: no structure
    assert s.out_of_range_tokens == 0 and s.special_tokens == 0


def test_collapsed_codebook_is_visible(tmp_path):
    """The failure mode this tool exists for: a 1000-code book routed
    through 3 codes shows tiny usage and low perplexity."""
    d = str(tmp_path / "toks")
    rng = np.random.default_rng(1)
    _write(d, "a.npy", rng.choice([7, 123, 900], 5000).astype(np.int64))
    s = compute_token_stats(d, codebook_size=1000)
    assert s.used_codes == 3
    assert s.usage == 0.003
    assert s.unigram_perplexity < 3.2
    assert s.top16_share == 1.0


def test_structured_sequence_lowers_bigram_entropy(tmp_path):
    """A deterministic cycle has zero conditional entropy even though its
    unigram distribution is uniform — the bigram number is what tells an
    LM-trainability story."""
    d = str(tmp_path / "toks")
    _write(d, "cycle.npy", np.tile(np.arange(32, dtype=np.int64), 200))
    s = compute_token_stats(d, codebook_size=32)
    assert abs(s.unigram_perplexity - 32) < 1.0
    assert s.bigram_perplexity < 1.05  # fully predictable


def test_special_and_out_of_range_flagged(tmp_path):
    d = str(tmp_path / "toks")
    _write(d, "a.npy", np.array([0, 5, 1001, 1002, 4000, -3], np.int64))
    s = compute_token_stats(d, codebook_size=1000)
    assert s.special_tokens == 2      # 1001, 1002 (BOS/EOS range)
    assert s.out_of_range_tokens == 2  # 4000, -3
    assert s.used_codes == 2


def test_cli_writes_json_and_tolerates_bad_files(tmp_path, capsys):
    d = str(tmp_path / "toks")
    _write(d, "ok.npy", np.arange(100, dtype=np.int64) % 50)
    with open(os.path.join(d, "broken.npy"), "wb") as f:
        f.write(b"not an npy")
    out = str(tmp_path / "stats.json")
    s = main(["--tokens_dir", d, "--codebook_size", "50", "--out", out])
    assert s.n_files == 1 and s.n_failed == 1
    printed = capsys.readouterr().out
    assert "codebook: 50/50" in printed
    with open(out) as f:
        j = json.load(f)
    assert j["used_codes"] == 50 and len(j["files_failed"]) == 1
