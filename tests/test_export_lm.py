"""LM export tests: StableHLO generation/scoring artifacts round-trip
through ExportedMusicLM with exact parity vs the in-process sampler."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mqgan_tpu.models.lm_sampling import (generate_tokens,
                                          generate_tokens_served,
                                          score_tokens)
from mqgan_tpu.models.music_lstm import MusicLSTM

V, G = 30, 3


@pytest.fixture(scope="module")
def lm():
    model = MusicLSTM(vocab_size=V, num_genres=G, emb_dim=8, lstm_hid=12,
                      lstm_layers=2, pad_id=0, dropout=0.0)
    tok0 = jnp.zeros((1, 4), jnp.int32)
    params = model.init(jax.random.key(0), tok0,
                        jnp.zeros((1,), jnp.int32), None)["params"]
    return model, params


@pytest.fixture(scope="module")
def lm_export_dir(lm, tmp_path_factory):
    from mqgan_tpu.deploy.export_lm import export_music_lm

    model, params = lm
    out = str(tmp_path_factory.mktemp("lm_export"))
    # verify=True runs a non-bucket-shape generate + score internally
    export_music_lm(model, params, out, gen_buckets=(16, 24),
                    prompt_buckets=(1, 8), score_buckets=(12,),
                    lm_args={"note": "test"}, verify=True)
    return out


def test_exported_generate_matches_sampler(lm, lm_export_dir):
    """Exported generation is token-exact with the in-process sampler at
    the covering bucket (trim semantics = http_lm's length grid)."""
    from mqgan_tpu.deploy.export_lm import ExportedMusicLM

    model, params = lm
    rt = ExportedMusicLM(lm_export_dir)
    assert rt.vocab_size == V and rt.num_genres == G
    assert rt.lm_args == {"note": "test"}
    genres = np.asarray([0, 2, 1], np.int32)

    out = rt.generate(genres, 13, seed=42, temperature=0.8, top_k=6,
                      top_p=0.9, forbidden=(0, 1))
    ref = generate_tokens(  # covering bucket is 16; trim to 13
        model, params, jnp.asarray(genres), jax.random.key(42),
        max_len=16, temperature=0.8, top_k=6, top_p=0.9,
        forbidden_tokens=(0, 1))
    np.testing.assert_array_equal(out, np.asarray(ref)[:, :13])


def test_exported_generate_prompt_bucketing(lm, lm_export_dir):
    """A 5-token prompt rides the P=8 program; parity with the direct
    dynamic sampler at the same buckets."""
    from mqgan_tpu.deploy.export_lm import ExportedMusicLM

    model, params = lm
    rt = ExportedMusicLM(lm_export_dir)
    genres = np.asarray([1, 0], np.int32)
    prompt = np.asarray([[3, 4, 5, 6, 7], [9, 8, 7, 6, 5]], np.int32)

    out = rt.generate(genres, 24, seed=5, temperature=1.1, top_k=4,
                      prompt=prompt)
    mask = np.ones((V,), bool)
    prompt_pad = np.zeros((2, 8), np.int32)
    prompt_pad[:, :5] = prompt
    ref = generate_tokens_served(
        model, params, jnp.asarray(genres), jnp.int32(5),
        jnp.asarray(prompt_pad), jnp.int32(5), jnp.float32(1.1),
        jnp.int32(4), jnp.float32(0.0), jnp.asarray(mask), max_len=24)
    np.testing.assert_array_equal(out, np.asarray(ref))


def test_exported_score_matches_direct(lm, lm_export_dir, rng):
    """Exported scoring == score_tokens, including pad-to-bucket rows."""
    from mqgan_tpu.deploy.export_lm import ExportedMusicLM

    model, params = lm
    rt = ExportedMusicLM(lm_export_dir)
    tokens = rng.integers(1, V, (4, 9)).astype(np.int32)
    tokens[2, 6:] = 0  # a right-padded row
    genres = np.asarray([0, 1, 2, 0], np.int32)

    nll, n = rt.score(tokens, genres)  # pads 9 -> bucket 12 with pad_id
    ref_nll, ref_n = score_tokens(model, params, jnp.asarray(tokens),
                                  jnp.asarray(genres))
    np.testing.assert_allclose(nll, np.asarray(ref_nll), rtol=1e-5)
    np.testing.assert_array_equal(n, np.asarray(ref_n))


def test_exported_over_bucket_rejected(lm_export_dir):
    from mqgan_tpu.deploy.export_lm import ExportedMusicLM

    rt = ExportedMusicLM(lm_export_dir)
    with pytest.raises(ValueError, match="exceeds the largest"):
        rt.generate(np.zeros((1,), np.int32), 25, seed=0)
    with pytest.raises(ValueError, match="exceeds the largest"):
        rt.score(np.zeros((1, 13), np.int32), np.zeros((1,), np.int32))
