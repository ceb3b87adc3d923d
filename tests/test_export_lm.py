"""LM export tests: StableHLO generation/scoring artifacts round-trip
through ExportedMusicLM with exact per-row parity vs the in-process
samplers — for BOTH token-LM architectures (the v2 per-row programs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mqgan_tpu.models.lm_sampling import (generate_tokens,
                                          generate_tokens_transformer,
                                          score_tokens)
from mqgan_tpu.models.music_lstm import MusicLSTM
from mqgan_tpu.models.token_transformer import MusicTransformer

V, G = 30, 3


@pytest.fixture(scope="module", params=["lstm", "transformer"])
def lm(request):
    if request.param == "lstm":
        model = MusicLSTM(vocab_size=V, num_genres=G, emb_dim=8,
                          lstm_hid=12, lstm_layers=2, pad_id=0, dropout=0.0)
        static_fn = generate_tokens
    else:
        model = MusicTransformer(vocab_size=V, num_genres=G, emb_dim=16,
                                 n_layers=2, n_heads=2, mlp_ratio=2,
                                 pad_id=0, dropout=0.0)
        static_fn = generate_tokens_transformer
    tok0 = jnp.zeros((1, 4), jnp.int32)
    params = model.init(jax.random.key(0), tok0,
                        jnp.zeros((1,), jnp.int32), None)["params"]
    return request.param, model, params, static_fn


@pytest.fixture(scope="module")
def lm_export_dir(lm, tmp_path_factory):
    from mqgan_tpu.deploy.export_lm import export_music_lm

    arch, model, params, _ = lm
    out = str(tmp_path_factory.mktemp(f"lm_export_{arch}"))
    # verify=True runs non-bucket-shape generate (incl. a mixed-length
    # per-row batch) + score internally
    export_music_lm(model, params, out, gen_buckets=(16, 24),
                    prompt_buckets=(1, 8), score_buckets=(12,),
                    lm_args={"note": "test"}, verify=True)
    return out


def test_exported_generate_rows_match_solo_sampler(lm, lm_export_dir):
    """Exported generation is token-exact PER ROW with solo in-process
    static-sampler runs at the covering bucket (trim semantics =
    http_lm's length grid; scalar seed s derives row seeds s + b)."""
    from mqgan_tpu.deploy.export_lm import ExportedMusicLM

    arch, model, params, static_fn = lm
    rt = ExportedMusicLM(lm_export_dir)
    assert rt.vocab_size == V and rt.num_genres == G
    assert rt.arch == arch
    assert rt.lm_args == {"note": "test"}
    genres = np.asarray([0, 2, 1], np.int32)

    out = rt.generate(genres, 13, seed=42, temperature=0.8, top_k=6,
                      top_p=0.9, forbidden=(0, 1))
    for b in range(3):
        ref = static_fn(  # covering bucket is 16; trim to 13
            model, params, jnp.asarray(genres[b: b + 1]),
            jax.random.key(42 + b), max_len=16, temperature=0.8, top_k=6,
            top_p=0.9, forbidden_tokens=(0, 1))
        np.testing.assert_array_equal(out[b], np.asarray(ref)[0, :13])


def test_exported_mixed_prompt_rows(lm, lm_export_dir):
    """generate_rows: one dispatch mixing unconditional and different-
    length prompts (padded to the P=8 bucket) equals per-row solo runs —
    the continuous-batching primitive."""
    from mqgan_tpu.deploy.export_lm import ExportedMusicLM

    arch, model, params, static_fn = lm
    rt = ExportedMusicLM(lm_export_dir)
    genres = np.asarray([1, 0, 2], np.int32)
    seeds = np.asarray([5, 11, 23], np.int32)
    prompts = [None, np.asarray([3, 4, 5], np.int32),
               np.asarray([9, 8, 7, 6, 5], np.int32)]

    out = rt.generate_rows(genres, seeds, 24, prompts=prompts,
                           temperature=1.1, top_k=4)
    assert out.shape == (3, 24)
    for b in range(3):
        p = None if prompts[b] is None else jnp.asarray(prompts[b][None])
        ref = static_fn(model, params, jnp.asarray(genres[b: b + 1]),
                        jax.random.key(int(seeds[b])), max_len=24,
                        temperature=1.1, top_k=4, prompt=p)
        np.testing.assert_array_equal(out[b], np.asarray(ref)[0],
                                      err_msg=f"row {b}")


def test_exported_score_matches_direct(lm, lm_export_dir, rng):
    """Exported scoring == score_tokens, including pad-to-bucket rows."""
    from mqgan_tpu.deploy.export_lm import ExportedMusicLM

    _, model, params, _ = lm
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


def test_v1_manifest_rejected(lm_export_dir, tmp_path):
    """Pre-per-row artifacts fail loudly with a re-export hint instead of
    mis-calling the programs."""
    import json
    import os
    import shutil

    from mqgan_tpu.deploy.export_lm import LM_MANIFEST_NAME, ExportedMusicLM

    old = tmp_path / "v1"
    shutil.copytree(lm_export_dir, old)
    mpath = os.path.join(old, LM_MANIFEST_NAME)
    with open(mpath) as f:
        manifest = json.load(f)
    manifest.pop("version")
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    with pytest.raises(ValueError, match="re-export"):
        ExportedMusicLM(str(old))


def test_flash_lm_run_deploys_on_cpu(tmp_path):
    """A --flash_lm --remat_lm-trained transformer run dir must rebuild
    for export/serving WITHOUT the training-only implementation knobs:
    the Pallas TPU flash kernel cannot lower on the CPU platform the
    exporter always includes (ADVICE r4 medium). load_lm_from_run builds
    with for_inference=True; the stripped model's logits equal the
    flagged model's semantics (flash/remat change implementation only),
    and the full export self-verify runs green on CPU."""
    import json

    from mqgan_tpu.deploy.export_lm import export_music_lm, load_lm_from_run
    from mqgan_tpu.utils.checkpoint import save_generator_only

    targs = dict(vocab_size=V, num_genres=G, emb_dim=16, n_layers=2,
                 n_heads=2, mlp_ratio=2, pad_id=0)
    model = MusicTransformer(**targs, dropout=0.0)
    params = model.init(jax.random.key(5), jnp.zeros((1, 4), jnp.int32),
                        jnp.zeros((1,), jnp.int32), None)["params"]
    run = tmp_path / "flash_run"
    path = save_generator_only(str(run), jax.device_get(params), "model_e1")
    with open(run / "best.json", "w") as f:
        json.dump({"epoch": 1, "val_loss": 1.0, "path": path,
                   "args": dict(targs, bos_id=1, arch="transformer",
                                flash_lm=True, remat_lm=True)}, f)

    loaded_model, loaded_params, lm_args = load_lm_from_run(str(run))
    assert lm_args["flash_lm"] is True  # args preserved verbatim...
    assert loaded_model.flash is False  # ...but the rebuild strips them
    assert loaded_model.remat is False

    # the stripped rebuild is the same function: logits match the
    # training-config model run with flash/remat off
    toks = jnp.asarray([[1, 3, 5, 2]], jnp.int32)
    genre = jnp.zeros((1,), jnp.int32)
    ref = model.apply({"params": params}, toks, genre, None)
    got = loaded_model.apply({"params": loaded_params}, toks, genre, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    # and the export path (which jit-traces through __call__ on CPU)
    # completes with its internal verification
    export_music_lm(loaded_model, loaded_params,
                    str(tmp_path / "flash_export"), gen_buckets=(16,),
                    prompt_buckets=(1,), score_buckets=(12,),
                    lm_args=lm_args, verify=True)
