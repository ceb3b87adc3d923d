"""AOT export + runtime for the token LM — generation as a deployable
artifact.

Net-new surface (the reference trains its LSTM LM,
train_music_lstm_v2.py, but ships no export/serving for it; its only
export path is the codec's convert_to_torchscript.py). Here the
generation head follows the codec's export idiom (deploy/export.py):
`jax.export` serializes the jitted sampler to StableHLO with params
baked in as constants, multi-platform (cpu + tpu), so a serving host
needs only this artifact directory — no checkpoint, no flax, no model
code.

What makes the LM exportable at all is the served sampler pair
(models/lm_sampling.py `generate_tokens_served` /
`generate_tokens_transformer_served` — BOTH archs share one signature,
models/token_lm.py:served_sampler): every sampling control —
temperature, top-k, top-p, the forbidden-token set (as a (V,) mask) —
is a TRACED argument and the PRNG seed and prompt length are PER-ROW
traced vectors, so ONE serialized program per (prompt-bucket P,
generation-bucket L) pair serves every request shape AND lets the
http_lm continuous batcher coalesce mixed-prompt-length requests into
one dispatch with row-for-row solo-run-exact tokens. The batch
dimension is symbolic. A scoring program (per-row NLL sums,
`score_tokens`) is exported per length bucket alongside, giving the
artifact a perplexity/rerank head that exactly mirrors the trainer's
masked CE.

`ExportedMusicLM` is the runtime twin of `ExportedPreEncoder`
(deploy/runtime.py): pick the smallest covering buckets, pad, dispatch,
trim. Generation trims causally — the returned prefix equals the
in-process sampler run at the same padded bucket length (the exact
policy deploy/http_lm.py already uses for its length grid).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Sequence

import numpy as np

LM_MANIFEST_NAME = "lm_manifest.json"
DEFAULT_GEN_BUCKETS = (128, 256, 512, 1024)
DEFAULT_PROMPT_BUCKETS = (1, 128)  # P=1 + prompt_len=0 serves unconditional
DEFAULT_SCORE_BUCKETS = (256, 1024)


def export_music_lm(
    model,
    params,  # params['params'] tree of the token LM (either arch)
    out_dir: str,
    *,
    gen_buckets: Sequence[int] = DEFAULT_GEN_BUCKETS,
    prompt_buckets: Sequence[int] = DEFAULT_PROMPT_BUCKETS,
    score_buckets: Sequence[int] = DEFAULT_SCORE_BUCKETS,
    bos_id: int = 1,
    lm_args: dict | None = None,
    verify: bool = True,
    kv_dtype: str | None = None,
) -> str:
    """Serialize the dynamic-control per-row sampler per (P, L) bucket
    pair and the scoring head per length bucket, params baked in. Works
    for both archs (models/token_lm.py dispatches the served sampler);
    the manifest records which one so the runtime can report it.

    ``kv_dtype`` (transformer only): KV-cache storage dtype baked into
    the generation programs — "bfloat16" halves the decode loop's
    attention-read HBM traffic (scores/softmax stay fp32; see
    models/lm_sampling.py). Recorded in the manifest; sampled streams
    are self-consistent per dtype but may differ across dtypes."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from mqgan_tpu.deploy.export import _export_platforms
    from mqgan_tpu.models.lm_sampling import score_tokens
    from mqgan_tpu.models.token_lm import arch_config, served_sampler

    os.makedirs(out_dir, exist_ok=True)
    platforms = _export_platforms()
    b = jexport.symbolic_shape("b")[0]
    v = model.vocab_size
    sampler = served_sampler(model)

    manifest = {
        "version": 2,  # v2: per-row seeds + prompt_lens, arch-aware
        "arch_config": arch_config(model),
        "arch": arch_config(model)["arch"],
        "vocab_size": v,
        "num_genres": model.num_genres,
        "pad_id": model.pad_id,
        "bos_id": int(bos_id),
        "gen_buckets": sorted(int(t) for t in gen_buckets),
        "prompt_buckets": sorted(int(t) for t in prompt_buckets),
        "score_buckets": sorted(int(t) for t in score_buckets),
        "platforms": list(platforms),
        "files": {"generate": {}, "score": {}},
    }
    if lm_args is not None:
        manifest["lm_args"] = dict(lm_args)
    sampler_kw = {}
    if kv_dtype is not None:
        if manifest["arch"] != "transformer":
            raise ValueError("kv_dtype applies to the transformer arch "
                             "only (the LSTM carries no KV cache)")
        manifest["kv_dtype"] = str(kv_dtype)
        sampler_kw["kv_dtype"] = jnp.dtype(kv_dtype)

    i32, f32 = jnp.int32, jnp.float32
    scalar_i = jax.ShapeDtypeStruct((), i32)
    scalar_f = jax.ShapeDtypeStruct((), f32)

    for p_bucket in manifest["prompt_buckets"]:
        for max_len in manifest["gen_buckets"]:

            def gen_fn(genre_ids, seeds, prompt, prompt_lens, temperature,
                       top_k, top_p, vocab_mask,
                       _l=max_len):
                return sampler(
                    model, params, genre_ids, seeds, prompt, prompt_lens,
                    temperature, top_k, top_p, vocab_mask,
                    max_len=_l, bos_id=bos_id, **sampler_kw)

            exp = jexport.export(jax.jit(gen_fn), platforms=platforms)(
                jax.ShapeDtypeStruct((b,), i32),          # genre_ids
                jax.ShapeDtypeStruct((b,), i32),          # seeds (per row)
                jax.ShapeDtypeStruct((b, p_bucket), i32),  # prompt
                jax.ShapeDtypeStruct((b,), i32),          # prompt_lens
                scalar_f,                                 # temperature
                scalar_i,                                 # top_k
                scalar_f,                                 # top_p
                jax.ShapeDtypeStruct((v,), jnp.bool_),    # vocab_mask
            )
            name = f"generate_P{p_bucket}_L{max_len}.shlo"
            with open(os.path.join(out_dir, name), "wb") as f:
                f.write(exp.serialize())
            manifest["files"]["generate"][f"{p_bucket}:{max_len}"] = name

    for t in manifest["score_buckets"]:

        def score_fn(tokens, genre_ids):
            return score_tokens(model, params, tokens, genre_ids)

        exp = jexport.export(jax.jit(score_fn), platforms=platforms)(
            jax.ShapeDtypeStruct((b, t), i32),
            jax.ShapeDtypeStruct((b,), i32),
        )
        name = f"score_T{t}.shlo"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exp.serialize())
        manifest["files"]["score"][str(t)] = name

    with open(os.path.join(out_dir, LM_MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=2)

    if verify:
        verify_lm_export(out_dir)
    return out_dir


def verify_lm_export(out_dir: str) -> None:
    """Reload through the runtime and generate + score at NON-bucket
    request shapes (codec convention, deploy/export.py:145-163) —
    including a mixed-prompt-length per-row batch."""
    rt = ExportedMusicLM(out_dir)
    length = max(1, rt.gen_buckets[0] - rt.gen_buckets[0] // 4)
    genres = np.zeros((2,), np.int32)
    toks = rt.generate(genres, length, seed=7, temperature=0.9, top_k=8,
                       forbidden=(rt.pad_id, rt.bos_id))
    assert toks.shape == (2, length), toks.shape
    assert toks.min() >= 0 and toks.max() < rt.vocab_size
    assert not np.isin(toks, [rt.pad_id, rt.bos_id]).any()
    # rows with different seeds differ; mixed prompt lengths dispatch
    assert not np.array_equal(toks[0], toks[1])
    p = rt.prompt_buckets[-1]
    if p > 1:
        prompts = [np.arange(2, 2 + min(3, p), dtype=np.int32),
                   np.arange(2, 2 + min(p, 5), dtype=np.int32)[::-1]]
        mixed = rt.generate_rows(
            genres, np.asarray([3, 4], np.int32), length, prompts=prompts,
            temperature=0.9, top_k=8, forbidden=(rt.pad_id, rt.bos_id))
        assert mixed.shape == (2, length), mixed.shape
    body = np.concatenate([np.full((2, 1), rt.bos_id, np.int32),
                           toks[:, : rt.score_buckets[0] - 1]], axis=1)
    nll, n = rt.score(body, genres)
    assert nll.shape == (2,) and np.isfinite(nll).all()
    assert (n == body.shape[1] - 1).all(), n
    print(f"LM export verification OK (generate at L={length}, "
          f"score at T={body.shape[1]})")


class ExportedMusicLM:
    """Serving runtime over an exported LM directory — the LM twin of
    ExportedPreEncoder (deploy/runtime.py): bucket selection + pad +
    trim around the serialized StableHLO programs."""

    def __init__(self, model_dir: str,
                 compilation_cache_dir: str | None = None):
        import jax
        from jax import export as jexport

        cache = (compilation_cache_dir
                 or os.environ.get("MQGAN_COMPILATION_CACHE"))
        if cache:
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)

        self.model_dir = model_dir
        with open(os.path.join(model_dir, LM_MANIFEST_NAME)) as f:
            self.manifest = json.load(f)
        if self.manifest.get("version", 1) < 2:
            raise ValueError(
                f"{model_dir} is a v1 LM export (scalar seed/prompt_len); "
                f"re-export with the current deploy.export_lm (v2 programs "
                f"take per-row seeds and prompt lengths)")
        self.gen_buckets = sorted(self.manifest["gen_buckets"])
        self.prompt_buckets = sorted(self.manifest["prompt_buckets"])
        self.score_buckets = sorted(self.manifest["score_buckets"])

        self._gen = {}
        for key, name in self.manifest["files"]["generate"].items():
            p, l = (int(x) for x in key.split(":"))
            with open(os.path.join(model_dir, name), "rb") as f:
                self._gen[(p, l)] = jexport.deserialize(f.read())
        self._score = {}
        for t_str, name in self.manifest["files"]["score"].items():
            with open(os.path.join(model_dir, name), "rb") as f:
                self._score[int(t_str)] = jexport.deserialize(f.read())

    # ---- config properties --------------------------------------------
    @property
    def vocab_size(self) -> int:
        return int(self.manifest["vocab_size"])

    @property
    def num_genres(self) -> int:
        return int(self.manifest["num_genres"])

    @property
    def pad_id(self) -> int:
        return int(self.manifest["pad_id"])

    @property
    def bos_id(self) -> int:
        return int(self.manifest["bos_id"])

    @property
    def lm_args(self) -> dict | None:
        """The training-run args embedded at export time (best.json),
        if any — lets an HTTP front end report run provenance."""
        return self.manifest.get("lm_args")

    @property
    def arch(self) -> str:
        """Which token-LM architecture the baked-in programs run."""
        return self.manifest.get("arch", "lstm")

    @staticmethod
    def _bucket(buckets, n, what):
        for t in buckets:
            if n <= t:
                return t
        raise ValueError(f"{what} {n} exceeds the largest exported "
                         f"bucket {buckets[-1]}")

    # --------------------------------------------------------------------
    def generate(
        self,
        genre_ids: np.ndarray,  # (B,) int
        length: int,
        *,
        seed,  # int (row b gets seed + b) or (B,) per-row seeds
        temperature: float = 1.0,
        top_k: int = 0,
        top_p: float = 0.0,
        prompt: np.ndarray | None = None,  # (B, P) int, shared length
        forbidden: Sequence[int] = (),
    ) -> np.ndarray:
        """(B, length) sampled continuation tokens. Row b matches the
        in-process per-row sampler (= a B=1 `generate_tokens`/
        `generate_tokens_transformer` run with rng=key(seed_b)) at the
        covering generation bucket, trimmed to `length` (the http_lm
        length-grid policy). A scalar seed derives per-row seeds
        seed + [0..B) so batched rows are distinct samples."""
        genre_ids = np.asarray(genre_ids, np.int32)
        b = genre_ids.shape[0]
        prompts = None if prompt is None else list(
            np.asarray(prompt, np.int32))
        return self.generate_rows(
            genre_ids, seed, length, prompts=prompts,
            temperature=temperature, top_k=top_k, top_p=top_p,
            forbidden=forbidden)

    def generate_rows(
        self,
        genre_ids: np.ndarray,  # (B,) int
        seeds,  # int scalar (-> seed + arange(B)) or (B,) per-row
        length: int,
        *,
        prompts=None,  # None | list of per-row None / 1-D int arrays
        temperature: float = 1.0,
        top_k: int = 0,
        top_p: float = 0.0,
        forbidden: Sequence[int] = (),
    ) -> np.ndarray:
        """The continuous-batching primitive: PER-ROW seeds and
        (mixed-length) prompts share one dispatch of the (P, L)-bucket
        program; each row's tokens equal its solo run (the served
        samplers' per-row contract, models/lm_sampling.py)."""
        genre_ids = np.asarray(genre_ids, np.int32)
        b = genre_ids.shape[0]
        seeds = np.asarray(seeds)
        if seeds.ndim == 0:
            seeds = seeds.astype(np.int64) + np.arange(b)
        seeds = seeds.astype(np.int32)
        if seeds.shape != (b,):
            raise ValueError(f"seeds shape {seeds.shape} != ({b},)")
        l_bucket = self._bucket(self.gen_buckets, length, "length")
        if prompts is None:
            prompts = [None] * b
        if len(prompts) != b:
            raise ValueError(f"{len(prompts)} prompts for {b} rows")
        p_lens = np.asarray(
            [0 if p is None else np.asarray(p).shape[0] for p in prompts],
            np.int32)
        p_bucket = self._bucket(self.prompt_buckets, max(1, p_lens.max()),
                                "prompt length")
        prompt_arr = np.zeros((b, p_bucket), np.int32)
        for i, p in enumerate(prompts):
            if p is not None:
                prompt_arr[i, : p_lens[i]] = np.asarray(p, np.int32)
        mask = np.ones((self.vocab_size,), bool)
        for t in forbidden:
            mask[int(t)] = False
        out = self._gen[(p_bucket, l_bucket)].call(
            genre_ids, seeds, prompt_arr, p_lens,
            np.float32(temperature), np.int32(top_k), np.float32(top_p),
            mask)
        return np.asarray(out)[:, :length]

    def score(self, tokens: np.ndarray, genre_ids: np.ndarray):
        """Per-row (nll_sum, n_valid) over BOS-prepended token rows;
        right-pads with pad_id to the covering score bucket (pad targets
        carry zero CE weight, so padding is exact)."""
        tokens = np.asarray(tokens, np.int32)
        genre_ids = np.asarray(genre_ids, np.int32)
        t_bucket = self._bucket(self.score_buckets, tokens.shape[1],
                                "token length")
        if tokens.shape[1] < t_bucket:
            pad = np.full((tokens.shape[0], t_bucket - tokens.shape[1]),
                          self.pad_id, np.int32)
            tokens = np.concatenate([tokens, pad], axis=1)
        nll, n = self._score[t_bucket].call(tokens, genre_ids)
        return np.asarray(nll), np.asarray(n)


def load_lm_from_run(lm_run: str):
    """(model, params, lm_args) from an lstm_trainer out_dir
    (best.json + orbax checkpoint) — the loading recipe deploy/http_lm.py
    uses, shared here for the export CLI. Arch-aware: `args["arch"]`
    (lstm_trainer --arch, default lstm) picks the model via
    models/token_lm.py:build_token_lm, so transformer runs export and
    serve exactly like LSTM runs."""
    import jax
    import jax.numpy as jnp

    from mqgan_tpu.models.token_lm import build_token_lm
    from mqgan_tpu.utils.checkpoint import load_pretrained_generator

    with open(os.path.join(lm_run, "best.json")) as f:
        best = json.load(f)
    a = best["args"]
    model = build_token_lm(a, dropout=0.0, for_inference=True)
    tok0 = jnp.zeros((1, 4), jnp.int32)
    template = jax.jit(model.init)(
        jax.random.key(0), tok0, jnp.zeros((1,), jnp.int32), None
    )["params"]
    params = load_pretrained_generator(best["path"], (), 0,
                                       template=template)
    return model, params, a


def main(argv=None):
    from mqgan_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser(
        description="Export a trained token LM to deployable StableHLO "
                    "(generation + scoring programs).")
    p.add_argument("--lm_run", required=True,
                   help="lstm_trainer out_dir (reads best.json + ckpt)")
    p.add_argument("--output", required=True)
    p.add_argument("--gen_buckets", type=int, nargs="+",
                   default=list(DEFAULT_GEN_BUCKETS))
    p.add_argument("--prompt_buckets", type=int, nargs="+",
                   default=list(DEFAULT_PROMPT_BUCKETS))
    p.add_argument("--score_buckets", type=int, nargs="+",
                   default=list(DEFAULT_SCORE_BUCKETS))
    p.add_argument("--kv_bf16", action="store_true",
                   help="bake a bfloat16 KV cache into the transformer "
                        "generation programs (halves decode attention "
                        "reads; scores/softmax stay fp32)")
    args = p.parse_args(argv)

    model, params, a = load_lm_from_run(args.lm_run)
    export_music_lm(
        model, params, args.output,
        gen_buckets=args.gen_buckets,
        prompt_buckets=args.prompt_buckets,
        score_buckets=args.score_buckets,
        bos_id=a["bos_id"], lm_args=a,
        kv_dtype="bfloat16" if args.kv_bf16 else None,
    )
    print(f"exported LM to {args.output}")


if __name__ == "__main__":
    main()
