"""Benchmark harness for the five BASELINE.json configs.

  1  single-mel encode->FSQ->decode latency (reencode-from-checkpoint path)
  2  wav->mel batch extraction (spec_config_hifispeech)
  3  full GAN train step, hifispeech (warmup + GAN phases)
  4  full GAN train step, hifimusic
  5  directory-scale re-encode throughput (B=64, the bench.py headline)

Runs on whatever device JAX selects (the real TPU chip under the driver).
Timing uses distinct inputs per iteration and per-iteration forced host
fetches (the tunneled backend executes lazily and caches repeated identical
dispatches — see benchmarks/README.md).

Usage: python benchmarks/bench_all.py [--configs 1 2 5] [--out results.json]
Each result prints as one JSON line and is written to the output file.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 6


def _timeit(fn, inputs, warm_inputs):
    import jax.numpy as jnp

    for w in warm_inputs:
        float(jnp.sum(fn(*w).astype(jnp.float32)))
    ts = []
    for args in inputs:
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def _gen_and_params(cfg, dtype, b, t):
    import jax
    import jax.numpy as jnp

    from mqgan_tpu.models.preencoder import PreEncoder

    gen = PreEncoder.from_config(cfg.model.mel_channels, cfg.model.generator, dtype)
    mel = jnp.zeros((b, t, cfg.model.mel_channels), jnp.float32)
    lens = jnp.full((b,), t, jnp.int32)
    params = jax.jit(gen.init)(jax.random.key(0), mel, lens)
    return gen, params


def bench_single_mel():
    """Config 1: one mel through encode+decode, B=1 T=512 latency."""
    import jax
    import jax.numpy as jnp

    from mqgan_tpu.core.config import TrainConfig
    from mqgan_tpu.models.preencoder import PreEncoder

    cfg = TrainConfig.from_dict({})
    gen, params = _gen_and_params(cfg, jnp.bfloat16, 1, 512)
    pad = jnp.zeros((1, 512), bool)

    @jax.jit
    def reencode(mel):
        idx = gen.apply(params, mel, pad, method=PreEncoder.encode)
        return gen.apply(params, idx, pad, method=PreEncoder.decode)

    rng = np.random.default_rng(0)
    mk = lambda: (jnp.asarray(rng.standard_normal((1, 512, 128)).astype(np.float32)),)
    med = _timeit(reencode, [mk() for _ in range(ITERS)], [mk(), mk()])
    return {
        "config": "1_single_mel_reencode",
        "latency_ms": round(med * 1000, 2),
        "mel_frames_per_sec": round(512 / med, 1),
    }


def bench_wav_to_mel():
    """Config 2: batch wav->mel extraction, hifispeech spec."""
    import jax.numpy as jnp

    from mqgan_tpu.core.config import SpectrogramConfig
    from mqgan_tpu.signal.mel import MelFrontend

    cfg = SpectrogramConfig()
    fe = MelFrontend(cfg)
    rng = np.random.default_rng(0)
    b, s = 8, 44100 * 5
    mk = lambda: (jnp.asarray(rng.standard_normal((b, s)).astype(np.float32) * 0.3),)
    med = _timeit(lambda w: fe(w), [mk() for _ in range(ITERS)], [mk(), mk()])
    frames = b * (s // cfg.hop_length + 1)
    return {
        "config": "2_wav_to_mel_batch",
        "latency_ms": round(med * 1000, 2),
        "mel_frames_per_sec": round(frames / med, 1),
    }


PRACTICAL_PEAK_FLOPS = 216e12  # measured bf16 peak, benchmarks/README.md


def _bench_train(cfg, mel_ch, tag, b=16, t=256, remat=False,
                 fast_dropout=False, mixer_chunk_t=None,
                 remat_refiner=False, grad_accum=1, ema_decay=0.0):
    import jax
    import jax.numpy as jnp

    from mqgan_tpu.train.state import create_train_state
    from mqgan_tpu.train.step import build_models, make_train_step

    gen_over = {}
    if remat:
        gen_over["remat"] = True
    if remat_refiner:
        gen_over["remat_refiner"] = True
    if fast_dropout:
        gen_over["fast_dropout"] = True
    if mixer_chunk_t is not None:
        gen_over["mixer_chunk_t"] = mixer_chunk_t
    if gen_over:
        import dataclasses

        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, generator=dataclasses.replace(
                cfg.model.generator, **gen_over)))
    gen, patch, mb = build_models(cfg, jnp.bfloat16)
    rng = np.random.default_rng(0)
    mels = [jnp.asarray(rng.standard_normal((b, t, mel_ch)).astype(np.float32))
            for _ in range(ITERS + 2)]
    lens = jnp.full((b,), t, jnp.int32)
    # the shipped training default (rbg since round 3 — dropout masks were
    # 59% of the step under threefry, benchmarks/ablate_step.py)
    k = jax.random.key(0, impl=cfg.training.rng_impl)
    state0, _, _ = create_train_state(
        gen_variables=jax.jit(gen.init)(k, mels[0], lens),
        patch_variables=jax.jit(patch.init)(k, mels[0], lens),
        multibin_variables=jax.jit(mb.init)(k, mels[0], lens),
        training_cfg=cfg.training, rng=k,
    )
    if ema_decay > 0:
        state0 = state0.replace(
            gen_ema=jax.tree_util.tree_map(jnp.copy, state0.gen_params))
    out = {"config": tag, "batch": b, "frames": t, "remat": remat}
    # record every non-default generator knob so result JSONs are
    # self-describing without parsing the tag string
    out.update({k: v for k, v in gen_over.items() if k != "remat"})
    if grad_accum > 1:
        out["grad_accum"] = grad_accum
    if ema_decay > 0:
        out["ema_decay"] = ema_decay
    for phase, train_d in [("warmup", False), ("gan", True)]:
        step = make_train_step(cfg, train_d=train_d, dtype=jnp.bfloat16,
                               grad_accum=grad_accum, ema_decay=ema_decay)
        # compile once via AOT (also yields the XLA FLOP count for MFU),
        # then call the compiled executable directly — the jit cache is not
        # populated by lower().compile(), and a second compile through the
        # tunnel costs minutes
        state = jax.tree_util.tree_map(jnp.copy, state0)
        compiled = step.lower(state, mels[0], lens).compile()
        try:
            flops = (compiled.cost_analysis() or {}).get("flops", 0.0)
        except Exception:
            flops = 0.0
        # steady-state: chain the donated state, submit every step's
        # dispatch, then force each step's metrics to host
        state, m = compiled(state, mels[-1], lens)
        float(m["loss_g_total"])
        t0 = time.perf_counter()
        ms = []
        for i in range(ITERS):
            state, m = compiled(state, mels[i], lens)
            ms.append(m)
        for m in ms:
            float(m["loss_g_total"])
        per = (time.perf_counter() - t0) / ITERS
        out[f"{phase}_ms_per_step"] = round(per * 1000, 1)
        out[f"{phase}_frames_per_sec"] = round(b * t / per, 1)
        if flops:
            out[f"{phase}_mfu_vs_practical_peak"] = round(
                flops / per / PRACTICAL_PEAK_FLOPS, 3)
    return out


def bench_train_hifispeech():
    from mqgan_tpu.core.config import TrainConfig

    return _bench_train(TrainConfig.from_dict({}), 128, "3_train_step_hifispeech")


def bench_train_hifispeech_b64():
    """Large-batch variant: B=64 with remat (checkpoint-chunked mixers)."""
    from mqgan_tpu.core.config import TrainConfig

    return _bench_train(TrainConfig.from_dict({}), 128,
                        "3b_train_step_hifispeech_b64", b=64, remat=True)


def bench_train_b64_fast_dropout():
    """A/B: B=64 remat + --fast_dropout (Gaussian mixer dropout)."""
    from mqgan_tpu.core.config import TrainConfig

    return _bench_train(TrainConfig.from_dict({}), 128,
                        "3bf_train_step_b64_fast_dropout", b=64, remat=True,
                        fast_dropout=True)


def bench_train_hifispeech_b128_grad_accum():
    """hifispeech EFFECTIVE B=128 — 2x the largest one-pass batch (B=64
    needs remat and peaks at 14.3G) — via --grad_accum 2 over B=64
    microbatches."""
    from mqgan_tpu.core.config import TrainConfig

    return _bench_train(TrainConfig.from_dict({}), 128,
                        "3ba_train_step_hifispeech_b128_grad_accum2",
                        b=128, remat=True, grad_accum=2)


def bench_train_b64_ema():
    """A/B: B=64 remat + --ema 0.999 (in-step generator weight EMA) —
    one extra fused multiply-add over the param tree per step."""
    from mqgan_tpu.core.config import TrainConfig

    return _bench_train(TrainConfig.from_dict({}), 128,
                        "3be_train_step_b64_ema", b=64, remat=True,
                        ema_decay=0.999)


def bench_train_b64_chunk64():
    """A/B: B=64 remat with 64-frame mixer chunks (serialization trade)."""
    from mqgan_tpu.core.config import TrainConfig

    return _bench_train(TrainConfig.from_dict({}), 128,
                        "3bc_train_step_b64_chunk64", b=64, remat=True,
                        mixer_chunk_t=64)


def _hifimusic_cfg():
    """The reference hifimusic config, or its literal spec if the
    reference tree is absent."""
    import dataclasses

    from mqgan_tpu.core.config import GeneratorConfig, ModelConfig, TrainConfig

    path = "/root/reference/configs/model_config_hifimusic.yaml"
    if os.path.exists(path):
        return TrainConfig.from_yaml(path)
    return dataclasses.replace(TrainConfig.from_dict({}), model=ModelConfig(
        mel_channels=160,
        generator=GeneratorConfig(channels=(384, 384, 512, 512),
                                  refiner_base_channels=96),
    ))


def bench_train_hifimusic():
    cfg = _hifimusic_cfg()
    return _bench_train(cfg, cfg.model.mel_channels, "4_train_step_hifimusic")


def bench_train_hifimusic_b32():
    """Large-batch hifimusic: B=32 with remat (the hifispeech 3b analog).

    B=64 does NOT fit this model even with chunked mixer hiddens: the
    160-mel refiner (base 96, depth 3) backward wants 18.31G of 15.75G
    HBM (measured OOM 2026-08-18) — its feature-map temps, not the mixer
    hiddens, are the binding allocation at this scale."""
    cfg = _hifimusic_cfg()
    return _bench_train(cfg, cfg.model.mel_channels,
                        "4b_train_step_hifimusic_b32", b=32, remat=True)


def bench_train_hifimusic_b32_fast_dropout():
    """A/B: the best-MFU config (4b) plus --fast_dropout."""
    cfg = _hifimusic_cfg()
    return _bench_train(cfg, cfg.model.mel_channels,
                        "4bf_train_step_hifimusic_b32_fast_dropout",
                        b=32, remat=True, fast_dropout=True)


def bench_train_hifimusic_b64_grad_accum():
    """hifimusic EFFECTIVE B=64 on one 16G chip — the batch no remat
    setting can fit in one pass (18.31G of 15.75G HBM) — via
    --grad_accum 2: two scanned B=32 microbatches per optimizer update
    (one-pass numerics on pad-free batches, LeCam EMA aggregated over the
    full 64). MFU here is computed from the accumulated step's own XLA
    FLOP count, which includes the extra G+D forward the schedule pays."""
    cfg = _hifimusic_cfg()
    return _bench_train(cfg, cfg.model.mel_channels,
                        "4ba_train_step_hifimusic_b64_grad_accum2",
                        b=64, remat=True, grad_accum=2)


def bench_train_hifimusic_b48_remat_refiner():
    """hifimusic B=48: fits ONLY with --remat_refiner on top of the
    chunked mixers (measured 2026-08-18: the plain-remat B=48 GAN step
    fails compile-side OOM; with refiner ConvBlock recompute it runs).
    B=64 still exceeds the chip even with it (runtime
    RESOURCE_EXHAUSTED) — the step's remaining buffers, not refiner
    feature maps, bind there."""
    cfg = _hifimusic_cfg()
    return _bench_train(cfg, cfg.model.mel_channels,
                        "4br_train_step_hifimusic_b48_remat_refiner",
                        b=48, remat=True, remat_refiner=True)


def bench_token_lm(hoisted: bool = True):
    """Config 6: token-LM train step (2-layer LSTM 1024, B=32 L=512,
    bf16, AdamW + masked CE — the train_music_lstm_v2 workload).

    hoisted=False swaps the shipped HoistedLSTMLayer (input projections
    out of the scan) back to flax's nn.RNN(nn.OptimizedLSTMCell) rollout
    on the SAME params — the A/B for the hoisting optimization."""
    import jax
    import jax.numpy as jnp
    import optax
    from flax import linen as nn

    from mqgan_tpu.models.music_lstm import MusicLSTM, masked_ce_loss

    b, l, vocab = 32, 512, 1003

    class CellRollout(MusicLSTM):
        # identical param tree; only the recurrence implementation differs
        @nn.compact
        def __call__(self, tokens, genre_ids, lengths=None,
                     deterministic=True):
            tok_e = nn.Embed(self.vocab_size, self.emb_dim,
                             dtype=self.dtype, name="tok_emb")(tokens)
            tok_e = jnp.where((tokens == self.pad_id)[..., None],
                              jnp.zeros((), tok_e.dtype), tok_e)
            gen_e = nn.Embed(self.num_genres, self.emb_dim,
                             dtype=self.dtype,
                             name="genre_emb")(genre_ids)[:, None, :]
            x = tok_e + gen_e
            for i in range(self.lstm_layers):
                cell = nn.OptimizedLSTMCell(self.lstm_hid, dtype=self.dtype,
                                            name=f"lstm_{i}")
                x = nn.RNN(cell, name=f"rnn_{i}")(x)
            x = nn.Dropout(rate=self.dropout,
                           deterministic=deterministic)(x)
            return nn.Dense(self.vocab_size, dtype=self.dtype,
                            name="proj")(x)

    cls = MusicLSTM if hoisted else CellRollout
    model = cls(vocab_size=vocab, num_genres=10, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    toks = [jnp.asarray(rng.integers(1, 1000, (b, l)).astype(np.int32))
            for _ in range(ITERS + 2)]
    genres = jnp.asarray(rng.integers(0, 10, (b,)).astype(np.int32))
    params = jax.jit(model.init)(jax.random.key(0), toks[0], genres)
    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)

    def step(params, opt_state, tokens):
        def loss_fn(p):
            logits = model.apply(p, tokens[:, :-1], genres)
            loss, _ = masked_ce_loss(logits, tokens[:, 1:])
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    compiled = jax.jit(step, donate_argnums=(0, 1)).lower(
        params, opt_state, toks[0]).compile()
    params, opt_state, loss = compiled(params, opt_state, toks[-1])
    float(loss)
    t0 = time.perf_counter()
    losses = []
    for i in range(ITERS):
        params, opt_state, loss = compiled(params, opt_state, toks[i])
        losses.append(loss)
    for x in losses:
        float(x)
    per = (time.perf_counter() - t0) / ITERS
    return {
        "config": ("6_token_lm_train" if hoisted
                   else "6c_token_lm_train_cell_rollout"),
        "batch": b, "seq_len": l, "hoisted_input_proj": hoisted,
        "ms_per_step": round(per * 1000, 1),
        "tokens_per_sec": round(b * (l - 1) / per, 1),
    }


def bench_token_transformer(b: int = 32, l: int = 512):
    """Config 6t: transformer token-LM train step (models/
    token_transformer.py; emb 512, 6 layers, 8 heads, mlp x4 ~= 19.9M
    params vs the LSTM's 16.4M) at the SAME batch/length/precision/
    optimizer as config 6 — the MXU-parallel architecture A/B against
    the recurrence-bound LSTM."""
    import jax
    import jax.numpy as jnp
    import optax

    from mqgan_tpu.models.music_lstm import masked_ce_loss
    from mqgan_tpu.models.token_transformer import MusicTransformer

    vocab = 1003
    model = MusicTransformer(vocab_size=vocab, num_genres=10,
                             dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    toks = [jnp.asarray(rng.integers(1, 1000, (b, l)).astype(np.int32))
            for _ in range(ITERS + 2)]
    genres = jnp.asarray(rng.integers(0, 10, (b,)).astype(np.int32))
    params = jax.jit(model.init)(jax.random.key(0), toks[0][:, :-1], genres)
    n_params = sum(int(np.prod(np.shape(x)))
                   for x in jax.tree.leaves(params))
    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)

    def step(params, opt_state, tokens):
        def loss_fn(p):
            logits = model.apply(p, tokens[:, :-1], genres)
            loss, _ = masked_ce_loss(logits, tokens[:, 1:])
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    compiled = jax.jit(step, donate_argnums=(0, 1)).lower(
        params, opt_state, toks[0]).compile()
    params, opt_state, loss = compiled(params, opt_state, toks[-1])
    float(loss)
    t0 = time.perf_counter()
    losses = []
    for i in range(ITERS):
        params, opt_state, loss = compiled(params, opt_state, toks[i])
        losses.append(loss)
    for x in losses:
        float(x)
    per = (time.perf_counter() - t0) / ITERS
    return {
        "config": "6t_token_transformer_train",
        "batch": b, "seq_len": l, "params_m": round(n_params / 1e6, 1),
        "ms_per_step": round(per * 1000, 1),
        "tokens_per_sec": round(b * (l - 1) / per, 1),
    }


def bench_lm_generate_transformer(b: int = 64, gen_len: int = 512):
    """Config 7t: transformer token-LM GENERATION throughput at the same
    controls as config 7 (temperature 1.0, top-k 64, specials forbidden):
    one MXU prefill of the BOS + a KV-cache lax.scan decode
    (generate_tokens_transformer)."""
    import jax
    import jax.numpy as jnp

    from mqgan_tpu.models.lm_sampling import generate_tokens_transformer
    from mqgan_tpu.models.token_transformer import MusicTransformer

    vocab = 1003
    model = MusicTransformer(vocab_size=vocab, num_genres=10,
                             dtype=jnp.bfloat16)
    genres = jnp.zeros((b,), jnp.int32)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((b, 8), jnp.int32), genres)["params"]

    @jax.jit
    def generate(rng):
        toks = generate_tokens_transformer(
            model, params, genres, rng, gen_len, temperature=1.0,
            top_k=64, forbidden_tokens=(0, 1, 2))
        return toks, jnp.sum(toks)

    keys = jax.random.split(jax.random.key(7), ITERS + 2)
    for k in keys[ITERS:]:  # compile + warm with distinct keys
        float(generate(k)[1])
    t0 = time.perf_counter()
    outs = [generate(keys[i]) for i in range(ITERS)]
    for o in outs:
        float(o[1])
    per = (time.perf_counter() - t0) / ITERS
    return {
        "config": f"7t_lm_generate_transformer_b{b}",
        "batch": b, "gen_len": gen_len, "top_k": 64,
        "ms_total": round(per * 1000, 1),
        "ms_per_token_step": round(per * 1000 / gen_len, 3),
        "tokens_per_sec": round(b * gen_len / per, 1),
    }


def bench_lm_generate(b: int = 64, gen_len: int = 512):
    """Config 7: token-LM autoregressive GENERATION throughput (sampling).

    Net-new serving surface — the reference trains the LSTM LM
    (/root/reference/train_music_lstm_v2.py) but ships no generation code;
    models/lm_sampling.py is ours. The whole generation is ONE compiled
    lax.scan (no per-token host dispatch), so the number is device-side
    sampling throughput: flagship LM dims (2-layer LSTM 1024, emb 512,
    vocab 1003 = FSQ [8,5,5,5] + specials), temperature 1.0, top-k 64,
    specials forbidden (the music_continuation defaults).
    """
    import jax
    import jax.numpy as jnp

    from mqgan_tpu.models.lm_sampling import generate_tokens
    from mqgan_tpu.models.music_lstm import MusicLSTM

    vocab = 1003
    model = MusicLSTM(vocab_size=vocab, num_genres=10, dtype=jnp.bfloat16)
    genres = jnp.zeros((b,), jnp.int32)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((b, 8), jnp.int32), genres)["params"]

    @jax.jit
    def generate(rng):
        toks = generate_tokens(model, params, genres, rng, gen_len,
                               temperature=1.0, top_k=64,
                               forbidden_tokens=(0, 1, 2))
        # tiny scalar: forces execution + host fetch on the lazy tunnel
        return toks, jnp.sum(toks)

    keys = jax.random.split(jax.random.key(7), ITERS + 2)
    for k in keys[ITERS:]:  # compile + warm with distinct keys
        float(generate(k)[1])
    t0 = time.perf_counter()
    outs = [generate(keys[i]) for i in range(ITERS)]
    for o in outs:
        float(o[1])
    per = (time.perf_counter() - t0) / ITERS
    return {
        "config": f"7_lm_generate_b{b}",
        "batch": b, "gen_len": gen_len, "top_k": 64,
        "ms_total": round(per * 1000, 1),
        "ms_per_token_step": round(per * 1000 / gen_len, 3),
        "tokens_per_sec": round(b * gen_len / per, 1),
    }


def bench_lm_generate_served(b: int = 64, gen_len: int = 512):
    """Config 7s: the EXPORTED sampler's program (generate_tokens_served,
    deploy/export_lm.py) at the same flagship dims / controls as config 7
    — the cost of making every sampling control a traced runtime argument
    (always-on dynamic top-k AND nucleus thresholds = two sorts per step
    instead of config 7's one static top-k sort; prompt bucket P=1)."""
    import jax
    import jax.numpy as jnp

    from mqgan_tpu.models.lm_sampling import generate_tokens_served
    from mqgan_tpu.models.music_lstm import MusicLSTM

    vocab = 1003
    model = MusicLSTM(vocab_size=vocab, num_genres=10, dtype=jnp.bfloat16)
    genres = jnp.zeros((b,), jnp.int32)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((b, 8), jnp.int32), genres)["params"]
    mask = np.ones((vocab,), bool)
    mask[[0, 1, 2]] = False
    mask = jnp.asarray(mask)
    prompt = jnp.zeros((b, 1), jnp.int32)

    @jax.jit
    def generate(seed):
        # per-row v2 signature: row seeds seed+[0..b), prompt_lens (B,)
        toks = generate_tokens_served(
            model, params, genres, seed + jnp.arange(b, dtype=jnp.int32),
            prompt, jnp.zeros((b,), jnp.int32),
            jnp.float32(1.0), jnp.int32(64), jnp.float32(0.0), mask,
            max_len=gen_len)
        return toks, jnp.sum(toks)

    seeds = [jnp.int32(100 + i) for i in range(ITERS + 2)]
    for s in seeds[ITERS:]:  # compile + warm with distinct seeds
        float(generate(s)[1])
    t0 = time.perf_counter()
    outs = [generate(seeds[i]) for i in range(ITERS)]
    for o in outs:
        float(o[1])
    per = (time.perf_counter() - t0) / ITERS
    return {
        "config": f"7s_lm_generate_served_b{b}",
        "batch": b, "gen_len": gen_len, "top_k": 64,
        "ms_total": round(per * 1000, 1),
        "ms_per_token_step": round(per * 1000 / gen_len, 3),
        "tokens_per_sec": round(b * gen_len / per, 1),
    }


def bench_vocoder_train(adversarial: bool = False, bf16: bool = False):
    """Vocoder (ISTFTNetGenerator, models/istft_vocoder.py) train-step
    throughput — flagship-shaped: 128 mels, hop 512, upsample 8x8,
    n_fft 16, initial channel 512; B=16 x 32-frame segments (16,384
    samples). Spectral (MR-STFT) objective; adversarial=True adds the
    HiFi-GAN MPD/MSD D-then-G schedule (train/vocoder_trainer.py);
    bf16=True is the trainer's --bf16 (conv stack bf16, heads/loss
    fp32)."""
    import jax
    import jax.numpy as jnp
    import optax

    from mqgan_tpu.models.istft_vocoder import ISTFTNetGenerator
    from mqgan_tpu.losses.stft_loss import multi_resolution_stft_loss
    from mqgan_tpu.signal.stft import istft

    b, frames, mels, hop = 16, 32, 128, 512
    n_fft, istft_hop = 16, hop // 64
    gen = ISTFTNetGenerator(
        n_mels=mels, upsample_rates=(8, 8),
        upsample_kernel_sizes=(17, 17), upsample_initial_channel=512,
        istft_n_fft=n_fft, dtype=jnp.bfloat16 if bf16 else None)
    rng = np.random.default_rng(0)
    target_len = frames * hop
    mels_in = [jnp.asarray(rng.standard_normal((b, mels, frames)).astype(np.float32))
               for _ in range(ITERS + 2)]
    wavs = [jnp.asarray(rng.standard_normal((b, target_len)).astype(np.float32))
            for _ in range(ITERS + 2)]
    params = jax.jit(gen.init)(jax.random.key(0), mels_in[0])
    tx = optax.adamw(2e-4)
    opt = tx.init(params)

    def synth(p, mel):
        # n = min(pred_len, target_len), both sides sliced — exactly
        # train/vocoder_trainer.py's loss_fn contract
        spec, phase = gen.apply(p, mel)
        return istft(spec, phase, n_fft, istft_hop, n_fft)[:, 0, :target_len]

    probe = jax.eval_shape(lambda p, m: synth(p, m), params, mels_in[0])
    n_cmp = min(probe.shape[1], target_len)

    if adversarial:
        from mqgan_tpu.models.wave_discriminators import (
            MultiPeriodDiscriminator,
            MultiScaleDiscriminator,
            adversarial_d_loss,
            adversarial_g_loss,
            feature_matching_loss,
        )

        mpd = MultiPeriodDiscriminator(periods=(2, 3, 5, 7, 11))
        msd = MultiScaleDiscriminator(n_scales=3)
        wav_ex = jnp.zeros((b, target_len))
        d_params = {
            "mpd": jax.jit(mpd.init)(jax.random.key(1), wav_ex)["params"],
            "msd": jax.jit(msd.init)(jax.random.key(2), wav_ex)["params"],
        }
        d_tx = optax.adamw(2e-4)
        d_opt = d_tx.init(d_params)

        def step(carry, mel, wav):
            p, o, dp, do = carry
            # common-length slice on BOTH branches, exactly
            # train/vocoder_trainer.py:209's adv_step_fn contract
            wav = wav[:, :n_cmp]
            fake = jax.lax.stop_gradient(synth(p, mel))[:, :n_cmp]

            def d_loss(dp):
                lr_m, _ = mpd.apply({"params": dp["mpd"]}, wav)
                lf_m, _ = mpd.apply({"params": dp["mpd"]}, fake)
                lr_s, _ = msd.apply({"params": dp["msd"]}, wav)
                lf_s, _ = msd.apply({"params": dp["msd"]}, fake)
                # same call shapes as train/vocoder_trainer.py:218
                return adversarial_d_loss([lr_m, lr_s], [lf_m, lf_s])

            dl, d_grads = jax.value_and_grad(d_loss)(dp)
            du, do2 = d_tx.update(d_grads, do, dp)
            dp2 = optax.apply_updates(dp, du)

            def g_loss(p):
                pred = synth(p, mel)[:, :n_cmp]
                loss = 45.0 * multi_resolution_stft_loss(pred, wav[:, :n_cmp])
                lg_m, fg_m = mpd.apply({"params": dp2["mpd"]}, pred)
                _, fr_m = mpd.apply({"params": dp2["mpd"]}, wav)
                lg_s, fg_s = msd.apply({"params": dp2["msd"]}, pred)
                _, fr_s = msd.apply({"params": dp2["msd"]}, wav)
                # same call shapes as train/vocoder_trainer.py:238-239
                loss = loss + adversarial_g_loss([lg_m, lg_s])
                loss = loss + 2.0 * feature_matching_loss(
                    [*fr_m, *fr_s], [*fg_m, *fg_s])
                return loss

            gl, g_grads = jax.value_and_grad(g_loss)(p)
            gu, o2 = tx.update(g_grads, o, p)
            p2 = optax.apply_updates(p, gu)
            return (p2, o2, dp2, do2), gl + dl

        carry0 = (params, opt, d_params, d_opt)
        tag = "8a_vocoder_train_step_adversarial"
    else:
        def step(carry, mel, wav):
            p, o = carry

            def loss_fn(p):
                return multi_resolution_stft_loss(
                    synth(p, mel)[:, :n_cmp], wav[:, :n_cmp])

            loss, grads = jax.value_and_grad(loss_fn)(p)
            u, o2 = tx.update(grads, o, p)
            return (optax.apply_updates(p, u), o2), loss

        carry0 = (params, opt)
        tag = "8_vocoder_train_step"

    jstep = jax.jit(step, donate_argnums=(0,))
    compiled = jstep.lower(carry0, mels_in[0], wavs[0]).compile()
    try:
        flops = (compiled.cost_analysis() or {}).get("flops", 0.0)
    except Exception:
        flops = 0.0
    carry, l0 = compiled(carry0, mels_in[-1], wavs[-1])
    float(l0)
    t0 = time.perf_counter()
    ls = []
    for i in range(ITERS):
        carry, l = compiled(carry, mels_in[i], wavs[i])
        ls.append(l)
    for l in ls:
        float(l)
    per = (time.perf_counter() - t0) / ITERS
    out = {
        "config": tag + ("_bf16" if bf16 else ""),
        "batch": b, "segment_frames": frames,
        "ms_per_step": round(per * 1000, 1),
        "samples_per_sec": round(b * target_len / per, 1),
    }
    if flops:
        out["mfu_vs_practical_peak"] = round(
            flops / per / PRACTICAL_PEAK_FLOPS, 3)
    return out


def bench_directory_scale(poly_mixers: bool = False):
    """Config 5: the bench.py headline (B=64 T=512 reencode throughput).

    poly_mixers=True A/Bs the Chebyshev mixer serving path
    (ops/mixer_poly.py) on the same params and also reports its max output
    deviation vs the exact path on one batch.
    """
    import jax
    import jax.numpy as jnp

    from mqgan_tpu.core.config import TrainConfig
    from mqgan_tpu.models.preencoder import PreEncoder

    cfg = TrainConfig.from_dict({})
    b, t = 64, 512
    gen, params = _gen_and_params(cfg, jnp.bfloat16, b, t)
    pad = jnp.zeros((b, t), bool)
    gen_run = gen.clone(poly_mixers=True) if poly_mixers else gen

    @jax.jit
    def reencode(mel):
        idx = gen_run.apply(params, mel, pad, method=PreEncoder.encode)
        return gen_run.apply(params, idx, pad, method=PreEncoder.decode)

    rng = np.random.default_rng(0)
    mk = lambda: (jnp.asarray(rng.standard_normal((b, t, 128)).astype(np.float32)),)
    med = _timeit(reencode, [mk() for _ in range(ITERS)], [mk(), mk()])
    out = {
        "config": ("5p_reencode_poly_mixers" if poly_mixers
                   else "5_directory_scale_reencode"),
        "latency_ms": round(med * 1000, 2),
        "mel_frames_per_sec": round(b * t / med, 1),
    }
    if poly_mixers:
        # Decompose the end-to-end deviation: the poly pre-mixer's ~1e-4
        # perturbation can flip FSQ codes on a rounding boundary, and each
        # flip changes the decode by a whole code step — that discrete
        # effect, not interpolation error, dominates max-abs deviation.
        # Report (a) the encode token flip rate and (b) the decode-only
        # deviation on IDENTICAL tokens (the `--poly_mixers decode` mode).
        gen_dec = gen.clone(poly_mixers="decode")

        @jax.jit
        def encode_exact(mel):
            return gen.apply(params, mel, pad, method=PreEncoder.encode)

        @jax.jit
        def encode_poly(mel):
            return gen_run.apply(params, mel, pad, method=PreEncoder.encode)

        @jax.jit
        def decode_exact(idx):
            return gen.apply(params, idx, pad, method=PreEncoder.decode)

        @jax.jit
        def decode_poly(idx):
            return gen_dec.apply(params, idx, pad, method=PreEncoder.decode)

        x = mk()[0]
        a = np.asarray(reencode(x), np.float32)
        idx_e = encode_exact(x)
        e = np.asarray(decode_exact(idx_e), np.float32)
        scale = float(np.abs(e).max())
        out["max_abs_deviation"] = round(float(np.abs(a - e).max()), 5)
        out["deviation_rel_to_max"] = round(
            float(np.abs(a - e).max()) / max(scale, 1e-9), 6)
        idx_p = np.asarray(encode_poly(x))
        out["token_flip_rate"] = round(
            float((np.asarray(idx_e) != idx_p).mean()), 6)
        d = np.asarray(decode_poly(idx_e), np.float32)
        out["decode_only_max_abs_dev"] = round(float(np.abs(d - e).max()), 6)
        out["decode_only_dev_rel_to_max"] = round(
            float(np.abs(d - e).max()) / max(scale, 1e-9), 6)

        @jax.jit
        def reencode_dec(mel):
            idx = gen.apply(params, mel, pad, method=PreEncoder.encode)
            return gen_dec.apply(params, idx, pad, method=PreEncoder.decode)

        med_d = _timeit(reencode_dec, [mk() for _ in range(ITERS)],
                        [mk(), mk()])
        out["decode_only_latency_ms"] = round(med_d * 1000, 2)
        out["decode_only_mel_frames_per_sec"] = round(b * t / med_d, 1)
    return out


BENCHES = {
    "1": bench_single_mel,
    "2": bench_wav_to_mel,
    "3": bench_train_hifispeech,
    "3b": bench_train_hifispeech_b64,
    "3bf": bench_train_b64_fast_dropout,
    "3ba": bench_train_hifispeech_b128_grad_accum,
    "3bc": bench_train_b64_chunk64,
    "3be": bench_train_b64_ema,
    "4": bench_train_hifimusic,
    "4b": bench_train_hifimusic_b32,
    "4bf": bench_train_hifimusic_b32_fast_dropout,
    "4br": bench_train_hifimusic_b48_remat_refiner,
    "4ba": bench_train_hifimusic_b64_grad_accum,
    "5": bench_directory_scale,
    "6": bench_token_lm,
    "6c": lambda: bench_token_lm(hoisted=False),
    "6t": bench_token_transformer,
    "7t": bench_lm_generate_transformer,
    "7tb": lambda: bench_lm_generate_transformer(b=1),
    "5p": lambda: bench_directory_scale(poly_mixers=True),
    "7": bench_lm_generate,
    "7b": lambda: bench_lm_generate(b=1),
    "7s": bench_lm_generate_served,
    "7sb": lambda: bench_lm_generate_served(b=1),
    "8": bench_vocoder_train,
    "8a": lambda: bench_vocoder_train(adversarial=True),
    "8f": lambda: bench_vocoder_train(bf16=True),
    "8af": lambda: bench_vocoder_train(adversarial=True, bf16=True),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", nargs="+",
                   default=["1", "2", "3", "3b", "4", "5"],
                   choices=["1", "2", "3", "3b", "3ba", "3bf", "3bc",
                            "3be", "4",
                            "4b", "4bf", "4br", "4ba", "5", "5p", "6", "6c",
                            "6t", "7", "7b", "7s", "7sb", "7t", "7tb",
                            "8", "8a", "8f", "8af"])
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results.json"))
    args = p.parse_args()

    import jax

    results = {"device": str(jax.devices()[0]), "results": []}
    for c in args.configs:
        r = BENCHES[c]()
        print(json.dumps(r), flush=True)
        results["results"].append(r)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
