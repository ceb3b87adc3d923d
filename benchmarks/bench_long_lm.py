"""Long-context token-LM training A/B: transformer vs hoisted LSTM at
L=2048/4096 (VERDICT round-3 #8).

Full-clip token streams exceed the benched L=512 (a 30 s clip at hop 512
is ~2.6K tokens), so the architecture recommendation must hold at that
regime. Same workload as bench_all configs 6/6t (flagship dims, bf16,
AdamW + masked CE), token budget held at 16K tokens/step across lengths
(B=8 at L=2048, B=4 at L=4096). The transformer runs per-block remat
(models/token_transformer.py remat=True — the naive (B, H, L, L)
attention scores are GBs per layer at L=4096; grads bit-equal, pinned in
tests/test_token_transformer.py); a plain no-remat leg at L=2048
measures the remat overhead where both fit.

Usage: python benchmarks/bench_long_lm.py [--iters 8]
       [--out benchmarks/results_r4_longlm.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = 1003


def _train_loop(model, b, l, iters):
    import jax
    import jax.numpy as jnp
    import optax

    from mqgan_tpu.models.music_lstm import masked_ce_loss

    rng = np.random.default_rng(0)
    toks = [jnp.asarray(rng.integers(1, 1000, (b, l)).astype(np.int32))
            for _ in range(iters + 2)]
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
    for i in range(iters):
        params, opt_state, loss = compiled(params, opt_state, toks[i])
        losses.append(loss)
    for x in losses:
        float(x)
    per = (time.perf_counter() - t0) / iters
    return per, n_params


def run_leg(arch, b, l, iters, remat=True, flash=False):
    import jax.numpy as jnp

    from mqgan_tpu.models.music_lstm import MusicLSTM
    from mqgan_tpu.models.token_transformer import MusicTransformer

    if arch == "transformer":
        model = MusicTransformer(vocab_size=VOCAB, num_genres=10,
                                 remat=remat, flash=flash,
                                 dtype=jnp.bfloat16)
    else:
        model = MusicLSTM(vocab_size=VOCAB, num_genres=10,
                          dtype=jnp.bfloat16)
    per, n_params = _train_loop(model, b, l, iters)
    suffix = ""
    if arch == "transformer":
        suffix = ("_flash" if flash else "") + ("" if remat else "_noremat")
    row = {
        "config": f"long_lm_{arch}_L{l}_b{b}" + suffix,
        "arch": arch, "batch": b, "seq_len": l,
        "remat": (remat if arch == "transformer" else None),
        "flash": (flash if arch == "transformer" else None),
        "params_m": round(n_params / 1e6, 1),
        "ms_per_step": round(per * 1000, 1),
        "tokens_per_sec": round(b * (l - 1) / per, 1),
    }
    print(row, flush=True)
    return row


def flash_numerics_check(b=4, l=512):
    """Flash vs naive on the chip: forward max|delta| and grad max
    relative delta at matched params — the accuracy evidence for the
    flash training path (fp32 online softmax vs fp32 full softmax)."""
    import jax
    import jax.numpy as jnp

    from mqgan_tpu.models.music_lstm import masked_ce_loss
    from mqgan_tpu.models.token_transformer import MusicTransformer

    kw = dict(vocab_size=VOCAB, num_genres=10)
    naive = MusicTransformer(**kw)
    flash = MusicTransformer(**kw, flash=True)
    rng = np.random.default_rng(3)
    toks = jnp.asarray(rng.integers(1, 1000, (b, l)).astype(np.int32))
    genres = jnp.asarray(rng.integers(0, 10, (b,)).astype(np.int32))
    params = jax.jit(naive.init)(jax.random.key(0), toks, genres)

    def loss(m, p):
        logits = m.apply(p, toks[:, :-1], genres)
        return masked_ce_loss(logits, toks[:, 1:])[0]

    f_n = jax.jit(lambda p: naive.apply(p, toks[:, :-1], genres))(params)
    f_f = jax.jit(lambda p: flash.apply(p, toks[:, :-1], genres))(params)
    fwd_delta = float(jnp.max(jnp.abs(f_n.astype(jnp.float32)
                                      - f_f.astype(jnp.float32))))
    g_n = jax.jit(jax.grad(lambda p: loss(naive, p)))(params)
    g_f = jax.jit(jax.grad(lambda p: loss(flash, p)))(params)
    g_delta = max(
        float(jnp.max(jnp.abs(a.astype(jnp.float32)
                              - b_.astype(jnp.float32))))
        / max(float(jnp.max(jnp.abs(a.astype(jnp.float32)))), 1e-9)
        for a, b_ in zip(jax.tree.leaves(g_n), jax.tree.leaves(g_f)))
    row = {"config": f"flash_numerics_b{b}_L{l}",
           "fwd_max_abs_delta": fwd_delta,
           "grad_max_rel_delta": g_delta}
    print(row, flush=True)
    return row


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--flash_check", action="store_true",
                   help="run the flash-vs-naive numerics check first")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "results_r4_longlm.json"))
    args = p.parse_args(argv)

    legs = [
        ("transformer", 8, 2048, dict(remat=True)),
        ("transformer", 8, 2048, dict(remat=False)),
        ("transformer", 4, 4096, dict(remat=True)),
        ("transformer", 8, 2048, dict(remat=False, flash=True)),
        ("transformer", 4, 4096, dict(remat=False, flash=True)),
        ("transformer", 32, 512, dict(remat=False, flash=True)),
        ("lstm", 8, 2048, {}),
        ("lstm", 4, 4096, {}),
    ]
    rows = []
    if args.flash_check:
        try:
            rows.append(flash_numerics_check())
        except Exception as e:  # noqa: BLE001
            rows.append({"config": "flash_numerics",
                         "error": f"{type(e).__name__}: {e}"[:400]})
            print(rows[-1], flush=True)
    for arch, b, l, kw in legs:
        try:
            rows.append(run_leg(arch, b, l, args.iters, **kw))
        except Exception as e:  # noqa: BLE001 — record OOM legs honestly
            rows.append({"config": f"long_lm_{arch}_L{l}_b{b}_{kw}",
                         "error": f"{type(e).__name__}: {e}"[:400]})
            print(rows[-1], flush=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
        f.write("\n")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
