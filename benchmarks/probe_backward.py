"""Per-contributor backward-cost probe for the GAN train step (round 3).

Motivation (VERDICT r2): GAN B=64 --remat trains at 28.0% MFU while the
refiner forward alone runs at ~65% of practical peak — where exactly does
the backward half spend its time, and how far is each contributor from its
own roofline?

Methodology (benchmarks/README.md "slope method", adapted): each component
is timed as a lax.scan chain of N=12 calls inside ONE jitted executable —
distinct pre-staged device inputs per iteration, the carry threads a
1e-32-scaled scalar through the next input so XLA cannot parallelize or
cache iterations, and the final carry is fetched to host. The one-time
~34 ms tunnel dispatch amortizes to <3 ms/iter of bias. The grad variant
takes value_and_grad w.r.t. the component's params and folds EVERY grad
leaf into the carry so no wgrad can be dead-code-eliminated.

FLOPs are XLA cost-analysis numbers from the same compiled executable, so
MFU here means "this component's compiled FLOPs / time / 216 TF/s".

Also measures the VPU transcendental rate (pure APTx chain) to settle the
mel-mixer roofline arithmetic (VERDICT r2 #3): the mixer evaluates
B*T*C*features APTx calls on a (B,T,C,features) hidden; if measured mixer
time ~= evals / measured-APTx-rate the mixer is activation-bound and
closed.

Usage: python benchmarks/probe_backward.py [--components refiner mixer ...]
Writes benchmarks/probe_backward.json and prints one JSON line per probe.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CHAIN = 12
PRACTICAL_PEAK = 216e12  # measured bf16 peak (benchmarks/README.md)
B, T = 64, 256  # flagship training shape


def _chain_time(compiled, *args) -> float:
    """Median wall time of the compiled chained executable, forced fetch."""
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = compiled(*args)
        _ = float(np.asarray(out))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[1]


def probe_component(name, apply_fn, params, xs, want_grad=True):
    """apply_fn(params, x) -> array. xs: (N, ...) stacked distinct inputs.
    Returns dict with fwd/grad ms-per-call and TF/s."""
    import jax
    import jax.numpy as jnp

    def fwd_chain(params, xs):
        def body(c, x):
            y = apply_fn(params, x + c.astype(x.dtype) * 1e-32)
            return jnp.sum(y).astype(jnp.float32) * 1e-32, None

        c, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return c

    def loss(params, x):
        return jnp.sum(apply_fn(params, x).astype(jnp.float32))

    def grad_chain(params, xs):
        def body(c, x):
            l, g = jax.value_and_grad(loss)(params, x + c.astype(x.dtype) * 1e-32)
            gs = sum(jnp.sum(leaf).astype(jnp.float32)
                     for leaf in jax.tree.leaves(g))
            return (l + gs) * 1e-32, None

        c, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return c

    out = {"probe": name, "batch": B, "frames": T, "n_chain": N_CHAIN}
    for tag, fn in [("fwd", fwd_chain)] + ([("fwdgrad", grad_chain)]
                                           if want_grad else []):
        print(f"  compiling {name}/{tag} ...", flush=True)
        compiled = jax.jit(fn).lower(params, xs).compile()
        try:
            flops = (compiled.cost_analysis() or {}).get("flops", 0.0)
        except Exception:
            flops = 0.0
        per = _chain_time(compiled, params, xs) / N_CHAIN
        per_flops = flops / N_CHAIN
        out[f"{tag}_ms"] = round(per * 1e3, 2)
        out[f"{tag}_tflops"] = round(per_flops / 1e12, 3)
        out[f"{tag}_tf_per_s"] = round(per_flops / per / 1e12, 1)
        out[f"{tag}_mfu"] = round(per_flops / per / PRACTICAL_PEAK, 3)
    if want_grad and out.get("fwd_ms"):
        out["grad_over_fwd"] = round(
            (out["fwdgrad_ms"] - out["fwd_ms"]) / out["fwd_ms"], 2)
    print(json.dumps(out), flush=True)
    return out


def _stage_inputs(rng, shape, dtype, n=N_CHAIN):
    import jax.numpy as jnp

    return jnp.asarray(
        rng.standard_normal((n,) + shape).astype(np.float32)).astype(dtype)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--components", nargs="*", default=None,
                   help="subset: refiner mixer mixer_chunked trunk vpu "
                        "optimizer dpatch")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "probe_backward.json"))
    args = p.parse_args(argv)
    want = (lambda c: args.components is None or c in args.components)

    import jax
    import jax.numpy as jnp

    from mqgan_tpu.core.config import TrainConfig

    cfg = TrainConfig.from_dict({})  # flagship hifispeech defaults
    mel_ch = cfg.model.mel_channels
    ch0 = cfg.model.generator.channels[0]
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    results = []

    # ---- VPU transcendental roofline (mixer arithmetic) ----------------
    if want("vpu"):
        # a 16.8M-elem elementwise pass takes tens of us — a 12-chain is
        # dispatch-dominated (~34 ms tunnel round-trip). Slope method: one
        # in-VMEM-looping jit per chain length, difference out the
        # dispatch + HBM-read constant.
        from mqgan_tpu.nn.activations import aptx

        n_elem = 4096 * 4096

        def rate(fn, n1=256, n2=2048):
            def chain(x, n):
                def body(i, c):
                    return fn(c + i * jnp.bfloat16(1e-8))

                return jnp.sum(jax.lax.fori_loop(0, n, body, x)
                               .astype(jnp.float32))

            times = {}
            for n in (n1, n2):
                c = jax.jit(lambda x, _n=n: chain(x, _n)).lower(
                    jnp.zeros((4096, 4096), dt)).compile()
                xs = _stage_inputs(rng, (4096, 4096), dt, n=1)[0]
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    _ = float(np.asarray(c(xs)))
                    ts.append(time.perf_counter() - t0)
                times[n] = sorted(ts)[1]
            per = (times[n2] - times[n1]) / (n2 - n1)
            return per, n_elem / per / 1e9

        for tag, fn in [
            ("vpu_aptx_bf16", aptx),
            ("vpu_muladd_bf16", lambda x: x * 1.5 + 0.25),
            ("vpu_tanh_bf16", jnp.tanh),
        ]:
            per, gelem = rate(fn)
            r = {"probe": tag, "slope_us_per_pass": round(per * 1e6, 1),
                 "gelem_per_s": round(gelem, 1)}
            print(json.dumps(r), flush=True)
            results.append(r)

    # ---- mel-mixer (plain + chunked remat) -----------------------------
    if want("mixer") or want("mixer_chunked"):
        from mqgan_tpu.nn.mixer2d import MelMixer2D

        for tag, chunk in [("mixer_plain", None), ("mixer_chunked", 32)]:
            if not want("mixer" if chunk is None else "mixer_chunked"):
                continue
            mixer = MelMixer2D(features=ch0, kernel_size=5, depthwise=True,
                               act="aptx", dropout=0.1, hidden_chunk_t=chunk,
                               dtype=dt)
            x0 = jnp.zeros((B, T, ch0), jnp.float32)
            params = jax.jit(mixer.init)(jax.random.key(0), x0)
            # B=64 plain-path hidden is 8 GB — probe plain fwd at B=16 and
            # scale, probe chunked at full B
            bb = 16 if chunk is None else B
            xs = _stage_inputs(rng, (bb, T, ch0), dt)

            def apply_fn(p, x, _m=mixer):
                return _m.apply(p, x, None, True, False)

            r = probe_component(f"{tag}_b{bb}", apply_fn, params, xs)
            r["aptx_evals_g"] = round(bb * T * ch0 * ch0 / 1e9, 2)
            results.append(r)

    # ---- refiner -------------------------------------------------------
    if want("refiner"):
        from mqgan_tpu.nn.unet import UNetRefiner

        ref = UNetRefiner(base_ch=cfg.model.generator.refiner_base_channels,
                          depth=cfg.model.generator.refiner_depth,
                          dropout=0.1, out_features=mel_ch, dtype=dt)
        cin = mel_ch + mel_ch // cfg.model.generator.refiner_hidden_proj_divisor
        x0 = jnp.zeros((B, T, cin), jnp.float32)
        params = jax.jit(ref.init)(jax.random.key(0), x0)
        xs = _stage_inputs(rng, (B, T, cin), dt)

        def apply_ref(p, x):
            return ref.apply(p, x)

        results.append(probe_component("refiner", apply_ref, params, xs))

    # ---- refiner per-level backward (where does the 1.5x to peak sit?) -
    if want("refiner_levels"):
        from mqgan_tpu.nn.unet import ConvBlock

        base = cfg.model.generator.refiner_base_channels
        depth = cfg.model.generator.refiner_depth
        f = mel_ch + mel_ch // cfg.model.generator.refiner_hidden_proj_divisor
        levels = [("pre", T, 1, base, base <= 64)]
        for i in range(depth):
            levels.append((f"down{i}", T >> (i + 1), base << i,
                           base << (i + 1), False))
        levels.append(("mid", T >> depth, base << depth, base << depth,
                       False))
        for i in range(depth):
            h = T >> (depth - 1 - i)
            cin = (base << (depth - 1 - i)) * 3  # up concat: 2C skip + C
            levels.append((f"up{i}", h, cin, base << (depth - 1 - i), False))
        for name, h, cin, cout, packed in levels:
            blk = ConvBlock(cout, dropout=0.1, dtype=dt, packed=packed)
            x0 = jnp.zeros((B, h, f, cin), jnp.float32)
            params = jax.jit(blk.init)(jax.random.key(0), x0)
            xs = _stage_inputs(rng, (B, h, f, cin), dt)
            r = probe_component(
                f"refiner_{name}_h{h}_c{cin}to{cout}",
                lambda p, x, _b=blk: _b.apply(p, x), params, xs)
            results.append(r)

    # ---- trunk (encoder+decoder residual blocks) -----------------------
    if want("trunk"):
        from mqgan_tpu.nn.blocks import ResidualBlock1D

        chs = cfg.model.generator.channels
        kss = cfg.model.generator.kernel_sizes

        class Trunk(__import__("flax").linen.Module):
            @__import__("flax").linen.compact
            def __call__(self, x):
                h = x
                for i in range(len(chs) - 1):
                    h = ResidualBlock1D(
                        chs[i], chs[i + 1], kernel_size=kss[i], dropout=0.1,
                        act="taptx", causal=False, norm="weight", dtype=dt,
                        name=f"enc_{i}")(h, None, deterministic=True)
                rev_c, rev_k = list(reversed(chs)), list(reversed(kss))
                for i in range(len(rev_c) - 1):
                    h = ResidualBlock1D(
                        rev_c[i], rev_c[i + 1], kernel_size=rev_k[i],
                        dropout=0.1, act="taptx", causal=True, norm="weight",
                        dtype=dt, name=f"dec_{i}")(h, None,
                                                   deterministic=True)
                return h

        trunk = Trunk()
        x0 = jnp.zeros((B, T, chs[0]), jnp.float32)
        params = jax.jit(trunk.init)(jax.random.key(0), x0)
        xs = _stage_inputs(rng, (B, T, chs[0]), dt)
        results.append(probe_component(
            "trunk6", lambda p, x: trunk.apply(p, x), params, xs))

    # ---- discriminators (fwd+grad, GAN phase cost) ---------------------
    if want("dpatch"):
        from mqgan_tpu.train.step import build_models

        _, patch, mb = build_models(cfg, dt)
        x0 = jnp.zeros((2 * B, T, mel_ch), jnp.float32)
        l0 = jnp.full((2 * B,), T, jnp.int32)
        pp = jax.jit(patch.init)(jax.random.key(0), x0, l0)
        mp = jax.jit(mb.init)(jax.random.key(1), x0, l0)
        xs = _stage_inputs(rng, (2 * B, T, mel_ch), dt)

        def apply_ds(p, x):
            lo = jnp.full((x.shape[0],), T, jnp.int32)
            a = patch.apply(p["p"], x, lo)
            bq = mb.apply(p["m"], x, lo)
            outs = jax.tree.leaves((a, bq))
            return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

        results.append(probe_component(
            "discriminators_2B", apply_ds, {"p": pp, "m": mp}, xs))

    # ---- optimizer + clip on G params ----------------------------------
    if want("optimizer"):
        import optax

        from mqgan_tpu.train.step import build_models

        gen, _, _ = build_models(cfg, dt)
        x0 = jnp.zeros((B, T, mel_ch), jnp.float32)
        l0 = jnp.full((B,), T, jnp.int32)
        gp = jax.jit(gen.init)(jax.random.key(0), x0, l0)["params"]
        tx = optax.chain(optax.clip_by_global_norm(1.0),
                         optax.adamw(2e-4))
        opt0 = tx.init(gp)

        def opt_chain(params, seeds):
            def body(carry, seed):
                p, o = carry
                g = jax.tree.map(
                    lambda x: (jax.random.normal(
                        jax.random.fold_in(jax.random.key(0), seed),
                        x.shape, jnp.float32) * 1e-3).astype(x.dtype), p)
                up, o2 = tx.update(g, o, p)
                return (optax.apply_updates(p, up), o2), None

            (p, _), _ = jax.lax.scan(body, (params, opt0), seeds)
            return jnp.sum(jax.tree.leaves(p)[0].astype(jnp.float32))

        seeds = jnp.arange(N_CHAIN, dtype=jnp.uint32)
        print("  compiling optimizer chain ...", flush=True)
        compiled = jax.jit(opt_chain).lower(gp, seeds).compile()
        per = _chain_time(compiled, gp, seeds) / N_CHAIN
        r = {"probe": "optimizer_clip_adamw",
             "note": "incl. synthetic grad RNG",
             "fwd_ms": round(per * 1e3, 2)}
        print(json.dumps(r), flush=True)
        results.append(r)

    with open(args.out, "w") as f:
        json.dump({"device": str(jax.devices()[0]), "results": results},
                  f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
