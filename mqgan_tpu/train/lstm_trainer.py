"""Token-LM trainer — genre-conditioned next-token prediction CLI.

Behavioral spec (reference train_music_lstm_v2.py:402-624): *.npy int token
chunks + fname_to_id.json genre map, BOS prepend, seeded train/val split,
AdamW + grad clip, masked CE (ignore pad), NaN-loss batch skip, perplexity,
best-val-loss checkpointing with run args embedded.
(The reference's eval loop has a latent crash — collate returns a 4-tuple
but evaluate_loop unpacks 3, train_music_lstm_v2.py:142,366; ours works.)

TPU-first: one jitted step per length bucket (pad-to-bucket instead of
pad-to-batch-max keeps the compile set small); the NaN-skip is in-graph
(updates scaled by an isfinite flag) so there is no per-step host sync.

Usage: python -m mqgan_tpu.train.lstm_trainer --chunks_dir D
       --mapping_json M --vocab_size 1003 --num_genres N [...]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time
from functools import partial
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from mqgan_tpu.models.music_lstm import MusicLSTM, masked_ce_loss
from mqgan_tpu.utils.logging import MetricsLogger
from mqgan_tpu.utils.npy import load_npy

LEN_BUCKETS = (64, 128, 256, 512, 1024, 2048)


class MusicChunkDataset:
    """reference train_music_lstm_v2.py:58-110."""

    def __init__(self, chunks_dir: str, mapping_json: str, bos_id=1, pad_id=0):
        self.chunks_dir = chunks_dir
        self.bos_id = bos_id
        self.pad_id = pad_id
        with open(mapping_json, encoding="utf-8") as f:
            fname2genre = json.load(f)
        self.items: List[Tuple[str, int]] = [
            (os.path.join(chunks_dir, fname), gid)
            for fname, gid in fname2genre.items()
            if os.path.isfile(os.path.join(chunks_dir, fname))
        ]
        if not self.items:
            raise RuntimeError(
                f"No matching .npy files in {chunks_dir} per {mapping_json}"
            )
        print(f"Found {len(self.items)} valid chunk files.")

    def __len__(self):
        return len(self.items)

    def load(self, idx: int):
        path, genre_id = self.items[idx]
        seq = np.asarray(load_npy(path, use_native=False)).astype(np.int64)
        seq = np.concatenate([[self.bos_id], seq])  # BOS prepend
        return seq, genre_id


def collate_music(seqs, genres, pad_id=0, max_len: int | None = None):
    """Pad to the smallest bucket covering the batch (static XLA shapes)."""
    lengths = np.array([len(s) for s in seqs], np.int32)
    need = int(lengths.max()) if len(lengths) else 1
    bucket = next((b for b in LEN_BUCKETS if b >= need), LEN_BUCKETS[-1])
    if max_len:
        bucket = min(bucket, max_len)
    tokens = np.full((len(seqs), bucket), pad_id, np.int64)
    for i, s in enumerate(seqs):
        n = min(len(s), bucket)
        tokens[i, :n] = s[:n]
    lengths = np.minimum(lengths, bucket)
    return tokens, np.asarray(genres, np.int64), lengths


def make_lstm_step(model: MusicLSTM, tx, pad_id: int, train: bool,
                   pipe_mesh=None, pipe_micro: int = 4):
    """One jitted LM step. With pipe_mesh (a 1-D "pipe" mesh of
    lstm_layers devices), the recurrent stack runs pipeline-parallel —
    one layer per device, GPipe microbatches (parallel/pipeline.py);
    MusicLSTM's dropout sits outside the recurrence, so training
    composes with the pipeline unchanged (values/grads equal the serial
    stack — tests/test_pipeline.py)."""

    def loss_fn(params, tokens, genres, lengths, rng):
        inp, tgt = tokens[:, :-1], tokens[:, 1:]
        if pipe_mesh is not None:
            from mqgan_tpu.parallel.pipeline import (
                music_lstm_pipelined_logits,
            )

            logits = music_lstm_pipelined_logits(
                {"params": params}, inp, genres, pipe_mesh, pipe_micro,
                model.lstm_layers, pad_id=pad_id,
                dropout_rate=model.dropout if train else 0.0,
                dropout_rng=rng if train else None,
                dtype=model.dtype,  # --bf16 applies to the pipeline too
            )
        else:
            logits = model.apply(
                {"params": params}, inp, genres, lengths - 1,
                deterministic=not train,
                rngs={"dropout": rng} if train else {},
            )
        loss, n_valid = masked_ce_loss(logits, tgt, pad_id)
        return loss, n_valid

    if not train:
        @jax.jit
        def eval_step(params, tokens, genres, lengths):
            loss, n_valid = loss_fn(params, tokens, genres, lengths,
                                    jax.random.key(0))
            return loss, n_valid

        return eval_step

    @jax.jit
    def train_step(params, opt_state, tokens, genres, lengths, rng):
        rng, sub = jax.random.split(rng)
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, tokens, genres, lengths, sub
        )
        # in-graph NaN/Inf skip (reference train_music_lstm_v2.py:295-299)
        ok = jnp.isfinite(loss)
        grads = jax.tree.map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads
        )
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_params = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), new_params, params
        )
        new_opt = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), new_opt, opt_state
        )
        return new_params, new_opt, loss, rng

    return train_step


def batches(ds: MusicChunkDataset, idxs, batch_size, pad_id, rng: np.random.Generator | None):
    order = list(idxs)
    if rng is not None:
        rng.shuffle(order)
    for start in range(0, len(order), batch_size):
        chunk = order[start : start + batch_size]
        loaded = [ds.load(i) for i in chunk]
        seqs = [s for s, _ in loaded]
        genres = [g for _, g in loaded]
        if len(chunk) < batch_size:
            # keep static batch shape: fill short final batches with
            # zero-length all-pad rows. Every target token of a fill row is
            # pad_id, so masked_ce_loss gives them zero weight and zero
            # gradient — train loss, val loss, and perplexity are invariant
            # to the batch-size choice (the GAN loader's train/data.py
            # zero-length-fill treatment; the reference repeat-pads and
            # double-counts duplicates).
            deficit = batch_size - len(chunk)
            seqs += [np.zeros((0,), np.int64)] * deficit
            genres += [0] * deficit
        yield collate_music(seqs, genres, pad_id)


def main(argv=None):
    from mqgan_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # honor JAX_PLATFORMS even under site overrides
    p = argparse.ArgumentParser(description="Train a genre-conditioned LSTM token LM.")
    p.add_argument("--chunks_dir", default="musicmels")
    p.add_argument("--mapping_json", default="fname_to_id.json")
    p.add_argument("--val_split", type=float, default=0.1)
    p.add_argument("--vocab_size", type=int, required=True)
    p.add_argument("--num_genres", type=int, required=True)
    p.add_argument("--arch", choices=("lstm", "transformer"), default="lstm",
                   help="token-LM architecture: the reference-parity LSTM "
                        "or the TPU-first causal transformer "
                        "(models/token_transformer.py — fully parallel "
                        "over time on the MXU; same data/loss/checkpoint "
                        "path)")
    p.add_argument("--emb_dim", type=int, default=512)
    p.add_argument("--lstm_hid", type=int, default=1024)
    p.add_argument("--lstm_layers", type=int, default=2)
    p.add_argument("--n_layers", type=int, default=6,
                   help="transformer depth (--arch transformer)")
    p.add_argument("--n_heads", type=int, default=8,
                   help="transformer attention heads (--arch transformer)")
    p.add_argument("--mlp_ratio", type=int, default=4,
                   help="transformer MLP width ratio (--arch transformer)")
    p.add_argument("--flash_lm", action="store_true",
                   help="Pallas TPU flash attention for the transformer "
                        "training forward (--arch transformer, TPU only):"
                        " O(L) attention memory, the long-context path")
    p.add_argument("--flash_blocks", type=int, nargs=2, default=None,
                   metavar=("Q", "K"),
                   help="flash-attention (block_q, block_k) VMEM tiling "
                        "override (with --flash_lm; default: jax's "
                        "built-in sizes — see "
                        "benchmarks/results_r5_flash_sweep.json)")
    p.add_argument("--remat_lm", action="store_true",
                   help="per-block rematerialization (--arch transformer):"
                        " long-context training memory relief — the "
                        "backward recomputes blocks instead of storing "
                        "the (B, H, L, L) attention scores")
    p.add_argument("--bos_id", type=int, default=1)
    p.add_argument("--pad_id", type=int, default=0)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--out_dir", default="logs/musiclstm-run1")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--pretrained", default=None,
                   help="warm-start weights: torch .pt/.pth (reference "
                        "format) or an orbax params dir")
    p.add_argument("--pipe", type=int, default=0, metavar="N",
                   help="pipeline parallelism: run the recurrent stack "
                        "one LSTM layer per device over an N-device "
                        "'pipe' mesh (requires N == --lstm_layers; GPipe "
                        "microbatch schedule, values/grads equal serial)")
    p.add_argument("--pipe_micro", type=int, default=4, metavar="M",
                   help="GPipe microbatches per batch under --pipe "
                        "(batch_size must divide by M; bubble fraction "
                        "(N-1)/(M+N-1))")
    args = p.parse_args(argv)
    if args.arch == "transformer" and args.pipe:
        raise SystemExit("--pipe is the LSTM stack's pipeline schedule; "
                         "--arch transformer trains parallel over time "
                         "and does not need it")

    os.makedirs(args.out_dir, exist_ok=True)
    logger = MetricsLogger(args.out_dir, run_name="lstm")

    ds = MusicChunkDataset(args.chunks_dir, args.mapping_json,
                           bos_id=args.bos_id, pad_id=args.pad_id)
    rng_np = np.random.default_rng(args.seed)
    perm = rng_np.permutation(len(ds))
    val_size = max(1, int(args.val_split * len(ds)))
    val_idx, train_idx = perm[:val_size].tolist(), perm[val_size:].tolist()
    print(f"Split: {len(train_idx)} train / {len(val_idx)} val")

    if args.flash_lm and args.arch == "transformer":
        # measured crossover with the tuned (1024,1024) tiling
        # (results_r5_flash_sweep.json / results_r5_flash_short.json):
        # flash loses 1.28x at L=512, is neutral at L=1024, and WINS
        # 1.49x at L=2048 / 3.44x at L=4096. Warn when this run's data
        # never reaches the neutral point (flash still trains correctly
        # — the win below L=1024 is memory, O(L) vs O(L^2), not speed).
        crossover = 1024
        longest = 1 + max(
            np.load(path, mmap_mode="r").shape[0]
            for path, _ in ds.items)
        if longest < crossover:
            print(f"WARNING: --flash_lm engaged but the longest training "
                  f"sequence is {longest} tokens — below the measured "
                  f"L~{crossover} speed crossover vs naive XLA attention "
                  f"(results_r5_flash_sweep.json). Expect a slower step; "
                  f"keep the flag only if attention memory is the "
                  f"constraint.")

    from mqgan_tpu.models.token_lm import build_token_lm

    # both archs default to dropout 0.1 in training (reference
    # train_music_lstm_v2.py:158; deploy paths rebuild with 0.0)
    model = build_token_lm(
        vars(args), dropout=0.1,
        dtype=jnp.bfloat16 if args.bf16 else None,
    )
    tok0, gen0, len0 = next(batches(ds, train_idx, args.batch_size,
                                    args.pad_id, None))
    params = model.init(jax.random.key(args.seed), jnp.asarray(tok0[:, :-1]),
                        jnp.asarray(gen0), jnp.asarray(len0 - 1))["params"]
    n_params = sum(np.prod(np.shape(x)) for x in jax.tree.leaves(params))
    print(f"Total trainable parameters: {n_params / 1e6:.2f} M")

    if args.pretrained:
        if args.pretrained.endswith((".pt", ".pth")):
            if args.arch != "lstm":
                raise SystemExit("torch .pt/.pth warm-start is the "
                                 "reference LSTM's format; --arch "
                                 "transformer restores from orbax dirs")
            import torch

            from mqgan_tpu.utils.torch_import import import_music_lstm_params

            ckpt = torch.load(args.pretrained, map_location="cpu",
                              weights_only=False)
            sd = ckpt.get("model_state_dict", ckpt)
            params = jax.tree.map(jnp.asarray, import_music_lstm_params(
                sd, lstm_layers=args.lstm_layers))
        else:
            from mqgan_tpu.utils.checkpoint import load_pretrained_generator

            params = load_pretrained_generator(args.pretrained, (), 0,
                                               template=params)
        print(f"Warm-started from {args.pretrained}")

    tx = optax.chain(optax.clip_by_global_norm(args.max_grad_norm),
                     optax.adamw(args.lr))
    opt_state = tx.init(params)
    pipe_mesh = None
    if args.pipe:
        from jax.sharding import Mesh

        if args.pipe != args.lstm_layers:
            raise SystemExit(
                f"--pipe {args.pipe} must equal --lstm_layers "
                f"{args.lstm_layers} (one layer per pipe device)")
        if args.batch_size % args.pipe_micro:
            raise SystemExit(
                f"--batch_size {args.batch_size} not divisible by "
                f"--pipe_micro {args.pipe_micro}")
        devs = jax.devices()
        if len(devs) < args.pipe:
            raise SystemExit(
                f"--pipe {args.pipe} needs {args.pipe} devices, "
                f"have {len(devs)}")
        pipe_mesh = Mesh(np.asarray(devs[: args.pipe]), ("pipe",))
        print(f"pipeline parallel: {args.pipe} stages x "
              f"{args.pipe_micro} microbatches")
    train_step = make_lstm_step(model, tx, args.pad_id, train=True,
                                pipe_mesh=pipe_mesh,
                                pipe_micro=args.pipe_micro)
    eval_step = make_lstm_step(model, tx, args.pad_id, train=False,
                               pipe_mesh=pipe_mesh,
                               pipe_micro=args.pipe_micro)
    rng = jax.random.key(args.seed + 1)

    best_val = float("inf")
    global_step = 0
    for epoch in range(1, args.epochs + 1):
        t0 = time.time()
        ep_loss, n_batches = 0.0, 0
        for tokens, genres, lengths in batches(
            ds, train_idx, args.batch_size, args.pad_id,
            np.random.default_rng(args.seed + epoch),
        ):
            params, opt_state, loss, rng = train_step(
                params, opt_state, jnp.asarray(tokens), jnp.asarray(genres),
                jnp.asarray(lengths), rng,
            )
            global_step += 1
            n_batches += 1
            if n_batches % args.log_every == 0 or n_batches == 1:
                loss_f = float(loss)
                ep_loss += loss_f
                logger.log(
                    {"train/loss_step": loss_f, "epoch": epoch,
                     "steps_per_sec": n_batches / (time.time() - t0)},
                    step=global_step,
                )

        # validation (working, unlike the reference's crashing eval loop)
        val_losses, val_ns = [], []
        for tokens, genres, lengths in batches(
            ds, val_idx, args.batch_size, args.pad_id, None
        ):
            loss, n = eval_step(params, jnp.asarray(tokens),
                                jnp.asarray(genres), jnp.asarray(lengths))
            if np.isfinite(float(loss)):
                val_losses.append(float(loss) * float(n))
                val_ns.append(float(n))
        avg_val = (sum(val_losses) / max(sum(val_ns), 1.0)) if val_ns else 0.0
        val_ppl = math.exp(avg_val) if avg_val < 700 else float("inf")
        print(f"Epoch {epoch}: val loss {avg_val:.4f}, ppl {val_ppl:.2f}")
        logger.log({"val/loss": avg_val, "val/perplexity": val_ppl,
                    "epoch": epoch}, step=global_step)

        if avg_val < best_val:
            best_val = avg_val
            from mqgan_tpu.utils.checkpoint import save_generator_only

            path = save_generator_only(
                args.out_dir, jax.device_get(params),
                f"model_epoch_{epoch}_valloss_{avg_val:.4f}",
            )
            with open(os.path.join(args.out_dir, "best.json"), "w") as f:
                json.dump({"epoch": epoch, "val_loss": avg_val,
                           "path": path, "args": vars(args)}, f, indent=2)
            print(f"  New best validation loss. Saved model to {path}")

    logger.close()
    print("Training finished.")


if __name__ == "__main__":
    main()
