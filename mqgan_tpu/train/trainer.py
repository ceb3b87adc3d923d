"""GAN trainer — host loop + CLI.

Equivalent of the reference Trainer (train.py:202-652), re-designed for TPU:
the entire per-batch schedule is one jitted step (train/step.py) compiled
once per (crop bucket, phase); the host only loads data, stages it onto the
device mesh, and logs. Data parallelism is on by default over all local
devices; checkpoints hold the full state (orbax) with auto-resume-latest and
generator-only warm-start (incl. PyTorch .pth import).

CLI:  python -m mqgan_tpu.train.trainer --config configs/model_config.yaml
      [--pretrained ckpt] [--output_dir dir]   (reference train.py:657-675)
"""

from __future__ import annotations

import argparse
import time
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from mqgan_tpu.core.config import TrainConfig
from mqgan_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from mqgan_tpu.train.data import DevicePrefetcher, MelDataset, MelLoader, find_npy_files, split_train_eval
from mqgan_tpu.train.state import TrainState, create_train_state
from mqgan_tpu.train.step import build_models, make_eval_step, make_train_step
from mqgan_tpu.utils import checkpoint as ckpt_utils
from mqgan_tpu.utils.logging import MetricsLogger


_PROFILE_START = 2  # steps to skip (compile + warmup) before tracing


class _NullLogger:
    """Metrics sink for non-primary hosts in a multihost run."""

    def log(self, *a, **k):
        pass

    def close(self):
        pass


class Trainer:
    def __init__(self, config: TrainConfig, *, use_wandb: bool = True,
                 dtype=jnp.bfloat16, mesh=None, max_steps_per_epoch: int | None = None,
                 profile_steps: int = 0, multihost: bool = False,
                 watch_interval: int = 0, grad_accum: int = 1,
                 keep_best: bool = False, ema_decay: float = 0.0):
        self.config = config
        self.dtype = dtype
        # exponential moving average of the generator weights (net-new vs
        # the reference; the standard GAN deploy/eval weights). When >0,
        # the step maintains state.gen_ema and every eval consumer
        # (eval metrics, eval plots, --keep_best snapshots) uses the EMA
        # params — what you would actually ship.
        if not (0.0 <= ema_decay < 1.0):
            raise ValueError(f"ema_decay must be in [0, 1), got {ema_decay}")
        self.ema_decay = float(ema_decay)
        # eval-gated best checkpoint (the GAN analog of the LSTM trainer's
        # best-val model): when eval recon improves, snapshot the generator
        # to output_dir/generator_best — directly consumable by
        # --pretrained warm starts and deploy.export
        self.keep_best = keep_best
        self._best_eval = float("inf")
        # gradient accumulation: each batch runs as grad_accum scanned
        # microbatches with one optimizer update (train/step.py) —
        # activation memory scales with batch/grad_accum
        self.grad_accum = int(grad_accum)
        if self.grad_accum > 1 and config.data.batch_size % self.grad_accum:
            raise ValueError(
                f"batch_size {config.data.batch_size} not divisible by "
                f"grad_accum {self.grad_accum}")
        self.start_epoch = 1
        self.max_steps_per_epoch = max_steps_per_epoch
        # capture a jax.profiler trace for profile_steps steps of the
        # first epoch into {output_dir}/profile
        self.profile_steps = profile_steps
        self._profiling = False
        # wandb.watch equivalent (reference train.py:333): every
        # watch_interval steps, log per-component gradient norms (in-graph)
        # and parameter distribution summaries (host-side)
        self.watch_interval = watch_interval
        # multihost: per-process file shards + global-batch assembly over
        # all hosts' devices (parallel/multihost.py); the identity path on
        # a single process. DCN-ready: the mesh spans all processes'
        # devices, so DP gradients reduce over ICI within a slice and DCN
        # across slices, exactly as laid out by GSPMD.
        self.multihost = multihost
        self._is_primary = (not multihost) or jax.process_index() == 0
        self.mesh = mesh if mesh is not None else make_mesh()
        n_seq = self.mesh.shape.get("seq", 1)
        if multihost and n_seq > 1:
            # multihost x seq-par composes when every batch row's seq
            # shard group lives INSIDE one process: rows shard over the
            # (dcn, data) axes (crossing processes), the time axis over
            # intra-process 'seq' devices — make_global_batch only ever
            # assembles per-process ROWS with full T, and GSPMD's conv
            # halo exchanges ride intra-process links. Enforce the
            # alignment instead of refusing (2-process equality leg:
            # tests/test_parallel.py::test_multihost_seq_par_param_equality).
            devs = self.mesh.devices  # (dcn, data, model, seq)
            for idx in np.ndindex(devs.shape[:-1]):
                owners = {d.process_index for d in devs[idx]}
                if len(owners) > 1:
                    raise ValueError(
                        f"seq-parallel group {idx} spans processes "
                        f"{sorted(owners)}: under --multihost the 'seq' "
                        f"axis must sit inside one process (choose "
                        f"n_seq dividing the per-process device count "
                        f"and keep seq the innermost mesh axis)")
        if n_seq > 1:
            bad = [t for t in config.data.crop_len if t % n_seq]
            if bad:
                raise ValueError(
                    f"crop buckets {bad} do not divide by the sequence-"
                    f"parallel factor {n_seq}; even time shards need "
                    f"crop_len multiples of {n_seq}")
        self._batch_sharding = batch_sharding(self.mesh)
        self._repl = replicated(self.mesh)

        # graceful shutdown: SIGTERM/SIGINT (preemption, Ctrl-C) set this
        # flag; the epoch loop stops at the next step boundary and train()
        # writes a checkpoint before exiting (a second signal force-kills)
        self._stop_requested = False

        # codebook-collapse guardrail (LoggingConfig.codebook_usage_floor):
        # count consecutive metric logs with usage below the floor
        self._collapse_streak = 0
        self._collapse_warned = False

        self._setup_data()
        self._setup_state()
        self._steps: Dict[bool, callable] = {}
        self._eval_step = None
        self._seq_eval_mesh = None  # lazy 1-D mesh for exact full-len eval

        log_cfg = config.logging
        # only the primary host writes metrics/plots (shared-FS safety)
        if self._is_primary:
            self.logger = MetricsLogger(
                config.data.output_dir,
                wandb_project=(log_cfg.wandb.project if use_wandb else None),
                wandb_entity=log_cfg.wandb.entity,
                config=config.to_dict(),
            )
        else:
            self.logger = _NullLogger()

    # ------------------------------------------------------------------
    def _setup_data(self):
        cfg = self.config
        files = find_npy_files(cfg.data.data_dir)
        if not files:
            raise ValueError(f"No .npy files found in {cfg.data.data_dir}")
        train_files, eval_files = split_train_eval(
            files, cfg.data.validation_split, cfg.training.seed
        )
        print(f"Dataset: {len(files)} files -> {len(train_files)} train / "
              f"{len(eval_files)} eval")
        proc_idx, proc_count = 0, 1
        if self.multihost:
            from mqgan_tpu.parallel.multihost import host_info

            proc_idx, proc_count = host_info()
            # config batch_size is the GLOBAL batch; each host materializes
            # its row range of every global batch. ALL hosts keep the full
            # (union) file list — MelLoader's sampling plan is a pure
            # function of (seed, epoch, batch, row), so batch content and
            # per-epoch step counts are process-count-invariant (no
            # crop-length divergence, no collective deadlock on uneven
            # shards).
            assert cfg.data.batch_size % proc_count == 0, (
                f"batch_size {cfg.data.batch_size} not divisible by "
                f"{proc_count} hosts")
            print(f"multihost: host {proc_idx}/{proc_count}, local batch "
                  f"{cfg.data.batch_size // proc_count}")
        self.train_loader = MelLoader(
            MelDataset(train_files),
            batch_size=cfg.data.batch_size,
            crop_lens=cfg.crop_lens,
            seed=cfg.training.seed,
            process_index=proc_idx,
            process_count=proc_count,
            mel_channels=cfg.model.mel_channels,
        )
        self.eval_dataset = MelDataset(eval_files)

    def _setup_state(self):
        cfg = self.config
        gen, patch, mb = build_models(cfg, self.dtype)
        self.gen, self.patch, self.mb = gen, patch, mb

        t = max(cfg.crop_lens)
        mel = jnp.zeros((cfg.data.batch_size, t, cfg.model.mel_channels), jnp.float32)
        lengths = jnp.full((cfg.data.batch_size,), t, jnp.int32)
        # the key's impl propagates to every split/fold_in/draw below it;
        # rbg makes in-step dropout masks ~7.6x cheaper on TPU (see
        # TrainingConfig.rng_impl)
        k = jax.random.key(cfg.training.seed, impl=cfg.training.rng_impl)
        kg, kp, km, kr = jax.random.split(k, 4)
        # jitted init: unjitted tracing executes op-by-op on the device,
        # which takes minutes for the flagship model on remote backends
        gv = jax.jit(gen.init)(kg, mel, lengths)
        pv = jax.jit(patch.init)(kp, mel, lengths)
        mv = jax.jit(mb.init)(km, mel, lengths)
        state, _, _ = create_train_state(
            gen_variables=gv, patch_variables=pv, multibin_variables=mv,
            training_cfg=cfg.training, rng=kr,
        )
        if self.ema_decay > 0:
            # seed the EMA at the initial params (standard practice; the
            # first updates pull it toward the trained weights). COPIES,
            # not aliases: the jitted step donates the state, and donating
            # the same buffer via two pytree leaves is an XLA error
            state = state.replace(
                gen_ema=jax.tree.map(jnp.copy, state.gen_params))
        # replicate the state over the mesh (multi-process safe)
        from mqgan_tpu.parallel.multihost import replicate_tree

        self.state = replicate_tree(state, self._repl)

        # checkpoint handling: auto-resume newest, else optional warm-start
        # (reference train.py:339-378)
        latest = ckpt_utils.latest_checkpoint(cfg.data.output_dir)
        if latest is not None:
            path, epoch = latest
            print(f"Resuming from {path} (epoch {epoch})")
            host_state = jax.device_get(self.state)
            restored = self._restore_with_fallbacks(path, host_state, cfg)
            self.state = replicate_tree(restored, self._repl)
            self.start_epoch = epoch + 1
        elif cfg.training.pretrained:
            print(f"Warm-starting generator from {cfg.training.pretrained}")
            gen_params = ckpt_utils.load_pretrained_generator(
                cfg.training.pretrained,
                cfg.model.generator.channels,
                cfg.model.generator.refiner_depth,
                template=self.state.gen_params,
            )
            gen_params = replicate_tree(gen_params, self._repl)
            self.state = self.state.replace(gen_params=gen_params)

    def _restore_with_fallbacks(self, path, host_state, cfg):
        """Restore a checkpoint trying every compatible template shape.

        Two axes of drift between a checkpoint and the current run's
        config, each changing the pytree the orbax template must mirror:
        * the PRNG impl (rbg keys are 4 uint32 words, threefry 2) — retry
          with the alternate impl's key; the restored key carries its own
          impl, so training continues bit-compatibly with the original run;
        * the --ema flag: checkpoints written without it lack the gen_ema
          subtree (restore without it, then seed the EMA from the restored
          params), and ones written WITH it carry a subtree a non-EMA run
          must restore-and-drop (a stale EMA must not be re-saved as live).
        """
        other = "threefry2x32" if cfg.training.rng_impl == "rbg" else "rbg"
        alt_rng = jax.random.key(cfg.training.seed, impl=other)
        rng_variants = [
            (host_state, None),
            (host_state.replace(rng=alt_rng),
             f"written with rng_impl={other!r} (config says "
             f"{cfg.training.rng_impl!r}); continuing with the "
             f"checkpoint's PRNG stream"),
        ]
        templates = list(rng_variants)
        if host_state.gen_ema is not None:
            for tmpl, note in rng_variants:
                templates.append((
                    tmpl.replace(gen_ema=None),
                    ((note + "; ") if note else "") +
                    "checkpoint predates --ema: seeding the EMA from the "
                    "restored generator params"))
        else:
            for tmpl, note in rng_variants:
                templates.append((
                    tmpl.replace(gen_ema=tmpl.gen_params),
                    ((note + "; ") if note else "") +
                    "checkpoint carries gen_ema but --ema is off: the "
                    "stale EMA is dropped (pass --ema to keep updating it)"))
        first_err = None
        for tmpl, note in templates:
            try:
                restored = ckpt_utils.restore_checkpoint(path, tmpl)
            except Exception as e:  # noqa: BLE001 — try the next template
                first_err = first_err or e
                continue
            if note:
                print(f"NOTE: {note}")
            if host_state.gen_ema is not None and restored.gen_ema is None:
                # copies, not aliases (the donated step must not see one
                # buffer twice)
                restored = restored.replace(
                    gen_ema=jax.tree.map(np.copy, restored.gen_params))
            elif host_state.gen_ema is None and restored.gen_ema is not None:
                restored = restored.replace(gen_ema=None)
            return restored
        raise RuntimeError(
            f"Could not restore {path} with any compatible template "
            f"(PRNG impls {cfg.training.rng_impl!r}/{other!r}, with/without "
            "the gen_ema subtree); if the checkpoint predates the rng_impl "
            "config, pass --rng_impl to match the impl it was trained with"
        ) from first_err

    # ------------------------------------------------------------------
    def _step_fn(self, train_d: bool):
        if train_d not in self._steps:
            self._steps[train_d] = make_train_step(
                self.config, train_d=train_d, dtype=self.dtype,
                log_grad_norms=bool(self.watch_interval),
                grad_accum=self.grad_accum,
                mesh=self.mesh if self.grad_accum > 1 else None,
                ema_decay=self.ema_decay,
            )
        return self._steps[train_d]

    def _put(self, arr):
        if self.multihost:
            from mqgan_tpu.parallel.multihost import make_global_batch

            return make_global_batch(self.mesh, np.asarray(arr))
        from mqgan_tpu.parallel.mesh import train_array_sharding

        # rank-aware: (B, T, ...) arrays also shard T over the 'seq' axis
        # (inert on meshes without one / with n_seq == 1)
        return jax.device_put(
            arr, train_array_sharding(self.mesh, np.ndim(arr)))

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        cfg = self.config
        train_d = epoch >= cfg.training.discriminator_train_start_epoch
        step_fn = self._step_fn(train_d)

        it = DevicePrefetcher(self.train_loader.epoch(epoch), self._put)
        last = {}
        n = 0
        t0 = time.time()
        frames = 0
        last_batch = None
        for mel, lengths, host_batch in it:
            if self.profile_steps and epoch == self.start_epoch:
                self._maybe_profile(n)
            self.state, metrics = step_fn(self.state, mel, lengths)
            n += 1
            if self.watch_interval and n % self.watch_interval == 0:
                from mqgan_tpu.utils.logging import tree_stats

                watch = tree_stats(
                    jax.device_get(self.state.gen_params), prefix="param/gen")
                watch.update(
                    {k: float(v) for k, v in metrics.items()
                     if k.startswith("grad_norm")})
                self.logger.log(watch, step=int(self.state.step))
            frames += int(np.prod(mel.shape[:2]))
            last_batch = host_batch
            if n % 10 == 0 or n == 1:
                last = {k: float(v) for k, v in metrics.items()}
                if not all(np.isfinite(v) for v in last.values()):
                    bad = [k for k, v in last.items() if not np.isfinite(v)]
                    print(f"WARNING: non-finite metrics at step "
                          f"{int(self.state.step)}: {bad}")
                self._check_codebook_health(last, int(self.state.step))
                elapsed = time.time() - t0
                last["frames_per_sec"] = frames / max(elapsed, 1e-9)
                last["epoch"] = epoch
                self.logger.log(last, step=int(self.state.step))
            if self.max_steps_per_epoch and n >= self.max_steps_per_epoch:
                break
            if self._stop_requested:
                break  # signal received: stop at this step boundary
        if self._profiling:
            self._maybe_profile(_PROFILE_START + self.profile_steps)  # close
        self._log_train_images(epoch, last_batch)
        return last

    def _check_codebook_health(self, metrics: Dict[str, float], step: int):
        """Warn loudly (step-stamped, like the non-finite-metric warning)
        when codebook_usage stays below the configured floor for N
        consecutive metric logs. Codebook collapse is a SILENT failure:
        recon keeps improving while FSQ degenerates to one active code
        (measured on-chip, benchmarks/convergence_ab_fsqnoise.json —
        usage 0.005 at fsq_noise_dropout 0 vs 0.24 at 0.5). The reference
        logs usage (train.py:533-537) but never checks it; this guard is
        the rebuild's addition. Warns once per sustained collapse episode;
        a recovery above the floor re-arms it."""
        log_cfg = self.config.logging
        floor = log_cfg.codebook_usage_floor
        usage = metrics.get("codebook_usage")
        if floor <= 0 or usage is None or not np.isfinite(usage):
            return
        if usage < floor:
            self._collapse_streak += 1
            if (self._collapse_streak >= log_cfg.codebook_collapse_patience
                    and not self._collapse_warned):
                self._collapse_warned = True
                print(
                    f"WARNING: codebook collapse at step {step}: "
                    f"codebook_usage {usage:.4f} has stayed below "
                    f"{floor} for {self._collapse_streak} consecutive "
                    f"logs (perplexity "
                    f"{metrics.get('codebook_perplexity', float('nan')):.1f})."
                    " Recon loss will keep improving while the quantizer"
                    " degenerates to a near-constant code. Mitigation:"
                    " set generator.fsq_noise_dropout: 0.5 in the model"
                    " config (measured to hold usage >20% on low-entropy"
                    " data, benchmarks/convergence_ab_fsqnoise.json).")
        else:
            self._collapse_streak = 0
            self._collapse_warned = False

    def _maybe_profile(self, n: int):
        """Capture a device trace for steps [START, START+profile_steps) —
        the jax.profiler hook called out in SURVEY §5 (the reference has
        no profiling at all). START skips compile + warmup steps."""
        import os

        if not self._profiling and n == _PROFILE_START:
            trace_dir = os.path.join(self.config.data.output_dir, "profile")
            jax.profiler.start_trace(trace_dir)
            self._profiling = True
            print(f"profiling -> {trace_dir}")
        elif self._profiling and n >= _PROFILE_START + self.profile_steps:
            jax.block_until_ready(self.state)
            jax.profiler.stop_trace()
            self._profiling = False
            print("profiling stopped")

    def _local_gen_params(self, use_ema: bool = False):
        """Generator params usable in a process-local jit. In a multi-process
        run self.state lives on the global mesh; primary-only eval/plot jits
        must not consume it (the other processes would never join the
        computation), so fetch the replicated values to the host first.

        use_ema=True returns the EMA weights when --ema is active (what
        eval metrics, eval plots and --keep_best snapshots should see —
        the weights you would deploy); falls back to the live params."""
        params = self.state.gen_params
        if use_ema and self.state.gen_ema is not None:
            params = self.state.gen_ema
        if self.multihost and jax.process_count() > 1:
            # re-put the host copy onto a local device once, so the many
            # per-chunk eval-step calls reuse one transfer instead of
            # re-uploading the numpy tree on every call
            return jax.device_put(jax.device_get(params),
                                  jax.local_devices()[0])
        return params

    def _log_train_images(self, epoch: int, batch):
        """End-of-epoch original/pre/post triptychs from the last train batch
        (reference _log_train_images, train.py:539-573). Uses the HOST copy
        of the batch (this process's rows) + process-local params, so it is
        primary-only safe under multihost."""
        if batch is None or self.config.logging.num_plot_examples <= 0:
            return
        if not self._is_primary:
            return
        if self._eval_step is None:
            self._eval_step = make_eval_step(self.config, self.dtype)
        from mqgan_tpu.utils.plotting import save_triptych

        mel, lengths = jnp.asarray(batch.mel), jnp.asarray(batch.lengths)
        pre, post, _idx, _m = self._eval_step(self._local_gen_params(), mel, lengths)
        mel_h, pre_h, post_h = (np.asarray(jax.device_get(x)) for x in (mel, pre, post))
        lens_h = np.asarray(jax.device_get(lengths))
        # skip zero-length fill rows (short final batches pad with length-0
        # rows so they carry no loss weight — nothing to plot there)
        rows = [i for i in range(mel_h.shape[0]) if lens_h[i] > 0]
        for slot, i in enumerate(
                rows[: self.config.logging.num_plot_examples], start=1):
            try:
                png = save_triptych(
                    self.config.data.output_dir,
                    f"epoch_{epoch:03d}_train_{slot}",
                    mel_h[i], pre_h[i], post_h[i], length=int(lens_h[i]),
                )
                self.logger.log_image(
                    f"train_spectrograms/example_{slot}", png,
                    step=int(self.state.step))
            except Exception as e:  # plotting is best-effort
                print(f"train plotting failed: {e}")
                break

    def _eval_clip(self, mel: np.ndarray, gen_params=None):
        """Full-length eval of one (T, C) clip (reference _evaluate runs
        full-length sequences in one pass, train.py:585-599; we keep
        static XLA shapes instead of compiling unbounded ones).

        Preferred path: when >1 local device is available and the clip
        fits, ONE sequence-parallel dispatch over all devices
        (parallel/seqpar.py) — EXACT vs a single full-length pass,
        including the encoder CBAM gates (psum'd global stats).
        Fallback (single device, or clips so long that a per-device
        window would exceed the eval bucket): the largest eval bucket in
        OVERLAPPING windows with seam-discard. Each window carries the
        generator's full conv receptive field as halo (core/chunking.py),
        so kept frames match a single full-length pass up to the
        encoder's CBAM window approximation (documented there); the
        decode side is equivalence-tested at ~1e-5."""
        from mqgan_tpu.core.buckets import BucketPolicy, DEFAULT_INFERENCE_BUCKETS
        from mqgan_tpu.core.chunking import (
            chunk_plan, generator_halos, halo_align)

        if gen_params is None:
            gen_params = self._local_gen_params(use_ema=True)
        policy = BucketPolicy(DEFAULT_INFERENCE_BUCKETS[:6])
        max_t = policy.buckets[-1]
        t = mel.shape[0]
        gcfg = self.config.model.generator

        exact = self._eval_clip_seq_parallel(mel, gen_params, max_t)
        if exact is not None:
            return exact

        if self._eval_step is None:
            self._eval_step = make_eval_step(self.config, self.dtype)
        halo_l, halo_r = generator_halos(
            tuple(gcfg.kernel_sizes), gcfg.refiner_depth)
        pre_full = np.zeros_like(mel, dtype=np.float32)
        post_full = np.zeros_like(mel, dtype=np.float32)
        # strict=False: very deep refiners whose halos exceed the eval
        # bucket get proportionally shrunk context (best-effort, matching
        # the serving path) instead of aborting the training run mid-eval
        for span in chunk_plan(t, max_t, halo_l, halo_r,
                               align=halo_align(gcfg.refiner_depth),
                               strict=False):
            seg = mel[span.start: span.stop]
            batch, lengths, _ = policy.pad_batch([seg])
            pre, post, _idx, _m = self._eval_step(
                gen_params, jnp.asarray(batch), jnp.asarray(lengths)
            )
            lo, hi = span.local_lo, span.local_hi
            pre_full[span.keep_lo: span.keep_hi] = np.asarray(pre)[0, lo:hi]
            post_full[span.keep_lo: span.keep_hi] = np.asarray(post)[0, lo:hi]
        mel32 = mel.astype(np.float32)
        metrics = {
            "eval_recon_pre_mse": float(np.mean((pre_full - mel32) ** 2)),
            "eval_recon_post_mse": float(np.mean((post_full - mel32) ** 2)),
        }
        return pre_full, post_full, metrics

    def _eval_clip_seq_parallel(self, mel, gen_params, max_t):
        """One exact full-length eval dispatch with the clip's time axis
        sharded over all local devices; None when unavailable (single
        device) or when the per-device window would exceed the eval
        bucket (then the chunked fallback bounds memory instead). The
        clip length is padded (masked) to a 256-frame grid so arbitrary
        eval lengths hit a bounded set of compiled geometries."""
        n_dev = len(jax.devices())
        if n_dev <= 1:
            return None
        from mqgan_tpu.parallel.seqpar import (
            plan_seq_reencode, seq_mesh, seq_parallel_reencode)

        gcfg = self.config.model.generator
        t = mel.shape[0]
        grid = 256
        t_pad = -(-max(t, 1) // grid) * grid
        plan = plan_seq_reencode(t_pad, n_dev, tuple(gcfg.kernel_sizes),
                                 gcfg.refiner_depth)
        if plan.window > max_t:
            return None  # per-device window would exceed the eval bucket
        if self._seq_eval_mesh is None:
            self._seq_eval_mesh = seq_mesh()
        batch = np.zeros((1, t_pad, mel.shape[1]), np.float32)
        batch[0, :t] = mel
        _, pre, post = seq_parallel_reencode(
            self.gen, {"params": gen_params}, jnp.asarray(batch),
            jnp.asarray([t], jnp.int32), self._seq_eval_mesh,
            return_recon=True)
        pre = np.asarray(pre, np.float32)[0, :t]
        post = np.asarray(post, np.float32)[0, :t]
        mel32 = mel.astype(np.float32)
        return pre, post, {
            "eval_recon_pre_mse": float(np.mean((pre - mel32) ** 2)),
            "eval_recon_post_mse": float(np.mean((post - mel32) ** 2)),
        }

    def evaluate(self, epoch: int, num_examples: int | None = None):
        cfg = self.config
        if self._eval_step is None:
            self._eval_step = make_eval_step(cfg, self.dtype)
        from mqgan_tpu.utils.plotting import save_triptych

        # eval METRICS are decoupled from plotting (round 5): with
        # num_plot_examples 0 the metrics still run over the (sampled)
        # eval set — previously `0` silently disabled eval AND
        # --keep_best, a footgun the showcase drive hit. Plots are
        # emitted only for the first num_plot_examples clips.
        if num_examples is not None:  # explicit caller count wins exactly
            n_plot = n = min(num_examples, len(self.eval_dataset))
        else:
            n_plot = cfg.logging.num_plot_examples
            n = min(max(n_plot, 16), len(self.eval_dataset))
        rng = np.random.default_rng(epoch)
        idxs = rng.choice(len(self.eval_dataset), size=n, replace=False) if n else []
        metrics_acc = []
        gen_params = self._local_gen_params(use_ema=True)
        for i, idx in enumerate(idxs):
            mel = self.eval_dataset.load(int(idx))
            if mel is None:
                continue
            pre, post, m = self._eval_clip(mel, gen_params)
            metrics_acc.append(m)
            if i >= n_plot:
                continue
            try:
                png = save_triptych(
                    cfg.data.output_dir, f"epoch_{epoch:03d}_eval_{i + 1}",
                    mel, pre, post, length=mel.shape[0],
                )
                self.logger.log_image(
                    f"eval_spectrograms/example_{i + 1}", png,
                    step=int(self.state.step))
            except Exception as e:  # plotting is best-effort
                print(f"plotting failed: {e}")
        if metrics_acc:
            avg = {k: float(np.mean([m[k] for m in metrics_acc]))
                   for k in metrics_acc[0]}
            avg["epoch"] = epoch
            self.logger.log(avg, step=int(self.state.step))
            return avg
        return {}

    def _maybe_save_best(self, epoch: int, ev: Dict[str, float]):
        """Snapshot the generator when eval recon (post) improves — the GAN
        analog of the LSTM trainer's best-val checkpoint. Generator-only
        (what export/warm-start consume); a sidecar JSON records which
        epoch won so resumed runs keep the running best."""
        if not (self.keep_best and self._is_primary and ev):
            return
        import json
        import os

        score = ev.get("eval_recon_post_mse")
        if score is None:
            return
        meta_path = os.path.join(self.config.data.output_dir,
                                 "generator_best.json")
        if self._best_eval == float("inf") and os.path.exists(meta_path):
            with open(meta_path) as f:
                self._best_eval = float(json.load(f)["eval_recon_post_mse"])
        if score >= self._best_eval:
            return
        self._best_eval = score
        path = ckpt_utils.save_generator_only(
            self.config.data.output_dir,
            jax.device_get(self._local_gen_params(use_ema=True)),
            name="generator_best")
        with open(meta_path, "w") as f:
            json.dump({"epoch": epoch, "eval_recon_post_mse": score}, f)
        print(f"New best eval recon {score:.6f} (epoch {epoch}) -> {path}")

    def save(self, epoch: int):
        # state is replicated, so the primary host's copy is the global
        # state; non-primary hosts just hit the barrier
        if self._is_primary:
            background = self.config.logging.async_save
            path = ckpt_utils.save_checkpoint(
                self.config.data.output_dir, jax.device_get(self.state), epoch,
                self.config.to_dict(), background=background,
            )
            print(f"Checkpoint {'queued (async)' if background else 'saved'} "
                  f"to {path}")
        if self.multihost and jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"ckpt_epoch_{epoch}")

    def _install_signal_handlers(self):
        """SIGTERM/SIGINT -> finish the current step, checkpoint, exit
        cleanly (preemption safety). A second signal raises
        KeyboardInterrupt (force-quit). Returns the previous handlers (or
        None when not on the main thread, where signals cannot be set —
        e.g. under some test runners)."""
        import signal as _signal

        def _request_stop(signum, frame):
            if self._stop_requested:
                raise KeyboardInterrupt  # second signal: die for real
            self._stop_requested = True
            print(f"signal {signum}: finishing the current step, then "
                  "checkpointing and exiting (signal again to force-quit)")

        prev = {}
        for sig in (_signal.SIGTERM, _signal.SIGINT):
            try:
                prev[sig] = _signal.signal(sig, _request_stop)
            except ValueError:
                return None
        return prev

    def _collective_stop(self) -> bool:
        """Whether to honor a preemption signal at THIS epoch boundary.

        Under multihost the decision must be COLLECTIVE: signal delivery
        is skewed across hosts, so a host that got SIGTERM just after its
        epoch-N check would stop at N+1 while the others stop at N — the
        save barrier then desyncs (ckpt_epoch_N vs ckpt_epoch_N+1 name
        mismatch, caught by tests/test_parallel.py::
        test_multihost_sigterm_preemption_save). An any-host OR
        (process_allgather max) makes every host stop at the first epoch
        boundary where ANY host has seen the signal."""
        if not (self.multihost and jax.process_count() > 1):
            return self._stop_requested
        import numpy as _np
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            _np.int32(self._stop_requested))
        stop = bool(_np.max(flags))
        if stop:
            self._stop_requested = True  # adopt the collective decision
        return stop

    def train(self):
        import signal as _signal

        cfg = self.config
        prev_handlers = self._install_signal_handlers()
        try:
            for epoch in range(self.start_epoch, cfg.training.num_epochs + 1):
                last = self.train_epoch(epoch)
                print(f"Epoch {epoch}: {last}")
                if self._collective_stop():
                    # preemption save: tagged with the interrupted epoch —
                    # resume continues at epoch+1 (the tail of this
                    # epoch's shuffled crops is skipped, which is the
                    # standard preemption trade at epoch granularity).
                    self.save(epoch)
                    print(f"Stopped by signal after epoch {epoch} "
                          "(possibly partial); checkpoint written.")
                    break
                if (epoch % cfg.logging.eval_interval == 0 and
                        len(self.eval_dataset) and self._is_primary):
                    ev = self.evaluate(epoch)
                    self._maybe_save_best(epoch, ev)
                if epoch % cfg.logging.save_interval == 0:
                    self.save(epoch)
        finally:
            if prev_handlers:
                for sig, h in prev_handlers.items():
                    _signal.signal(sig, h)
        ckpt_utils.wait_for_saves()  # drain async saves before exit
        print("Training finished.")


def main(argv=None):
    from mqgan_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # honor JAX_PLATFORMS even under site overrides
    parser = argparse.ArgumentParser(description="Train an MQGAN-TPU model.")
    parser.add_argument("--config", type=str, default="config.yaml")
    parser.add_argument("--pretrained", type=str, default=None)
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--no_wandb", action="store_true")
    parser.add_argument("--fp32", action="store_true",
                        help="disable bf16 compute")
    parser.add_argument("--profile", type=int, default=0, metavar="N",
                        help="capture a jax.profiler trace for N steps of "
                             "the first epoch into {output_dir}/profile")
    parser.add_argument("--watch", type=int, default=0, metavar="N",
                        help="every N steps, log per-component gradient "
                             "norms and parameter distribution summaries "
                             "(wandb.watch equivalent)")
    parser.add_argument("--compile_cache", type=str, default=None,
                        help="persistent XLA compile-cache dir (or env "
                             "MQGAN_COMPILATION_CACHE): re-runs skip the "
                             "multi-minute train-step compiles")
    parser.add_argument("--rng_impl", type=str, default=None,
                        choices=["rbg", "threefry2x32"],
                        help="training PRNG: rbg (default; hardware RNG, "
                             "7.6x faster dropout masks on TPU) or "
                             "threefry2x32 (bit-identical across "
                             "backends). Auto-resume detects a checkpoint "
                             "written under the other impl and continues "
                             "with the checkpoint's PRNG stream")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize mixer/refiner activations in "
                             "the backward pass (enables large-batch "
                             "training that otherwise OOMs; ~15%% slower "
                             "per step at equal batch)")
    parser.add_argument("--remat_refiner", action="store_true",
                        help="also recompute refiner ConvBlocks in the "
                             "backward: needed when the refiner itself is "
                             "the binding HBM allocation (hifimusic-scale "
                             "refiners at B=64; the flagship never needs "
                             "it and it is slower at equal batch)")
    parser.add_argument("--fast_dropout", action="store_true",
                        help="DEPRECATED no-op: moment-matched Gaussian "
                             "mixer dropout became the default in round 4; "
                             "the flag is kept so older scripted "
                             "invocations keep working. Combining it with "
                             "--exact_dropout is an error (the two request "
                             "opposite semantics); see --exact_dropout")
    parser.add_argument("--exact_dropout", action="store_true",
                        help="reference-parity Bernoulli dropout on the "
                             "mixer hiddens instead of the default "
                             "moment-matched Gaussian (fast-dropout). The "
                             "default changes the mixer regularization "
                             "noise DISTRIBUTION (same mean/variance; "
                             "features-x fewer draws, +5 MFU points at "
                             "flagship B=64) and tracks exact dropout in "
                             "150/300/1000-step convergence A/Bs "
                             "(benchmarks/convergence_ab*.json); use this "
                             "flag for bit-faithful reference training "
                             "noise")
    parser.add_argument("--async_checkpoint", action="store_true",
                        help="write checkpoints on a background thread "
                             "(orbax async): the train loop resumes after "
                             "the host snapshot instead of blocking on "
                             "disk serialization")
    parser.add_argument("--multihost", action="store_true",
                        help="multi-host (multi-slice) run: initialize "
                             "jax.distributed, shard train files per host, "
                             "assemble global batches over all hosts")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="coordinator address for --multihost "
                             "(default: auto-detect)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--seq_par", type=int, default=1, metavar="N",
                        help="sequence (context) parallelism: shard each "
                             "crop's TIME axis over N mesh devices "
                             "(crop lengths must divide by N) — per-device "
                             "activation memory ~T/N, numerics equal to "
                             "the unsharded step (tests/test_parallel.py)")
    parser.add_argument("--ema", type=float, default=0.0, metavar="DECAY",
                        help="maintain an exponential moving average of the "
                             "generator weights (e.g. 0.999): eval metrics, "
                             "eval plots and --keep_best snapshots then use "
                             "the EMA params — the standard GAN deploy "
                             "weights (net-new vs the reference). 0 = off")
    parser.add_argument("--keep_best", action="store_true",
                        help="whenever eval recon (post) improves, snapshot "
                             "the generator to output_dir/generator_best "
                             "(consumable by --pretrained and deploy.export)")
    parser.add_argument("--grad_accum", type=int, default=1, metavar="N",
                        help="gradient accumulation: run each batch as N "
                             "scanned microbatches of batch_size/N rows "
                             "with ONE optimizer update per phase — the "
                             "memory knob for effective batches that OOM "
                             "in one pass (hifimusic batch 64 on a 16G "
                             "chip = --grad_accum 2). Numerics equal the "
                             "one-pass step on pad-free batches "
                             "(tests/test_train_step.py)")
    args = parser.parse_args(argv)

    if args.fast_dropout and args.exact_dropout:
        # contradictory: --fast_dropout predates the default flip and
        # would otherwise silently lose to --exact_dropout (ADVICE r4)
        parser.error("--fast_dropout and --exact_dropout request opposite "
                     "mixer-dropout semantics; drop one (--fast_dropout is "
                     "a deprecated no-op — fast dropout is the default)")

    import os as _os

    cache = args.compile_cache or _os.environ.get("MQGAN_COMPILATION_CACHE")
    if cache:
        import jax as _jax

        _jax.config.update("jax_compilation_cache_dir", cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.multihost:
        from mqgan_tpu.parallel.multihost import initialize

        initialize(coordinator_address=args.coordinator,
                   num_processes=args.num_processes,
                   process_id=args.process_id)

    import dataclasses

    config = TrainConfig.from_yaml(args.config)
    if args.pretrained:
        config = dataclasses.replace(
            config, training=dataclasses.replace(config.training,
                                                 pretrained=args.pretrained)
        )
    if args.output_dir:
        config = dataclasses.replace(
            config, data=dataclasses.replace(config.data,
                                             output_dir=args.output_dir)
        )
    if args.remat:
        config = dataclasses.replace(
            config, model=dataclasses.replace(
                config.model, generator=dataclasses.replace(
                    config.model.generator, remat=True))
        )
    if args.remat_refiner:
        config = dataclasses.replace(
            config, model=dataclasses.replace(
                config.model, generator=dataclasses.replace(
                    config.model.generator, remat_refiner=True))
        )

    # fast-dropout is the CLI default since round 4, re-validated round 5
    # in a HEALTHY-codebook regime (the r4 A/B had collapsed to one code):
    # 1000-step flagship A/B at fsq_noise_dropout 0.5 tracks exact
    # bit-for-par (0.6149 vs 0.6149 final recon, usage 46-47% both arms,
    # convergence_ab_flagship_healthy.json; step cost 698 vs 776 ms =
    # 47.0% vs 42.3% MFU, results_r3_fastdrop.json). --exact_dropout
    # restores the reference's Bernoulli draws; the YAML-level
    # GeneratorConfig default stays False (library users opt in
    # explicitly).
    if not args.exact_dropout:
        config = dataclasses.replace(
            config, model=dataclasses.replace(
                config.model, generator=dataclasses.replace(
                    config.model.generator, fast_dropout=True))
        )
    if args.rng_impl:
        config = dataclasses.replace(
            config, training=dataclasses.replace(config.training,
                                                 rng_impl=args.rng_impl)
        )
    if args.async_checkpoint:
        config = dataclasses.replace(
            config, logging=dataclasses.replace(config.logging,
                                                async_save=True)
        )
    trainer = Trainer(
        config, use_wandb=not args.no_wandb,
        dtype=jnp.float32 if args.fp32 else jnp.bfloat16,
        profile_steps=args.profile,
        multihost=args.multihost,
        watch_interval=args.watch,
        mesh=make_mesh(n_seq=args.seq_par) if args.seq_par > 1 else None,
        grad_accum=args.grad_accum,
        keep_best=args.keep_best,
        ema_decay=args.ema,
    )
    trainer.train()
    trainer.logger.close()


if __name__ == "__main__":
    main()
