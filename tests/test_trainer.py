"""Integration: data pipeline + full trainer loop on synthetic data, with
checkpoint save/resume, on the virtual 8-device CPU mesh (data parallel)."""

import dataclasses
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mqgan_tpu.core.config import (
    DataConfig,
    GeneratorConfig,
    LoggingConfig,
    ModelConfig,
    MultiBinDiscriminatorConfig,
    PatchDiscriminatorConfig,
    TrainConfig,
    TrainingConfig,
)
from mqgan_tpu.train.data import MelDataset, MelLoader, collate, find_npy_files, split_train_eval

MEL = 16


def make_dataset(tmp_path, n=24):
    rng = np.random.default_rng(0)
    d = tmp_path / "mels"
    (d / "sub").mkdir(parents=True)
    for i in range(n):
        t = int(rng.integers(20, 70))
        sub = "sub" if i % 3 == 0 else "."
        np.save(d / sub / f"clip_{i:03d}_mel.npy",
                rng.standard_normal((t, MEL)).astype(np.float32))
    return str(d)


def test_data_pipeline(tmp_path):
    data_dir = make_dataset(tmp_path)
    files = find_npy_files(data_dir)
    assert len(files) == 24
    train, evals = split_train_eval(files, 0.25, seed=42)
    assert len(evals) == 6 and len(train) == 18
    assert set(train).isdisjoint(evals)
    # deterministic given seed
    train2, evals2 = split_train_eval(files, 0.25, seed=42)
    assert train == train2 and evals == evals2

    loader = MelLoader(MelDataset(train), batch_size=8, crop_lens=(32, 48), seed=1)
    batches = list(loader.epoch(0))
    assert len(batches) == 3  # 18 files / 8 -> 3 (last repeat-padded)
    for b in batches:
        assert b.mel.shape[0] == 8
        assert b.mel.shape[1] in (32, 48)
        assert b.mel.shape[2] == MEL
        assert (b.lengths <= b.mel.shape[1]).all()
        # real rows have positive lengths; "<pad>" fill rows are
        # zero-length (and zero mel) so they fall out of every masked loss
        for L, name in zip(b.lengths, b.filenames):
            assert (L == 0) == (name == "<pad>")
        # padding beyond length is zero
        for i, L in enumerate(b.lengths):
            assert np.abs(b.mel[i, L:]).sum() == 0

    # different epochs shuffle differently
    o1 = [b.filenames for b in loader.epoch(1)]
    o2 = [b.filenames for b in loader.epoch(2)]
    assert o1 != o2


def test_collate_crop_and_pad():
    import random

    rng = random.Random(0)
    items = [(np.ones((10, 4), np.float32), "a"), (np.ones((50, 4), np.float32), "b")]
    b = collate(items, (32,), rng)
    assert b.mel.shape == (2, 32, 4)
    np.testing.assert_array_equal(b.lengths, [10, 32])
    assert b.mel[0, 10:].sum() == 0


def trainer_config(data_dir, out_dir):
    return TrainConfig(
        data=DataConfig(data_dir=data_dir, output_dir=out_dir,
                        validation_split=0.25, crop_len=(32, 48), batch_size=8),
        model=ModelConfig(
            mel_channels=MEL,
            generator=GeneratorConfig(
                channels=(8, 12), kernel_sizes=(3,), dropout=0.1,
                fsq_levels=(8, 5, 5, 5), refiner_base_channels=4, refiner_depth=2,
            ),
            discriminator_patch=PatchDiscriminatorConfig(
                hidden_channels=(4, 8), kernel_sizes=(3, 3, 3),
                strides=((1, 2), (2, 2), (1, 1)),
            ),
            discriminator_multibin=MultiBinDiscriminatorConfig(
                hidden_channels=(4, 4), kernel_sizes=(3, 3, 3),
                n_bins=2, n_no_strides=1,
            ),
        ),
        training=TrainingConfig(
            num_epochs=2, warmup_steps=5, discriminator_train_start_epoch=2,
            seed=0,
        ),
        logging=LoggingConfig(eval_interval=2, save_interval=2,
                              # e2e covers the background-save path end to
                              # end (train -> drain -> resume)
                              async_save=True,
                              num_plot_examples=1),
    )


@pytest.mark.slow
def test_trainer_end_to_end(tmp_path):
    from mqgan_tpu.train.trainer import Trainer

    data_dir = make_dataset(tmp_path)
    out_dir = str(tmp_path / "out")
    cfg = trainer_config(data_dir, out_dir)

    assert jax.device_count() == 8  # virtual CPU mesh
    trainer = Trainer(cfg, use_wandb=False, dtype=jnp.float32,
                      max_steps_per_epoch=2)
    trainer.train()  # epoch 1 warmup, epoch 2 GAN phase
    trainer.logger.close()

    # metrics JSONL written with finite losses
    with open(os.path.join(out_dir, "train_metrics.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    assert any("loss_g_total" in r for r in recs)
    assert all(np.isfinite(r.get("loss_g_total", 0.0)) for r in recs)
    gan_recs = [r for r in recs if r.get("loss_d", 0) > 0]
    assert gan_recs, "epoch 2 should have trained the discriminator"

    # checkpoint written and resumable
    from mqgan_tpu.utils.checkpoint import latest_checkpoint

    latest = latest_checkpoint(out_dir)
    assert latest is not None and latest[1] == 2

    trainer2 = Trainer(cfg, use_wandb=False, dtype=jnp.float32,
                       max_steps_per_epoch=2)
    assert trainer2.start_epoch == 3
    assert int(trainer2.state.step) == int(trainer.state.step)
    np.testing.assert_allclose(
        float(trainer2.state.lecam.ema_real), float(trainer.state.lecam.ema_real)
    )
    trainer2.logger.close()

    # eval plots got rendered
    plots = os.listdir(os.path.join(out_dir, "plots"))
    assert any(p.endswith(".png") for p in plots)


@pytest.mark.slow
def test_trainer_multihost_path_identity(tmp_path):
    """Single-process run through the --multihost code path (host file
    sharding + make_global_batch + primary-host gating) is numerically
    identical to the default path."""
    import dataclasses

    from mqgan_tpu.train.trainer import Trainer

    data_dir = make_dataset(tmp_path)
    cfg = trainer_config(data_dir, str(tmp_path / "out_a"))
    cfg = dataclasses.replace(
        cfg, training=dataclasses.replace(cfg.training, num_epochs=1))

    t_plain = Trainer(cfg, use_wandb=False, dtype=jnp.float32,
                      max_steps_per_epoch=2)
    t_plain.train()
    t_plain.logger.close()

    cfg_mh = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data,
                                      output_dir=str(tmp_path / "out_b")))
    t_mh = Trainer(cfg_mh, use_wandb=False, dtype=jnp.float32,
                   max_steps_per_epoch=2, multihost=True)
    assert t_mh._is_primary  # process 0 of 1
    t_mh.train()
    t_mh.logger.close()

    flat_a = jax.tree_util.tree_leaves(t_plain.state.gen_params)
    flat_b = jax.tree_util.tree_leaves(t_mh.state.gen_params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(t_plain.state.lecam.ema_real),
        np.asarray(t_mh.state.lecam.ema_real))
    assert int(t_plain.state.step) == int(t_mh.state.step)


@pytest.mark.slow
def test_eval_covers_full_length(tmp_path):
    """Eval must not truncate clips longer than the largest inference
    bucket (512): the chunked eval path covers every frame, like the
    reference's full-length _evaluate (train.py:585-599)."""
    from mqgan_tpu.train.trainer import Trainer

    data_dir = make_dataset(tmp_path)
    # add one clip much longer than the 512-frame eval bucket
    long_mel = np.random.default_rng(3).standard_normal(
        (1100, MEL)).astype(np.float32)
    np.save(os.path.join(data_dir, "clip_long_mel.npy"), long_mel)

    cfg = trainer_config(data_dir, str(tmp_path / "out"))
    trainer = Trainer(cfg, use_wandb=False, dtype=jnp.float32)
    from mqgan_tpu.train.step import make_eval_step

    trainer._eval_step = make_eval_step(cfg, jnp.float32)
    pre, post, m = trainer._eval_clip(long_mel)
    assert pre.shape == long_mel.shape and post.shape == long_mel.shape
    # frames past the bucket boundary were actually produced
    assert np.abs(post[512:]).sum() > 0
    assert np.abs(pre[1024:]).sum() > 0
    np.testing.assert_allclose(
        m["eval_recon_post_mse"],
        float(np.mean((post - long_mel) ** 2)), rtol=1e-6)
    trainer.logger.close()


def test_metrics_logger_mirrors_images_to_wandb(tmp_path):
    """log_image sends the on-disk triptych PNG as a wandb.Image when a run
    is active (reference train.py:568-573) and is a no-op otherwise."""
    from mqgan_tpu.utils.logging import MetricsLogger

    lg = MetricsLogger(str(tmp_path), "t")
    lg.log_image("x", str(tmp_path / "missing.png"), step=1)  # no wandb: no-op

    class FakeWandb:
        class Image:
            def __init__(self, path):
                self.path = path

        def __init__(self):
            self.logged = []

        def log(self, d, step=None):
            self.logged.append((d, step))

        def finish(self):
            pass

    fw = FakeWandb()
    lg._wandb = fw
    png = tmp_path / "a.png"
    png.write_bytes(b"\x89PNG")
    lg.log_image("train_spectrograms/example_1", str(png), step=7)
    (d, step), = fw.logged
    img = d["train_spectrograms/example_1"]
    assert isinstance(img, FakeWandb.Image) and img.path == str(png)
    assert step == 7
    lg.close()


def test_async_checkpoint_roundtrip(tmp_path):
    """background=True saves commit after wait_for_saves() and restore to the
    exact same tree; latest_checkpoint never sees half-written directories
    (orbax commits via atomic rename)."""
    from mqgan_tpu.utils import checkpoint as ckpt_utils

    state = {
        "params": {"w": jnp.arange(12.0).reshape(3, 4),
                   "b": jnp.ones((4,), jnp.float32)},
        "step": jnp.asarray(7, jnp.int32),
    }
    out = str(tmp_path / "ckpts")
    p1 = ckpt_utils.save_checkpoint(out, state, epoch=1, background=True)
    p2 = ckpt_utils.save_checkpoint(out, state, epoch=2,
                                    config_dict={"k": 1}, background=True)
    ckpt_utils.wait_for_saves()
    assert ckpt_utils.latest_checkpoint(out) == (p2, 2)
    restored = ckpt_utils.restore_checkpoint(p1, jax.eval_shape(lambda: state))
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # config sidecar written by the epoch-2 save
    with open(os.path.join(out, "config.json")) as f:
        assert json.load(f)["epoch"] == 2


def test_resume_across_rng_impl(tmp_path, capsys):
    """A checkpoint written under one PRNG impl (different key-data shape)
    auto-resumes under a config that defaults to the other impl: the
    trainer retries the restore template with the alternate impl and
    continues with the checkpoint's own PRNG stream."""
    from mqgan_tpu.train.trainer import Trainer
    from mqgan_tpu.utils import checkpoint as ckpt_utils

    data_dir = make_dataset(tmp_path)
    out_dir = str(tmp_path / "out")
    cfg_tf = trainer_config(data_dir, out_dir)
    cfg_tf = dataclasses.replace(
        cfg_tf, training=dataclasses.replace(cfg_tf.training,
                                             rng_impl="threefry2x32"))
    t1 = Trainer(cfg_tf, use_wandb=False, dtype=jnp.float32)
    t1.save(epoch=1)  # threefry key (key-data shape (2,) uint32)
    ckpt_utils.wait_for_saves()  # async save must commit before t2 scans
    t1.logger.close()

    cfg_rbg = trainer_config(data_dir, out_dir)
    assert cfg_rbg.training.rng_impl == "rbg"
    t2 = Trainer(cfg_rbg, use_wandb=False, dtype=jnp.float32)
    assert t2.start_epoch == 2
    assert "rng_impl='threefry2x32'" in capsys.readouterr().out
    # the restored key carries the checkpoint's impl
    import jax.random as jr
    impl = str(jr.key_impl(jax.device_get(t2.state.rng)))
    assert "threefry" in impl
    t2.logger.close()


@pytest.mark.slow
def test_checkpoint_key_roundtrip_and_legacy(tmp_path):
    """PRNG-key leaves round-trip checkpoints as raw key_data (the
    multihost-serializable round-4 format), and LEGACY checkpoints that
    stored typed key arrays directly still restore (old run dirs keep
    auto-resuming)."""
    import orbax.checkpoint as ocp

    from mqgan_tpu.utils.checkpoint import (restore_checkpoint,
                                            save_checkpoint)

    state = {"w": jnp.arange(4.0), "rng": jax.random.key(7, impl="rbg"),
             "step": jnp.int32(3)}
    abstract = jax.eval_shape(lambda: state)

    new_dir = str(tmp_path / "new")
    save_checkpoint(new_dir, jax.device_get(state), 1)
    r = restore_checkpoint(os.path.join(new_dir, "checkpoint_epoch_001"),
                           abstract)
    assert jnp.issubdtype(r["rng"].dtype, jax.dtypes.prng_key)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(r["rng"])),
        np.asarray(jax.random.key_data(state["rng"])))
    # the restored key continues the same stream
    np.testing.assert_array_equal(
        np.asarray(jax.random.normal(r["rng"], (3,))),
        np.asarray(jax.random.normal(state["rng"], (3,))))

    legacy_path = str(tmp_path / "legacy" / "checkpoint_epoch_001")
    legacy_ckptr = ocp.StandardCheckpointer()
    legacy_ckptr.save(legacy_path, state, force=True)
    legacy_ckptr.wait_until_finished()  # StandardCheckpointer is async
    r2 = restore_checkpoint(legacy_path, abstract)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(r2["rng"])),
        np.asarray(jax.random.key_data(state["rng"])))
    np.testing.assert_array_equal(np.asarray(r2["w"]), np.arange(4.0))


def test_seq_par_constraint_errors(tmp_path):
    """--seq_par's documented limits fail LOUDLY at construction (before
    any data/device work): crop buckets must divide by the factor. With
    --multihost, seq-par now COMPOSES (round 4) as long as every seq
    group sits inside one process — trivially true single-process, so
    construction succeeds where round 3 refused."""
    import dataclasses

    from mqgan_tpu.parallel.mesh import make_mesh
    from mqgan_tpu.train.trainer import Trainer

    data_dir = make_dataset(tmp_path)
    cfg = trainer_config(data_dir, str(tmp_path / "out"))
    mesh_sp = make_mesh(n_seq=4)  # crop 48 is fine, 32/48 vs 4: 48 ok, 32 ok
    bad_cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, crop_len=(30, 48)))
    with pytest.raises(ValueError, match="do not divide"):
        Trainer(bad_cfg, use_wandb=False, dtype=jnp.float32, mesh=mesh_sp)
    t = Trainer(cfg, use_wandb=False, dtype=jnp.float32, mesh=mesh_sp,
                multihost=True)  # aligned: all devices are process 0
    assert t.mesh.shape["seq"] == 4
    t.logger.close()


def test_sigterm_graceful_checkpoint(tmp_path):
    """SIGTERM mid-run -> the trainer finishes the current step, writes a
    checkpoint tagged with the interrupted epoch, and exits 0 (preemption
    safety). A fresh Trainer on the same output_dir resumes from it."""
    import signal
    import subprocess
    import sys
    import time as _time

    data_dir = make_dataset(tmp_path)
    out_dir = str(tmp_path / "out")
    yaml_path = tmp_path / "model.yaml"
    # warmup-only (D start far away) keeps this to one compile per bucket;
    # save_interval 50 ensures the only checkpoint is the preemption save
    yaml_path.write_text(f"""
data:
  data_dir: {data_dir}
  output_dir: {out_dir}
  batch_size: 8
  crop_len: [32]
  validation_split: 0.25
model:
  mel_channels: {MEL}
  generator:
    channels: [8, 12]
    kernel_sizes: [3]
    fsq_levels: [8, 5, 5, 5]
    refiner_base_channels: 4
    refiner_depth: 2
  discriminator_patch:
    hidden_channels: [4, 8]
    kernel_sizes: [3, 3, 3]
    strides: [[1, 2], [2, 2], [1, 1]]
  discriminator_multibin:
    hidden_channels: [4, 4]
    kernel_sizes: [3, 3, 3]
    n_bins: 2
    n_no_strides: 1
training:
  num_epochs: 500
  discriminator_train_start_epoch: 400
  warmup_steps: 5
logging:
  eval_interval: 100
  save_interval: 50
""")
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               PYTHONUNBUFFERED="1")
    proc = subprocess.Popen(
        [sys.executable, "-m", "mqgan_tpu.train.trainer",
         "--config", str(yaml_path), "--no_wandb", "--fp32"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    lines = []
    try:
        deadline = _time.time() + 540
        # wait until a couple of epochs ran, then preempt
        while _time.time() < deadline:
            line = proc.stdout.readline()
            if not line:
                break
            lines.append(line)
            if line.startswith("Epoch 3:"):
                proc.send_signal(signal.SIGTERM)
                break
        else:
            pytest.fail("trainer never reached epoch 3")
        rest, _ = proc.communicate(timeout=180)
        lines.append(rest)
    finally:
        if proc.poll() is None:
            proc.kill()
    out = "".join(lines)
    assert proc.returncode == 0, out[-3000:]
    assert "checkpoint written" in out.lower(), out[-3000:]
    assert "Training finished." in out

    from mqgan_tpu.utils.checkpoint import latest_checkpoint

    latest = latest_checkpoint(out_dir)
    assert latest is not None
    epoch = latest[1]
    assert epoch >= 3  # the preemption save, not a periodic one (interval 50)

    # resumable: a fresh Trainer picks the preemption checkpoint up
    from mqgan_tpu.train.trainer import Trainer

    cfg = TrainConfig.from_yaml(str(yaml_path))
    trainer = Trainer(cfg, use_wandb=False, dtype=jnp.float32)
    assert trainer.start_epoch == epoch + 1
    assert int(trainer.state.step) > 0
    trainer.logger.close()


@pytest.mark.slow
def test_keep_best_generator_snapshot(tmp_path):
    """--keep_best snapshots the generator when eval recon improves:
    generator_best + sidecar JSON written, loadable as a --pretrained
    warm start, and a resumed trainer keeps the running best (no
    overwrite on a worse eval)."""
    from mqgan_tpu.train.trainer import Trainer
    from mqgan_tpu.utils.checkpoint import load_pretrained_generator

    data_dir = make_dataset(tmp_path)
    out_dir = str(tmp_path / "out")
    cfg = trainer_config(data_dir, out_dir)

    trainer = Trainer(cfg, use_wandb=False, dtype=jnp.float32,
                      max_steps_per_epoch=2, keep_best=True)
    trainer.train()  # eval_interval=2 -> one eval at epoch 2
    trainer.logger.close()

    best_dir = os.path.join(out_dir, "generator_best")
    meta = os.path.join(out_dir, "generator_best.json")
    assert os.path.isdir(best_dir) and os.path.exists(meta)
    rec = json.load(open(meta))
    assert rec["epoch"] == 2 and np.isfinite(rec["eval_recon_post_mse"])

    # consumable as a generator warm start (orbax generator-only format)
    gcfg = cfg.model.generator
    params = load_pretrained_generator(
        best_dir, gcfg.channels, gcfg.refiner_depth,
        template=jax.device_get(trainer.state.gen_params))
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(
                jax.device_get(trainer.state.gen_params)))

    # a fresh trainer reads the sidecar and refuses a worse score
    trainer2 = Trainer(cfg, use_wandb=False, dtype=jnp.float32,
                       max_steps_per_epoch=2, keep_best=True)
    before = os.path.getmtime(meta)
    trainer2._maybe_save_best(
        99, {"eval_recon_post_mse": rec["eval_recon_post_mse"] + 1.0})
    assert os.path.getmtime(meta) == before  # not overwritten
    assert trainer2._best_eval == pytest.approx(rec["eval_recon_post_mse"])
    trainer2.logger.close()


def test_codebook_collapse_warning(capsys):
    """The collapse guardrail fires after `patience` consecutive low-usage
    logs, warns exactly once per episode, and re-arms after recovery."""
    from types import SimpleNamespace

    from mqgan_tpu.train.trainer import Trainer

    cfg = TrainConfig.from_dict({"logging": {
        "codebook_usage_floor": 0.02, "codebook_collapse_patience": 3}})
    stub = SimpleNamespace(config=cfg, _collapse_streak=0,
                           _collapse_warned=False)
    check = Trainer._check_codebook_health

    # healthy logs never warn
    for step in range(5):
        check(stub, {"codebook_usage": 0.3}, step)
    assert "collapse" not in capsys.readouterr().out

    # two low logs: below patience, silent
    check(stub, {"codebook_usage": 0.001}, 10)
    check(stub, {"codebook_usage": 0.001}, 20)
    assert "collapse" not in capsys.readouterr().out

    # third consecutive low log trips the warning (once)
    check(stub, {"codebook_usage": 0.001, "codebook_perplexity": 1.0}, 30)
    out = capsys.readouterr().out
    assert "WARNING: codebook collapse at step 30" in out
    assert "fsq_noise_dropout" in out  # actionable mitigation named

    # sustained collapse does not spam
    check(stub, {"codebook_usage": 0.001}, 40)
    assert "collapse" not in capsys.readouterr().out

    # recovery re-arms; a second episode warns again
    check(stub, {"codebook_usage": 0.5}, 50)
    for step in (60, 70, 80):
        check(stub, {"codebook_usage": 0.0}, step)
    assert "WARNING: codebook collapse at step 80" in capsys.readouterr().out

    # floor <= 0 disables the check entirely
    cfg_off = TrainConfig.from_dict({"logging": {"codebook_usage_floor": 0}})
    stub_off = SimpleNamespace(config=cfg_off, _collapse_streak=0,
                               _collapse_warned=False)
    for step in range(10):
        check(stub_off, {"codebook_usage": 0.0}, step)
    assert "collapse" not in capsys.readouterr().out


def test_contradictory_dropout_flags_error(tmp_path, capsys):
    """--fast_dropout (deprecated no-op) combined with --exact_dropout is
    a hard CLI error instead of silently resolving to exact (ADVICE r4)."""
    from mqgan_tpu.train.trainer import main as trainer_main

    with pytest.raises(SystemExit) as ei:
        trainer_main(["--fast_dropout", "--exact_dropout", "--no_wandb"])
    assert ei.value.code == 2  # argparse error exit
    assert "opposite" in capsys.readouterr().err


@pytest.mark.slow
def test_eval_metrics_run_without_plots(tmp_path):
    """num_plot_examples=0 must still produce eval metrics (and thus feed
    --keep_best) — previously 0 silently disabled eval entirely."""
    data_dir = make_dataset(tmp_path)
    cfg = trainer_config(data_dir, str(tmp_path / "out"))
    cfg = dataclasses.replace(cfg, logging=dataclasses.replace(
        cfg.logging, num_plot_examples=0))
    from mqgan_tpu.train.trainer import Trainer

    t = Trainer(cfg, use_wandb=False, dtype=jnp.float32)
    try:
        t.train_epoch(1)
        ev = t.evaluate(1)
        assert "eval_recon_post_mse" in ev and np.isfinite(
            ev["eval_recon_post_mse"])
        # no plot files were written
        assert not list((tmp_path / "out").glob("*eval*.png"))
    finally:
        t.logger.close()
