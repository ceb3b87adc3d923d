"""Subprocess worker for the real 2-process multihost test.

Runs the full GAN Trainer over jax.distributed (CPU backend, gloo
collectives) and dumps the final generator + discriminator params to an
.npz so the parent test can assert exact parameter equality between a
2-process multihost run and a plain single-process run on the union of
files — the reference contract that step semantics are independent of
process count (/root/reference/train.py:380-501).

Round-4: optional [num_epochs] [save_interval] args let the parent test
exercise the multihost CHECKPOINT paths — mid-run saves under 2
processes (Trainer.save: primary-only device_get + sync barrier), a
2-process auto-resume from a prior run's checkpoint in the same
out_dir, and the SIGTERM preemption save (the parent signals both
workers mid-epoch; Trainer checkpoints and exits 0).

Usage: python tests/multihost_worker.py <proc_id> <num_procs> <port>
       <devices_per_proc> <data_dir> <out_dir> <params_npz>
       [num_epochs] [save_interval]
"""

import os
import sys


def main():
    proc_id, num_procs, port, n_dev = map(int, sys.argv[1:5])
    data_dir, out_dir, params_npz = sys.argv[5:8]
    num_epochs = int(sys.argv[8]) if len(sys.argv) > 8 else 2
    save_interval = int(sys.argv[9]) if len(sys.argv) > 9 else 99
    n_seq = int(sys.argv[10]) if len(sys.argv) > 10 else 1

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_dev}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    if num_procs > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=num_procs,
            process_id=proc_id,
        )

    import jax.numpy as jnp
    import numpy as np

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
    from mqgan_tpu.train.trainer import Trainer

    config = TrainConfig(
        data=DataConfig(data_dir=data_dir, output_dir=out_dir,
                        validation_split=0.2, crop_len=(24, 32), batch_size=8),
        model=ModelConfig(
            mel_channels=12,
            generator=GeneratorConfig(
                channels=(8, 12), kernel_sizes=(3,), dropout=0.0,
                fsq_levels=(8, 5, 5, 5), refiner_base_channels=4,
                refiner_depth=2,
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
            num_epochs=num_epochs, warmup_steps=3,
            discriminator_train_start_epoch=2, seed=0,
        ),
        logging=LoggingConfig(eval_interval=99, save_interval=save_interval,
                              num_plot_examples=0),
    )

    mesh = None
    if n_seq > 1:
        # multihost x sequence parallelism: rows over 'data' (crossing
        # processes), each crop's TIME axis over intra-process 'seq'
        from mqgan_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_seq=n_seq)
    trainer = Trainer(
        config, use_wandb=False, dtype=jnp.float32,
        multihost=(num_procs > 1), mesh=mesh,
    )
    trainer.train()

    if jax.process_index() == 0:
        state = jax.device_get(trainer.state)
        flat = {}
        for name, tree in [("gen", state.gen_params),
                           ("disc", state.disc_params)]:
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
                flat[name + jax.tree_util.keystr(path)] = np.asarray(leaf)
        np.savez(params_npz, **flat)
        print(f"params dumped: {len(flat)} leaves -> {params_npz}")
    if num_procs > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("done")


if __name__ == "__main__":
    main()
