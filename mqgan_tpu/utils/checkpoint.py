"""Checkpointing (orbax) + warm-start import.

Capability map vs the reference:
* reference saves {epoch, generator weights, both optimizer states, scaler
  states, config} and auto-resumes the newest checkpoint
  (train.py:625-636, 339-347). Discriminator *weights* are never saved
  there; we checkpoint the FULL TrainState (including discriminators,
  LeCam EMA and spectral-norm stats) — strictly more capable — while
  keeping the generator-only warm-start path (train.py:362-378), which also
  accepts raw PyTorch .pth checkpoints via utils.torch_import.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

CKPT_RE = re.compile(r"checkpoint_epoch_(\d+)$")


def _checkpointer():
    return ocp.StandardCheckpointer()


def _save_mp_options():
    """Multihost saves are PRIMARY-ONLY (the trainer device_gets the
    replicated state on process 0 and every other process just waits at
    the trainer's own sync barrier, train/trainer.py:save). orbax must
    therefore coordinate its internal save barriers across process 0
    ALONE — with the default global options its `_Checkpointer:save_*`
    barriers would wait for processes that never call save and collide
    with the trainer's barrier (name-mismatch crash, caught by
    tests/test_parallel.py::test_multihost_checkpoint_save_and_resume).
    Restores stay on default options: every process restores
    symmetrically."""
    import jax

    if jax.process_count() > 1:
        return ocp.options.MultiprocessingOptions(
            primary_host=0, active_processes={0},
            barrier_sync_key_prefix="mqgan_primary_save")
    return None


def _save_checkpointer():
    opts = _save_mp_options()
    if opts is None:
        return ocp.StandardCheckpointer()
    return ocp.Checkpointer(ocp.StandardCheckpointHandler(),
                            multiprocessing_options=opts)


_ASYNC_CKPTR = None


def _async_checkpointer():
    """Process-wide AsyncCheckpointer (reused so successive background saves
    serialize against each other inside orbax instead of racing)."""
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        opts = _save_mp_options()
        kw = {} if opts is None else {"multiprocessing_options": opts}
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler(),
                                             **kw)
    return _ASYNC_CKPTR


def wait_for_saves() -> None:
    """Block until every background save issued via
    save_checkpoint(background=True) has committed to disk."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def _is_key_leaf(x) -> bool:
    dt = getattr(x, "dtype", None)
    return dt is not None and jax.numpy.issubdtype(dt, jax.dtypes.prng_key)


def _key_impl_name(dtype) -> str:
    # the registry name ("threefry2x32", "rbg", ...), NOT the short tag
    # in str(dtype) ("key<fry>") — wrap_key_data resolves only the former
    return dtype._impl.name


def _encode_keys(tree):
    """PRNG-key leaves -> raw uint32 key_data (same tree structure).

    Checkpoints store key leaves (TrainState.rng) as their key data:
    typed key arrays have no numpy form, and in a multi-process run the
    primary's device_get leaves them as host-local jax.Arrays that orbax
    refuses to serialize (caught by the 2-process save test). The
    template's key dtype tells restore which impl to wrap back."""

    def enc(x):
        return np.asarray(jax.random.key_data(x)) if _is_key_leaf(x) else x

    return jax.tree.map(enc, tree)


def _encode_keys_abstract(tree):
    def enc(x):
        return jax.eval_shape(jax.random.key_data, x) if _is_key_leaf(x) \
            else x

    return jax.tree.map(enc, tree)


def _decode_keys(restored, template):
    def dec(r, t):
        if _is_key_leaf(t):
            if _is_key_leaf(r):
                # legacy (pre-round-4) checkpoints stored the typed key
                # array directly; orbax hands it back as-is regardless of
                # the key_data template, so accept it unchanged (its dtype
                # carries the impl). Old run dirs keep auto-resuming with
                # no retry — genuine restore failures propagate directly
                # instead of being masked by a second attempt (ADVICE r4).
                return r
            return jax.random.wrap_key_data(
                jax.numpy.asarray(r), impl=_key_impl_name(t.dtype))
        return r

    return jax.tree.map(dec, restored, template)


def _abstract_leaf(x):
    """ShapeDtypeStruct template leaf with a concrete sharding.

    orbax's deserializer requires every abstract leaf to carry a concrete
    jax.sharding.Sharding; jax.eval_shape templates have sharding=None, so
    default those to the process's first device."""
    sds = ocp.utils.to_shape_dtype_struct(x)
    if getattr(sds, "sharding", None) is None:
        sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
        sds = jax.ShapeDtypeStruct(sds.shape, sds.dtype, sharding=sharding)
    return sds


def save_checkpoint(output_dir: str, state: Any, epoch: int, config_dict=None,
                    background: bool = False) -> str:
    """Save the full TrainState under output_dir/checkpoint_epoch_{epoch:03d}.

    background=True returns as soon as the (host-resident) state is handed
    to orbax's async commit thread; call wait_for_saves() before relying on
    the files (the trainer does so at exit). The reference's torch.save is
    synchronous (train.py:625-636) — this is strictly additional capability.
    """
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.abspath(os.path.join(output_dir, f"checkpoint_epoch_{epoch:03d}"))
    ckptr = _async_checkpointer() if background else _save_checkpointer()
    ckptr.save(path, _encode_keys(state), force=True)
    if not background and hasattr(ckptr, "wait_until_finished"):
        ckptr.wait_until_finished()  # plain Checkpointer saves are sync
    if config_dict is not None:
        with open(os.path.join(output_dir, "config.json"), "w") as f:
            json.dump({"epoch": epoch, "config": config_dict}, f, indent=2, default=str)
    return path


def latest_checkpoint(output_dir: str) -> tuple[str, int] | None:
    """Newest checkpoint by epoch number (reference picks by ctime,
    train.py:341 — epoch number is equivalent and more robust)."""
    if not os.path.isdir(output_dir):
        return None
    best = None
    for name in os.listdir(output_dir):
        m = CKPT_RE.match(name)
        if m:
            epoch = int(m.group(1))
            if best is None or epoch > best[1]:
                best = (os.path.abspath(os.path.join(output_dir, name)), epoch)
    return best


def restore_checkpoint(path: str, abstract_state: Any) -> Any:
    """Restore a TrainState saved by save_checkpoint; abstract_state is a
    template (e.g. jax.eval_shape of the init fn, or an actual state)."""
    ckptr = _checkpointer()
    template = jax.tree.map(_abstract_leaf, _encode_keys_abstract(abstract_state))
    # one restore handles BOTH on-disk formats: orbax returns leaves in
    # their STORED form (key_data uint32 for round-4+ saves, typed key
    # arrays for legacy ones) regardless of the template dtype, and
    # _decode_keys normalizes either to a typed key. No blind retry:
    # missing/corrupt/shape-mismatched checkpoints raise their real error
    # (tests/test_trainer.py pins both format paths).
    return _decode_keys(ckptr.restore(path, template), abstract_state)


def save_generator_only(output_dir: str, gen_params: Any, name: str = "generator") -> str:
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.abspath(os.path.join(output_dir, name))
    ckptr = _save_checkpointer()
    ckptr.save(path, gen_params, force=True)
    if hasattr(ckptr, "wait_until_finished"):
        ckptr.wait_until_finished()  # plain Checkpointer saves are sync
    return path


def load_pretrained_generator(path: str, channels, refiner_depth: int,
                              template: Any | None = None) -> Any:
    """Generator warm-start from either:
    * a PyTorch .pth checkpoint (reference format, train.py:362-378), or
    * an orbax generator-only directory saved by save_generator_only.
    """
    if os.path.isfile(path) and path.endswith((".pth", ".pt")):
        import torch

        from mqgan_tpu.utils.torch_import import import_generator_params

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt.get("model_state_dict", ckpt)
        return import_generator_params(sd, channels, refiner_depth)
    ckptr = _checkpointer()
    if template is not None:
        tmpl = jax.tree.map(_abstract_leaf, template)
        return ckptr.restore(os.path.abspath(path), tmpl)
    return ckptr.restore(os.path.abspath(path))
