"""Load the PyTorch reference implementation for golden parity tests.

The reference (read-only at /root/reference) needs `einx`, which is not
installed; only `einx.where('b, b ..., b ...', mask, a, b)` is used
(quantizer.py:151,160) and only on the training path, so a minimal stub is
sufficient. We never copy reference code — we import and *run* it to produce
golden outputs.
"""

import sys
import types


def _install_einx_stub():
    if "einx" in sys.modules:
        return
    import torch

    einx = types.ModuleType("einx")

    def where(pattern, mask, a, b):
        assert pattern.startswith("b,"), pattern
        m = mask.reshape(mask.shape[0], *([1] * (a.ndim - 1)))
        return torch.where(m, a, b)

    einx.where = where
    sys.modules["einx"] = einx


def _install_wandb_stub():
    """train_music_lstm_v2.py imports wandb at module level; stub the few
    entry points so the reference LM model class is importable."""
    if "wandb" in sys.modules:
        return
    wandb = types.ModuleType("wandb")
    for name in ("init", "log", "watch", "finish", "save"):
        setattr(wandb, name, lambda *a, **k: None)
    sys.modules["wandb"] = wandb


def load_reference_modules():
    """Returns (preencoder, quantizer, attentions, losses, discriminators)
    reference modules."""
    _install_einx_stub()
    _install_wandb_stub()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import attentions  # noqa: F401
    import quantizer  # noqa: F401
    import preencoder  # noqa: F401
    import losses  # noqa: F401
    import discriminators  # noqa: F401

    return preencoder, quantizer, attentions, losses, discriminators
