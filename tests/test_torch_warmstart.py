"""Generator warm-start from a raw PyTorch .pth checkpoint — the reference
training-script format {'model_state_dict': ...} (train.py:362-378,625-636)
routed through utils.checkpoint.load_pretrained_generator."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from mqgan_tpu.models.preencoder import PreEncoder
from mqgan_tpu.utils.checkpoint import load_pretrained_generator
from tests.reference_loader import load_reference_modules

MEL, CHANNELS, KERNELS = 16, (8, 12), (3,)


def test_pth_warmstart_roundtrip(tmp_path, rng):
    ref_pre, *_ = load_reference_modules()
    torch.manual_seed(1)
    tmodel = ref_pre.PreEncoder(
        mel_channels=MEL, channels=list(CHANNELS), kernel_sizes=list(KERNELS),
        fsq_levels=[8, 5, 5, 5], dropout=0.0,
        refiner_base_channels=4, refiner_depth=2,
    )
    tmodel.eval()
    # save in the reference trainer's checkpoint format, with a DataParallel
    # 'module.' prefix to exercise the cleanup path (train.py:373)
    sd = {"module." + k: v for k, v in tmodel.state_dict().items()}
    pth = tmp_path / "checkpoint_epoch_004.pth"
    torch.save({"epoch": 4, "model_state_dict": sd}, pth)

    params = load_pretrained_generator(str(pth), CHANNELS, refiner_depth=2)

    ours = PreEncoder(
        mel_channels=MEL, channels=CHANNELS, kernel_sizes=KERNELS,
        fsq_levels=(8, 5, 5, 5), dropout=0.0,
        refiner_base_channels=4, refiner_depth=2,
    )
    x = rng.standard_normal((2, 24, MEL)).astype(np.float32)
    lengths = np.array([24, 20], np.int32)
    with torch.no_grad():
        t_recon, t_post = tmodel(torch.from_numpy(x), torch.from_numpy(lengths))
    j_recon, j_post, _ = ours.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(lengths),
        deterministic=True,
    )
    for b, L in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(j_post)[b, :L], t_post.numpy()[b, :L],
            atol=5e-4, rtol=1e-3,
        )
