"""Bucket-padding invariance: the same content padded to different bucket
lengths must produce identical tokens and reconstructions on the valid
frames. This is the property that makes static-shape bucketed serving
(core/buckets.py, deploy/runtime.py) semantically invisible."""

import numpy as np

import jax
import jax.numpy as jnp

from mqgan_tpu.core.masking import sequence_mask
from mqgan_tpu.models.preencoder import PreEncoder

MEL = 16
VALID = 20


def test_preencoder_padding_invariance(rng):
    gen = PreEncoder(
        mel_channels=MEL, channels=(8, 12), kernel_sizes=(3,),
        fsq_levels=(8, 5, 5, 5), dropout=0.0,
        refiner_base_channels=4, refiner_depth=2,
    )
    content = rng.standard_normal((1, VALID, MEL)).astype(np.float32)

    outs = {}
    params = None
    for bucket in (24, 32, 48):
        x = np.zeros((1, bucket, MEL), np.float32)
        x[:, :VALID] = content
        lengths = jnp.asarray([VALID], jnp.int32)
        pad = sequence_mask(bucket, lengths)
        if params is None:
            params = gen.init(jax.random.key(0), jnp.asarray(x), lengths)
        idx = gen.apply(params, jnp.asarray(x), pad, method=PreEncoder.encode)
        out = gen.apply(params, idx, pad, method=PreEncoder.decode)
        outs[bucket] = (np.asarray(idx)[0, :VALID], np.asarray(out)[0, :VALID])

    base_idx, base_out = outs[24]
    for bucket in (32, 48):
        idx, out = outs[bucket]
        np.testing.assert_array_equal(idx, base_idx,
                                      err_msg=f"tokens differ at bucket {bucket}")
        np.testing.assert_allclose(out, base_out, atol=1e-4,
                                   err_msg=f"recon differs at bucket {bucket}")


def test_forward_padding_invariance(rng):
    """Training forward (eval mode) also honors the mask across paddings."""
    gen = PreEncoder(
        mel_channels=MEL, channels=(8, 12), kernel_sizes=(3,),
        fsq_levels=(8, 5, 5, 5), dropout=0.0,
        refiner_base_channels=4, refiner_depth=2,
    )
    content = rng.standard_normal((1, VALID, MEL)).astype(np.float32)
    results = {}
    params = None
    for bucket in (24, 40):
        x = np.zeros((1, bucket, MEL), np.float32)
        x[:, :VALID] = content
        lengths = jnp.asarray([VALID], jnp.int32)
        if params is None:
            params = gen.init(jax.random.key(0), jnp.asarray(x), lengths)
        pre, post, idx = gen.apply(params, jnp.asarray(x), lengths,
                                   deterministic=True)
        results[bucket] = (np.asarray(pre)[0, :VALID],
                           np.asarray(post)[0, :VALID],
                           np.asarray(idx)[0, :VALID])
    np.testing.assert_allclose(results[24][0], results[40][0], atol=1e-4)
    np.testing.assert_allclose(results[24][1], results[40][1], atol=1e-4)
    np.testing.assert_array_equal(results[24][2], results[40][2])
