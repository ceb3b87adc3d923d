import numpy as np
import jax.numpy as jnp
import pytest

from mqgan_tpu.core.buckets import BucketPolicy
from mqgan_tpu.core.config import SpecConfig, TrainConfig
from mqgan_tpu.core.masking import (
    apply_mask,
    downsample_mask_any,
    lengths_from_mask,
    sequence_mask,
)


def test_sequence_mask_matches_reference_semantics():
    # reference preencoder.py:15-24: True = padded
    lengths = jnp.array([3, 5, 0])
    m = sequence_mask(5, lengths)
    expected = np.array(
        [
            [False, False, False, True, True],
            [False, False, False, False, False],
            [True, True, True, True, True],
        ]
    )
    np.testing.assert_array_equal(np.asarray(m), expected)
    np.testing.assert_array_equal(np.asarray(lengths_from_mask(m)), [3, 5, 0])


def test_apply_mask_broadcast():
    x = jnp.ones((2, 4, 3))
    m = sequence_mask(4, jnp.array([2, 4]))
    y = apply_mask(x, m)
    assert float(y[0, 1].sum()) == 3.0
    assert float(y[0, 2].sum()) == 0.0
    assert float(y[1].sum()) == 12.0


def test_downsample_mask_ceil_mode():
    # 5 positions, 3 valid -> stride 2 ceil => 3 outputs; torch max_pool2d
    # ceil_mode=True on the 0/1 pad mask.
    m = jnp.array([[False, False, False, True, True]])
    out = downsample_mask_any(m, 2)
    np.testing.assert_array_equal(np.asarray(out), [[False, True, True]])
    # stride over all-valid stays valid
    m2 = jnp.zeros((1, 6), bool)
    np.testing.assert_array_equal(np.asarray(downsample_mask_any(m2, 2)), [[False] * 3])


def test_bucket_policy():
    p = BucketPolicy((128, 192, 256))
    assert p.bucket_for(1) == 128
    assert p.bucket_for(128) == 128
    assert p.bucket_for(129) == 192
    assert p.bucket_for(999) == 256  # clamped; caller chunks
    arrays = [np.ones((100, 4), np.float32), np.ones((130, 4), np.float32)]
    batch, lens, tb = p.pad_batch(arrays)
    assert batch.shape == (2, 192, 4) and tb == 192
    np.testing.assert_array_equal(lens, [100, 130])
    assert batch[0, 100:].sum() == 0


def test_config_loads_reference_yaml():
    cfg = TrainConfig.from_yaml("/root/reference/configs/model_config_hifispeech.yaml")
    assert cfg.model.mel_channels == 128
    assert cfg.model.generator.channels == (512, 512, 512, 768)
    assert cfg.model.generator.fsq_levels == (8, 5, 5, 5)
    assert cfg.model.generator.codebook_size == 1000
    assert cfg.model.generator.bos_token_id == 1001
    assert cfg.model.generator.eos_token_id == 1002
    assert cfg.crop_lens == (256, 192, 128)
    assert cfg.training.discriminator_train_start_epoch == 8
    assert cfg.training.loss_weights.Gloss_lambda == 15.0
    # effective recon weights (reference train.py:479-482)
    assert cfg.training.loss_weights.recon_lambda_pre == 1.0
    assert cfg.training.loss_weights.recon_lambda_post == 2.0
    assert cfg.model.discriminator_multibin.n_bins == 8

    music = TrainConfig.from_yaml("/root/reference/configs/model_config_hifimusic.yaml")
    assert music.model.mel_channels == 160
    assert music.crop_lens == (256,)
    assert music.model.generator.refiner_base_channels == 96


def test_spec_config_loads_reference_yaml():
    cfg = SpecConfig.from_yaml("/root/reference/configs/spec_config_hifispeech.yaml")
    cfg.validate()
    s = cfg.spectrogram
    assert (s.sampling_rate, s.filter_length, s.hop_length, s.win_length) == (
        44100, 2048, 512, 2048,
    )
    assert s.n_mel_channels == 128
    assert s.mel_fmax == 22050.0
    assert s.n_freqs == 1025

    music = SpecConfig.from_yaml("/root/reference/configs/spec_config_hifimusic.yaml")
    assert music.spectrogram.n_mel_channels == 160


def test_spec_config_validation_errors():
    cfg = SpecConfig.from_dict({"spectrogram": {"win_length": 4096}})
    with pytest.raises(ValueError):
        cfg.validate()


def test_pad_batch_warns_on_truncation():
    import warnings

    import pytest as _pytest

    from mqgan_tpu.core.buckets import BucketPolicy

    policy = BucketPolicy((64, 128))
    with _pytest.warns(UserWarning, match="TRUNCATED"):
        out, lengths, tb = policy.pad_batch([np.zeros((300, 4), np.float32)])
    assert tb == 128 and lengths[0] == 128
    # in-bucket input stays silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        policy.pad_batch([np.zeros((100, 4), np.float32)])


def test_config_warns_on_unknown_training_keys():
    """A typo like `epochs:` (the schema key is the reference's
    `num_epochs`, model_config_*.yaml:34) must warn, not silently train
    with the 1000-epoch default."""
    import warnings

    from mqgan_tpu.core.config import TrainConfig

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg = TrainConfig.from_dict({"training": {"epochs": 2}})
        assert cfg.training.num_epochs == 1000  # typo'd key ignored...
        assert any("epochs" in str(x.message) for x in w)  # ...but loudly

    # the shipped reference YAMLs stay warning-free
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        TrainConfig.from_yaml(
            "/root/reference/configs/model_config_hifispeech.yaml")
        assert not w, [str(x.message) for x in w]
