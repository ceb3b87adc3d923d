"""mqgan_tpu — TPU-native mel-spectrogram neural audio codec framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of ZDisket/MQGAN:
FSQ-quantized convolutional mel autoencoder with a UNet refiner head, trained
adversarially against patch + multi-bin discriminators, plus dataset tooling,
deployment export, batch re-encoding, a token LM, and an iSTFT vocoder
wrapper. Public surface mirrors the reference __init__.py:1-5.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy exports keep `import mqgan_tpu` light (no model code / flax import
    # unless needed).
    if name in ("PreEncoder",):
        from mqgan_tpu.models.preencoder import PreEncoder
        return PreEncoder
    if name == "MelSpectrogramPatchDiscriminator2D":
        from mqgan_tpu.models.discriminators import MelSpectrogramPatchDiscriminator2D
        return MelSpectrogramPatchDiscriminator2D
    if name == "MultiBinDiscriminator":
        from mqgan_tpu.models.discriminators import MultiBinDiscriminator
        return MultiBinDiscriminator
    if name == "LSGANLoss":
        from mqgan_tpu.losses.gan import LSGANLoss
        return LSGANLoss
    if name == "ISTFTNetFE":
        from mqgan_tpu.signal.vocoder import ISTFTNetFE
        return ISTFTNetFE
    if name == "TPUSTFT" or name == "TorchSTFT":
        from mqgan_tpu.signal.stft import TPUSTFT
        return TPUSTFT
    if name == "MusicLSTM":
        from mqgan_tpu.models.music_lstm import MusicLSTM
        return MusicLSTM
    if name == "MusicTransformer":
        from mqgan_tpu.models.token_transformer import MusicTransformer
        return MusicTransformer
    raise AttributeError(f"module 'mqgan_tpu' has no attribute {name!r}")
