from .dba import RevDecoderParams, init_rev_decoder, rev_decoder_forward
from .discriminator import init_discriminator, discriminator_forward
from .safetensors_io import (
    load_decoder_checkpoint,
    save_decoder_checkpoint,
)

__all__ = [
    "RevDecoderParams",
    "init_rev_decoder",
    "rev_decoder_forward",
    "init_discriminator",
    "discriminator_forward",
    "load_decoder_checkpoint",
    "save_decoder_checkpoint",
]
