from foley_tpu.models import (
    ast,
    clap,
    dac_codec,
    dac_discriminator,
    dac_losses,
    dac_vae,
    lora,
    mmdit,
    quantize,
    siglip2,
    sync_scorer,
    synchformer,
)

__all__ = [
    "ast",
    "clap",
    "dac_codec",
    "dac_discriminator",
    "dac_losses",
    "dac_vae",
    "lora",
    "mmdit",
    "quantize",
    "siglip2",
    "sync_scorer",
    "synchformer",
]
