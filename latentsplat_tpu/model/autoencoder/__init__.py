from .base import Autoencoder
from .identity import AutoencoderId, AutoencoderIdCfg
from .kl import AutoencoderKL, AutoencoderKLCfg

AUTOENCODERS = {"kl": AutoencoderKL, "id": AutoencoderId}

AutoencoderCfg = None  # union of the cfg dataclasses; resolved by name


def get_autoencoder(cfg, d_in: int = 3, d_skip_extra: int = 0):
    """Factory, parity with reference src/model/autoencoder/__init__.py:14-20."""
    return AUTOENCODERS[cfg.name](cfg=cfg, d_in=d_in, d_skip_extra=d_skip_extra)


__all__ = [
    "Autoencoder",
    "AutoencoderId",
    "AutoencoderIdCfg",
    "AutoencoderKL",
    "AutoencoderKLCfg",
    "get_autoencoder",
]
