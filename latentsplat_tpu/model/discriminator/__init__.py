from .patch_gan import DiscriminatorPatchGan, DiscriminatorPatchGanCfg

DISCRIMINATORS = {"patch_gan": DiscriminatorPatchGan}

DiscriminatorCfg = DiscriminatorPatchGanCfg


def get_discriminator(cfg, d_in: int = 3):
    """Factory, parity with reference src/model/discriminator/__init__.py:11-15."""
    return DISCRIMINATORS[cfg.name](cfg=cfg, d_in=d_in)


__all__ = ["DiscriminatorPatchGan", "DiscriminatorPatchGanCfg", "get_discriminator"]
