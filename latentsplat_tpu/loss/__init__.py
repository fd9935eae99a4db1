from .losses import (
    LossCfg,
    LossDiscriminatorCfg,
    LossGroup,
    LossGroupCfg,
    LossesCfg,
    get_loss_group,
)

__all__ = [
    "LossCfg",
    "LossDiscriminatorCfg",
    "LossGroup",
    "LossGroupCfg",
    "LossesCfg",
    "get_loss_group",
]
