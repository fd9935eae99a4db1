from .encoder_epipolar import EncoderEpipolar, EncoderEpipolarCfg, OpacityMappingCfg

ENCODERS = {"epipolar": EncoderEpipolar}

EncoderCfg = EncoderEpipolarCfg


def get_encoder(cfg, d_in, n_feature_channels, scale_factor, variational):
    """Factory, parity with reference src/model/encoder/__init__.py:16-33."""
    cls = ENCODERS[cfg.name]
    return cls(
        cfg=cfg,
        d_in=d_in,
        n_feature_channels=n_feature_channels,
        scale_factor=scale_factor,
        variational=variational,
    )


__all__ = [
    "EncoderEpipolar",
    "EncoderEpipolarCfg",
    "OpacityMappingCfg",
    "get_encoder",
    "ENCODERS",
]
