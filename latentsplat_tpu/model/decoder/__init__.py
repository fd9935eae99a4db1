from .splatting import DecoderSplatting, DecoderSplattingCfg, DecoderOutput

DECODERS = {"splatting_cuda": DecoderSplatting, "splatting": DecoderSplatting}

DecoderCfg = DecoderSplattingCfg


def get_decoder(cfg, background_color, variational=False):
    """Factory, parity with reference src/model/decoder/__init__.py."""
    return DECODERS[cfg.name](
        cfg=cfg, background_color=tuple(background_color), variational=variational
    )


__all__ = ["DecoderSplatting", "DecoderSplattingCfg", "DecoderOutput", "get_decoder"]
