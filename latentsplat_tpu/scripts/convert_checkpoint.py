"""Convert a released latentSplat Lightning checkpoint to an orbax
checkpoint loadable via `checkpointing.load`.

The reference ships trained `.ckpt` files (README.md:47-51) whose
state_dict keys follow the ModelWrapper attribute paths (encoder.*,
autoencoder.*, discriminator.*). This CLI maps them onto this framework's
parameter trees (training/pretrained.py converters) and saves
{"params_gen": ..., "params_disc": ...}, which `load_generator_weights`
and val/test mode consume directly:

    python -m latentsplat_tpu.scripts.convert_checkpoint \
        re10k.ckpt checkpoints/re10k_converted
    python -m latentsplat_tpu.main +experiment=re10k mode=test \
        checkpointing.load=checkpoints/re10k_converted
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("ckpt", type=Path, help="released .ckpt file")
    parser.add_argument("out", type=Path, help="output orbax directory")
    parser.add_argument(
        "--num-heads", type=int, default=12,
        help="attention heads of the encoder's ViT backbone (12 for the "
        "shipped dino_vitb8 configs)",
    )
    args = parser.parse_args(argv)

    from ..training.pretrained import (
        convert_latentsplat_checkpoint,
        load_torch_state_dict,
    )

    sd = load_torch_state_dict(args.ckpt)
    print(f"loaded {len(sd)} tensors from {args.ckpt}")
    converted = convert_latentsplat_checkpoint(sd, num_heads=args.num_heads)

    state = {"params_gen": converted["generator"]}
    if "discriminator" in converted:
        state["params_disc"] = converted["discriminator"]

    import orbax.checkpoint as ocp

    checkpointer = ocp.PyTreeCheckpointer()
    checkpointer.save(args.out.absolute(), state, force=True)
    sections = ", ".join(
        f"{k}:{len(v)} modules" for k, v in converted.items()
    )
    print(f"saved {args.out} ({sections})")


if __name__ == "__main__":
    main()
