"""CLI entry point.

Parity with the reference's Hydra main (src/main.py:37-156):

    python -m latentsplat_tpu.main +experiment=re10k mode=train
    python -m latentsplat_tpu.main +experiment=re10k mode=test \\
        checkpointing.load=outputs/checkpoints/step_00200000

Arguments are `key=value` overrides onto config/presets/main.yaml;
`+experiment=<name>` overlays config/presets/experiment/<name>.yaml
(the reference's `+experiment=` surface). Output dir gets a `latest-run`
symlink like src/main.py:49-54.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

from .config import load_config


def parse_args(argv):
    experiment = None
    overrides = []
    for arg in argv:
        if arg.startswith("+experiment="):
            experiment = arg.split("=", 1)[1]
        elif "=" in arg:
            overrides.append(arg)
        else:
            raise SystemExit(f"unrecognized argument {arg!r} (use key=value)")
    return experiment, overrides


def main(argv=None) -> None:
    experiment, overrides = parse_args(argv if argv is not None else sys.argv[1:])
    cfg = load_config(experiment, overrides)

    run_name = f"{time.strftime('%Y-%m-%d_%H-%M-%S')}"
    if experiment:
        run_name = f"{experiment}_{run_name}"
    output_dir = Path(cfg.output_dir) / run_name
    output_dir.mkdir(exist_ok=True, parents=True)
    latest = Path(cfg.output_dir) / "latest-run"
    try:
        if latest.is_symlink() or latest.exists():
            latest.unlink()
        latest.symlink_to(run_name)
    except OSError:
        pass
    print(f"outputs -> {output_dir}")

    from .training.trainer import Trainer

    trainer = Trainer(cfg, output_dir)

    if cfg.mode == "train":
        state = trainer.fit()
        trainer.test(state)
    elif cfg.mode == "val":
        from .training.checkpointing import load_checkpoint

        assert cfg.checkpointing.load is not None, "val mode needs checkpointing.load"
        restored = load_checkpoint(Path(cfg.checkpointing.load))
        trainer.validate_params(restored["params_gen"])
    elif cfg.mode == "test":
        assert cfg.checkpointing.load is not None, "test mode needs checkpointing.load"
        from .training.checkpointing import load_checkpoint

        restored = load_checkpoint(Path(cfg.checkpointing.load))
        trainer.test(restored["params_gen"], name=cfg.wandb.name)
    else:
        raise SystemExit(f"unknown mode {cfg.mode!r}")


if __name__ == "__main__":
    main()
