"""Root typed configuration tree.

Parity with the reference's RootCfg (src/config.py:18-105): dataset,
data_loader, model, optimizer, checkpointing, trainer, loss, test, train,
freeze, seed. Presets under config/presets mirror config/main.yaml and
config/experiment/* of the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Literal, Optional, Union

from ..dataset.types import DataLoaderCfg, DatasetCfg
from ..loss.losses import LossesCfg
from ..model.autoencoder.identity import AutoencoderIdCfg
from ..model.autoencoder.kl import AutoencoderKLCfg
from ..model.decoder.splatting import DecoderSplattingCfg
from ..model.discriminator.patch_gan import DiscriminatorPatchGanCfg
from ..model.encoder.encoder_epipolar import EncoderEpipolarCfg
from .loader import deep_merge, from_dict, load_yaml, parse_cli_value, set_dotted

PRESET_DIR = Path(__file__).parent / "presets"

AutoencoderCfg = Union[AutoencoderKLCfg, AutoencoderIdCfg]


@dataclass
class ModelCfg:
    autoencoder: AutoencoderCfg
    encoder: EncoderEpipolarCfg
    decoder: DecoderSplattingCfg
    discriminator: Optional[DiscriminatorPatchGanCfg] = None
    encode_latents: bool = False
    supersampling_factor: int = 1
    variational: Literal["none", "gaussians", "latents"] = "none"
    # Rematerialize the encoder and VAE-decode in the backward pass,
    # trading ~30% step time for the activation memory that blocks
    # 256px batch-2 training on a 16 GB chip.
    remat: bool = False
    # Which intermediates jax.checkpoint may keep when remat=true:
    # "nothing" recomputes everything (minimum memory); "dots" saves
    # matmul AND convolution outputs so the backward recomputes only the
    # cheap elementwise chains — much less recompute FLOP for a memory
    # increase that 128px shapes (and 256px batch 1) can afford. Per-site
    # form "vae:dots,lpips:dots" applies dots only to the named remat
    # sites (encoder | vae | lpips): the conv-heavy VAE/LPIPS keep their
    # outputs while the encoder (whose attention outputs OOM a 16 GB chip
    # under a global dots at 256px batch 2) stays full-recompute.
    remat_policy: str = "nothing"
    # bfloat16 compute for the heavy network submodules (encoder backbone,
    # VAE, LPIPS, discriminator): parameters stay f32 (master copies, Adam
    # state, updates), activations and matmuls ride bf16 — native MXU rate
    # and half the HBM activation traffic. bf16 shares f32's exponent
    # range, so no loss scaling is needed. The rasterizer, sampling, and
    # loss reductions stay f32. Besides the global "bfloat16", a per-site
    # comma-list ("vae:bfloat16,disc:bfloat16"; sites: encoder, vae, lpips,
    # disc) casts only the named submodules — the measured win on v5e: the
    # f8 VAE is the step's FLOP peak and saturates the f32 MXU, while a
    # global cast regressed (convert + remat-recompute overhead).
    compute_dtype: str = "float32"


@dataclass
class GeneratorOptimizerCfg:
    name: str = "Adam"
    lr: float = 1.5e-4
    scale_lr: bool = False
    autoencoder_lr: float = 9.0e-6
    scale_autoencoder_lr: bool = True
    autoencoder_betas: List[float] = field(default_factory=lambda: [0.5, 0.9])
    betas: List[float] = field(default_factory=lambda: [0.9, 0.999])
    warm_up_steps: int = 2000
    warm_up_start_factor: float = 5.0e-4
    gradient_clip_val: float = 0.5
    # Opt-in divergence guard (failure detection, SURVEY §5): skip BOTH
    # optimizer updates when |generator total| exceeds this factor times
    # its running EMA (transient-spike filter — NOTES.md round-4/5
    # ledgers). None = off (reference behavior).
    skip_loss_spike_factor: Optional[float] = None
    # After this many CONSECUTIVE skips the guard re-seeds its EMA at the
    # new loss magnitude and resumes updates (bounded skipping; the guard
    # can never freeze training permanently).
    skip_loss_spike_patience: int = 10


@dataclass
class DiscriminatorOptimizerCfg:
    name: str = "Adam"
    lr: float = 9.0e-6
    scale_lr: bool = True
    betas: List[float] = field(default_factory=lambda: [0.5, 0.9])
    gradient_clip_val: float = 0.5


@dataclass
class OptimizerCfg:
    generator: GeneratorOptimizerCfg = field(default_factory=GeneratorOptimizerCfg)
    discriminator: Optional[DiscriminatorOptimizerCfg] = None


@dataclass
class CheckpointingCfg:
    load: Optional[str] = None
    resume: bool = False
    every_n_train_steps: int = 2500
    save_top_k: int = -1


@dataclass
class TrainerCfg:
    max_steps: int = 200_001
    val_check_interval: int = 250
    log_every_n_steps: int = 50
    num_devices: Optional[int] = None  # bound the data-parallel mesh (None = all)


@dataclass
class TrainCfg:
    depth_mode: Optional[str] = None
    extended_visualization: bool = False
    step_offset: int = 0
    video_interpolation: bool = False
    video_wobble: bool = False


@dataclass
class TestCfg:
    output_path: str = "outputs/test"


@dataclass
class FreezeCfg:
    autoencoder: bool = False
    encoder: bool = False
    decoder: bool = False
    discriminator: bool = False


@dataclass
class WandbCfg:
    project: str = "latentsplat_tpu"
    entity: str = ""
    name: str = "run"
    mode: str = "disabled"
    activated: bool = False
    tags: List[str] = field(default_factory=list)


@dataclass
class RootCfg:
    mode: Literal["train", "val", "test"]
    dataset: DatasetCfg
    data_loader: DataLoaderCfg
    model: ModelCfg
    optimizer: OptimizerCfg
    checkpointing: CheckpointingCfg
    trainer: TrainerCfg
    loss: LossesCfg
    test: TestCfg
    train: TrainCfg
    freeze: FreezeCfg
    seed: int
    wandb: WandbCfg = field(default_factory=WandbCfg)
    output_dir: str = "outputs"


def load_config(
    experiment: Optional[str] = None,
    overrides: Optional[list[str]] = None,
    base: str = "main",
) -> RootCfg:
    """Load presets/<base>.yaml, overlay presets/experiment/<experiment>.yaml,
    apply `a.b.c=value` CLI overrides, and validate into RootCfg."""
    cfg = load_yaml(PRESET_DIR / f"{base}.yaml")
    if experiment is not None:
        cfg = deep_merge(cfg, load_yaml(PRESET_DIR / "experiment" / f"{experiment}.yaml"))
    for item in overrides or []:
        key, _, value = item.partition("=")
        set_dotted(cfg, key.strip(), parse_cli_value(value))
    return from_dict(RootCfg, cfg)
