from .types import (
    BatchedExample,
    BatchedViews,
    DataLoaderCfg,
    DataLoaderStageCfg,
    DatasetCfg,
    DatasetCfgCommon,
)


def get_dataset(cfg, stage, view_sampler):
    """Factory, parity with reference src/dataset/__init__.py:18-31."""
    from .re10k import DatasetRE10k
    from .synthetic import DatasetSynthetic

    datasets = {"re10k": DatasetRE10k, "synthetic": DatasetSynthetic}
    try:
        from .co3d import DatasetCO3D

        datasets["co3d"] = DatasetCO3D
    except ImportError:  # pragma: no cover
        pass
    return datasets[cfg.name](cfg, stage, view_sampler)


__all__ = [
    "BatchedExample",
    "BatchedViews",
    "DataLoaderCfg",
    "DataLoaderStageCfg",
    "DatasetCfg",
    "DatasetCfgCommon",
    "get_dataset",
]
