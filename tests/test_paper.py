"""Tests for the paper tooling (tables + figure generators)."""

import json
from pathlib import Path

import numpy as np

from latentsplat_tpu.misc.image_io import save_image
from latentsplat_tpu.paper.common import comparison_grid, plain_grid
from latentsplat_tpu.paper.table import make_latex_table
from latentsplat_tpu.paper import (
    generate_ablation_image_comparison,
    generate_benchmark_table,
    generate_comparison_table,
    generate_image_comparison,
    generate_teaser,
)


class TestLatexTable:
    def test_ranks_and_arrows(self):
        table = make_latex_table(
            {"Ours": [25.0, 0.12], "Baseline": [23.1, 0.15]},
            ["PSNR", "LPIPS"],
            [2, 3],
            [1, -1],
        )
        assert "\\textbf{25.00}" in table      # best PSNR bold
        assert "\\underline{23.10}" in table   # runner-up underlined
        assert "\\textbf{0.120}" in table      # lower LPIPS is better
        assert "PSNR $\\uparrow$" in table
        assert "LPIPS $\\downarrow$" in table
        assert table.splitlines()[1].startswith("\\begin{tabular}{lrr}")

    def test_missing_values(self):
        table = make_latex_table(
            {"A": [1.0, None], "B": [2.0, 3.0]},
            ["m1", "m2"], [1, 1], [1, -1],
        )
        assert "--" in table
        assert "\\textbf{3.0}" in table  # only present value ranks first

    def test_ties_share_rank(self):
        table = make_latex_table(
            {"A": [1.004], "B": [1.001]}, ["m"], [2], [1]
        )
        # Both round to 1.00 -> both bold.
        assert table.count("\\textbf{1.00}") == 2


class TestGrids:
    def test_comparison_grid_shapes(self):
        img = np.random.rand(32, 32, 3).astype(np.float32)
        rows = [[img, img, img, None], [None, img, img, img]]
        fig = comparison_grid(rows, ["GT", "Ours"], image_size=32, font_size=10)
        assert fig.ndim == 3 and fig.shape[-1] == 3
        assert fig.shape[1] > 2 * 32  # context col + 2 method cols

    def test_plain_grid(self):
        img = np.random.rand(16, 16, 3).astype(np.float32)
        fig = plain_grid([[img, None]], ["A", "B"], image_size=16, font_size=10)
        assert fig.shape[-1] == 3


def _make_method_dir(root: Path, name: str, scenes=("s1",)):
    d = root / name
    rng = np.random.default_rng(0)
    for scene in scenes:
        for kind in ("color", "context"):
            for idx in (3, 7, 12):
                save_image(
                    rng.random((16, 16, 3)).astype(np.float32),
                    d / scene / "3_7" / kind / f"{idx:0>6}.png",
                )
    return d


class TestGeneratorCLIs:
    def test_comparison_table_cli(self, tmp_path):
        metrics = {
            "psnr": {"ours": 25.0, "base": 24.0},
            "ssim": {"ours": 0.8, "base": 0.7},
            "lpips": {"ours": 0.1, "base": 0.2},
        }
        mp = tmp_path / "metrics.mean.json"
        mp.write_text(json.dumps(metrics))
        out = tmp_path / "table.tex"
        generate_comparison_table.main([
            f"metrics_path={mp}",
            "methods=[{name: Ours, key: ours}, {name: Base, key: base}]",
            f"output_path={out}",
        ])
        text = out.read_text()
        assert "\\textbf{25.00}" in text and "Ours" in text

    def test_benchmark_table_cli(self, tmp_path):
        d = tmp_path / "m"
        d.mkdir()
        (d / "benchmark.json").write_text(
            json.dumps({"encoder": [0.1, 0.2], "decoder": [0.05]})
        )
        (d / "peak_memory.json").write_text(json.dumps(8e9))
        out = tmp_path / "bench.tex"
        generate_benchmark_table.main([
            "methods=[{name: Ours, path: %s}]" % d,
            f"output_path={out}",
        ])
        text = out.read_text()
        assert "0.1500" in text and "8.00" in text and "--" in text

    def test_image_comparison_cli(self, tmp_path):
        d = _make_method_dir(tmp_path, "ours")
        out = tmp_path / "fig.png"
        generate_image_comparison.main([
            "methods=[{name: Ours, path: %s}]" % d,
            "rows=[{scene: s1, ctx_key: '3_7', index: 12}]",
            f"context_path={d}",
            f"output_path={out}",
            "image_size=16",
        ])
        assert out.exists()

    def test_ablation_cli(self, tmp_path):
        d = _make_method_dir(tmp_path, "ours")
        out = tmp_path / "ablation.png"
        generate_ablation_image_comparison.main([
            "methods=[{name: A, path: %s}, {name: B, path: %s}]" % (d, d),
            "rows=[{scene: s1, ctx_key: '3_7', index: 7}]",
            f"output_path={out}",
            "image_size=16",
        ])
        assert out.exists()

    def test_teaser_cli(self, tmp_path):
        d = _make_method_dir(tmp_path, "ours")
        out = tmp_path / "teaser.png"
        generate_teaser.main([
            f"method_path={d}",
            f"context_path={d}",
            "rows=[{scene: s1, ctx_key: '3_7', indices: [3, 7, 12]}]",
            f"output_path={out}",
            "image_size=16",
        ])
        assert out.exists()
