"""Per-knob PSNR attribution of the fast rasterizer mode (VERDICT r3 #2).

Renders the headline bench scene under each diagnostic hybrid precision
(exact + exactly ONE fast-mode knob; see
latentsplat_tpu/ops/rasterize/tiled.py::DIAGNOSTIC_PRECISIONS) and reports
PSNR vs the exact render — attributing fast mode's aggregate quality gap
to its individual quantizations so the worst offender can be lifted.

Writes benchmarks/precision_knobs_psnr.json.

Usage: python bench_precision_knobs.py [--views 8] [--modes a,b,c]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from bench import H, W, PAIR_BUDGET_FACTOR, make_scene

MODES = (
    "fast",
    "fast_nocoef",
    "exact_wide_cull",
    "exact_tie_depth",
    "exact_bf16_mm",
    "exact_q12_channels",
    "exact_f16_xy",
    "exact_bf16_conic",
    "exact_depth_val",
    "exact_bf16_sh",
)


def main() -> None:
    def arg(name, default, cast):
        return cast(sys.argv[sys.argv.index(name) + 1]) if name in sys.argv else default

    n_views = arg("--views", 8, int)
    modes = arg("--modes", ",".join(MODES), str).split(",")

    from latentsplat_tpu.ops.rasterize import render

    scene = make_scene(jax.random.PRNGKey(0))
    # Subset the views: compile cost is per-mode; a handful of views is
    # plenty for PSNR statistics.
    for k in ("extrinsics", "intrinsics", "near", "far"):
        scene[k] = scene[k][:, :n_views]

    def colors(scene, precision):
        out = render(
            image_shape=(H, W),
            pair_budget_factor=PAIR_BUDGET_FACTOR,
            precision=precision,
            **scene,
        )
        return out.color, out.feature, out.depth, out.mask

    jitted = jax.jit(colors, static_argnums=1)

    def fetch(precision):
        t0 = time.perf_counter()
        c, f, d, m = jitted(scene, precision)
        c = np.clip(np.asarray(c, np.float32), 0, 1)
        f = np.asarray(f, np.float32)
        d = np.asarray(d, np.float32)
        m = np.asarray(m, np.float32)
        print(
            f"[{precision}] rendered {n_views} views in "
            f"{time.perf_counter() - t0:.1f}s (incl. compile)",
            file=sys.stderr,
        )
        return c, f, d, m

    c_ref, f_ref, d_ref, m_ref = fetch("exact")
    # Depth-error support: expected depth is alpha-weighted, so on
    # near-empty pixels (accumulated alpha ~ 0) both operands are ~0 and
    # the RELATIVE error is numerically meaningless (the r04 artifact's
    # unexplained 3.6e4 outlier). Restrict the depth stats to pixels the
    # exact render actually covers.
    ALPHA_FLOOR = 0.1
    covered = m_ref >= ALPHA_FLOOR
    coverage = float(np.mean(covered))

    def psnr(a, b):
        mse = float(np.mean((a - b) ** 2))
        return round(float(-10.0 * np.log10(max(mse, 1e-12))), 2)

    results = {}
    for mode in modes:
        c, f, d, _ = fetch(mode)
        rel = (np.abs(d - d_ref) / np.maximum(np.abs(d_ref), 1e-6))[covered]
        results[mode] = {
            "color_psnr_db": psnr(c, c_ref),
            "feature_psnr_db": psnr(f, f_ref),
            "color_max_abs_diff": round(float(np.max(np.abs(c - c_ref))), 6),
            # over covered (exact alpha >= ALPHA_FLOOR) pixels only
            "depth_rel_err": round(float(np.median(rel)), 6),
            # the max bounds the depth-code quantization
            "depth_rel_err_max": round(float(np.max(rel)), 6),
        }
        print(f"[{mode}] {results[mode]}", file=sys.stderr)

    dev = jax.devices()[0]
    out = {
        "metric": "precision_knob_psnr_vs_exact",
        "device": f"{dev.platform}:{dev.device_kind}",
        "views": n_views,
        "scene": "bench.make_scene (393k gaussians, 256px)",
        "measured_unix": int(time.time()),
        "depth_alpha_floor": ALPHA_FLOOR,
        "depth_coverage_fraction": round(coverage, 4),
        "knobs": results,
        "note": "each exact_* hybrid enables exactly one fast-mode knob on "
        "the exact path; 'fast' is all knobs at once (the headline mode)",
    }
    path = Path(__file__).resolve().parent / "benchmarks" / "precision_knobs_psnr.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}", file=sys.stderr)
    print(json.dumps({
        "metric": "precision_knob_psnr",
        "value": results.get("fast", {}).get("color_psnr_db", 0.0),
        "unit": "dB(fast vs exact)",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
