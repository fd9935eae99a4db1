"""Export Gaussians to an Inria/Polycam-viewer-compatible binary .ply.

Parity with reference src/model/ply_export.py:12-92: recenter at the median
Gaussian, rescale so most Gaussians fit [-1, 1], rotate into a +Z-up view
composed with the camera rotation and the viewer's 45-degree default, write
DC-band colors + log scales + wxyz quaternions. The reference depends on
the `plyfile` package; the binary_little_endian PLY container is ~20 lines,
so it is written directly here.
"""

from __future__ import annotations

from pathlib import Path
from typing import List

import numpy as np
from scipy.spatial.transform import Rotation as R


def construct_list_of_attributes(num_rest: int) -> List[str]:
    attributes = ["x", "y", "z", "nx", "ny", "nz"]
    for i in range(3):
        attributes.append(f"f_dc_{i}")
    for i in range(num_rest):
        attributes.append(f"f_rest_{i}")
    attributes.append("opacity")
    for i in range(3):
        attributes.append(f"scale_{i}")
    for i in range(4):
        attributes.append(f"rot_{i}")
    return attributes


def _write_binary_ply(path: Path, names: List[str], data: np.ndarray) -> None:
    """data: (n, len(names)) float32 -> binary_little_endian PLY."""
    n = data.shape[0]
    header_lines = (
        ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
        + [f"property float {name}" for name in names]
        + ["end_header"]
    )
    path.parent.mkdir(exist_ok=True, parents=True)
    with open(path, "wb") as f:
        f.write(("\n".join(header_lines) + "\n").encode("ascii"))
        f.write(np.ascontiguousarray(data, dtype="<f4").tobytes())


def load_ply(path: Path) -> dict:
    """Read back a PLY written by export_ply -> {name: (n,) float32}."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        names = [l.split()[-1] for l in header if l.startswith("property float")]
        n = int(next(l for l in header if l.startswith("element vertex")).split()[-1])
        data = np.frombuffer(f.read(n * len(names) * 4), dtype="<f4")
    data = data.reshape(n, len(names))
    return {name: data[:, i] for i, name in enumerate(names)}


def export_ply(
    extrinsics: np.ndarray,   # (4, 4) c2w of a reference camera
    means: np.ndarray,        # (g, 3)
    scales: np.ndarray,       # (g, 3)
    rotations: np.ndarray,    # (g, 4) xyzw quaternions
    harmonics: np.ndarray,    # (g, 3, d_sh) color SH
    opacities: np.ndarray,    # (g,)
    path: Path,
) -> None:
    means = np.asarray(means, np.float32)
    scales = np.asarray(scales, np.float32)
    rotations = np.asarray(rotations, np.float32)
    harmonics = np.asarray(harmonics, np.float32)
    opacities = np.asarray(opacities, np.float32)
    extrinsics = np.asarray(extrinsics, np.float32)

    # Shift the scene so that the median Gaussian is at the origin, rescale
    # so most Gaussians are within [-1, 1].
    means = means - np.median(means, axis=0)
    scale_factor = np.quantile(np.abs(means), 0.95, axis=0).max()
    scale_factor = max(scale_factor, 1e-12)
    means = means / scale_factor
    scales = scales / scale_factor

    # +Z up, the viewer's default 45-degree yaw, and the w2c rotation.
    rotation = np.asarray([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32)
    adjustment = R.from_rotvec([0, 0, -45], degrees=True).as_matrix().astype(np.float32)
    rotation = adjustment @ rotation
    rotation = rotation @ np.linalg.inv(extrinsics[:3, :3])

    means = means @ rotation.T

    rot_mats = R.from_quat(rotations).as_matrix()
    rot_mats = rotation[None] @ rot_mats
    quats_xyzw = R.from_matrix(rot_mats).as_quat()
    x, y, z, w = quats_xyzw.T
    quats_wxyz = np.stack([w, x, y, z], axis=-1).astype(np.float32)

    # Only the view-invariant DC band survives the axis swizzle.
    harmonics_dc = harmonics[..., 0]

    data = np.concatenate(
        [
            means,
            np.zeros_like(means),
            harmonics_dc,
            opacities[:, None],
            np.log(np.maximum(scales, 1e-12)),
            quats_wxyz,
        ],
        axis=1,
    ).astype(np.float32)
    _write_binary_ply(Path(path), construct_list_of_attributes(0), data)
