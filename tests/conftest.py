"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment's sitecustomize registers a remote-TPU ("axon") backend and
forces jax_platforms to it, so setting JAX_PLATFORMS in the environment is
not enough — we must override the config after jax is importable but before
any backend is initialized.
"""

import os
import sys
from pathlib import Path

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
