"""Test bootstrap: run the suite on CPU with 8 simulated devices.

Forces the host platform and carves it into 8 virtual devices so
mesh/data-parallel paths (psum over a sharded batch) are exercised in CI
without TPU hardware — the TPU-native analog of a fake backend (see
SURVEY.md §4). The env var must be set BEFORE jax initializes a backend;
the config update then wins over any platform plugin that force-registered
itself at interpreter start (e.g. the axon tunnel's sitecustomize).
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
