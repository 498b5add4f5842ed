"""Test configuration.

* Forces JAX onto a virtual 8-device CPU mesh (standard trick for testing
  pjit/sharding paths without hardware -- must run before jax initialises).
* Puts the read-only reference repo (/root/reference) and a minimal timm shim
  on sys.path so parity tests can oracle against the PyTorch reference with
  random weights.
"""

import os
import sys

# Force CPU: the suite exercises numerics parity (fp32 matmuls on TPU use
# reduced-precision passes) and virtual 8-device sharding.  Override with
# PERCEIVER_TEST_PLATFORM=tpu to run hardware smoke tests.  A TPU plugin
# loaded via sitecustomize may override the JAX_PLATFORMS env var during
# interpreter startup (before this conftest runs), so set the config
# directly as well -- backends initialise lazily, so this still wins.
_platform = os.environ.get("PERCEIVER_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

_HERE = os.path.dirname(__file__)
sys.path.insert(0, os.path.join(_HERE, "_refshim"))

_REFERENCE = "/root/reference"
if os.path.isdir(_REFERENCE) and _REFERENCE not in sys.path:
    sys.path.insert(0, _REFERENCE)

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

import pytest  # noqa: E402


def _reference_available() -> bool:
    try:
        import torch  # noqa: F401
        import perceiver_io  # noqa: F401

        return True
    except Exception:
        return False


requires_reference = pytest.mark.skipif(
    not _reference_available(),
    reason="PyTorch reference repo not importable",
)
