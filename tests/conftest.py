"""Test configuration: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding tests run without TPU hardware, and pin float32 matmul
precision for golden-value parity with the float32 PyTorch reference."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # env pins axon (TPU); tests must use CPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon sitecustomize pins jax_platforms to "axon,cpu" regardless of the
# env var; override through the config API so tests really run on CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running proof tests (deselect with -m 'not slow')")
