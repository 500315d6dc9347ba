"""Test env: force CPU JAX with a virtual 8-device mesh.

Tests never need the real TPU (SURVEY.md §4.5): the TPU is a deployment detail
under jit. The 8 virtual host devices let the multi-chip batch-DP sharding
path compile and execute in CI (SURVEY.md §4.6). Must run before jax imports.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # env presets axon (TPU); tests force CPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize imports jax at interpreter startup, which latches
# JAX_PLATFORMS=axon before this file runs — override through the config
# (backends are not initialized until first use, so this still lands).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODELS = os.path.join(REPO, "models")


@pytest.fixture(scope="session")
def models_dir():
    return MODELS


@pytest.fixture(scope="session")
def cfg_paths():
    return {
        name: os.path.join(MODELS, f"{name}.cfg")
        for name in ("yolov3", "yolov3-tiny", "yolov3-spp")
    }


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
