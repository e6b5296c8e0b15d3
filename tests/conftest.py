"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

This simulates a v5e-8 style mesh on CPU (SURVEY.md §4: multi-device tests
via xla_force_host_platform_device_count) so sharding paths are exercised in
CI without TPU hardware.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# the axon site package forces JAX_PLATFORMS=axon; override programmatically
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_config():
    from genmmrec_tpu.config import Config

    return Config("BPR", "tiny", {"epochs": 2, "save_recommended_topk": False})


@pytest.fixture(scope="session")
def tiny_splits():
    from genmmrec_tpu.config import Config
    from genmmrec_tpu.data.dataset import RecDataset

    config = Config("BPR", "tiny", {"save_recommended_topk": False})
    ds = RecDataset(config)
    train, valid, test = ds.split()
    return config, ds, train, valid, test
