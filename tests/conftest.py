"""Test environment: 8 virtual CPU devices so sharding tests run anywhere."""

import os

# Tests always run on virtual CPU devices (the real chip is for bench.py).
# The environment's sitecustomize force-registers the TPU backend and sets
# jax_platforms itself, so override through jax.config, not the env var.
os.environ["JAX_PLATFORMS"] = os.environ.get("LEGO_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import numpy as np
import pytest


@pytest.fixture(scope="session")
def vlp16_cfg():
    from lego_loam_tpu.config import vlp16

    return vlp16()


@pytest.fixture(scope="session")
def simple_scan(vlp16_cfg):
    """One noiseless synthetic scan from the origin."""
    from lego_loam_tpu.io.synthetic import render_scan

    R = np.eye(3)
    t = np.zeros(3)
    return render_scan(R, t, vlp16_cfg)
