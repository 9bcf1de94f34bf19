"""Test config: run everything on a virtual 8-device CPU mesh.

This environment's axon site hook (PYTHONPATH sitecustomize) registers the
TPU backend at interpreter start and sets jax_platforms="axon,cpu",
overriding JAX_PLATFORMS env — so tests must force CPU via
jax.config.update AFTER import. CPU devices are virtualized to 8 so
DP/psum/allgather paths actually execute multi-device (SURVEY.md §4 test
plan), which is strictly stronger than the reference's world_size==1 no-op
collectives (ref yolox/utils/dist.py:72-79).
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
