"""Test configuration: run everything on a virtual 8-device CPU platform so
sharding paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

# The session environment pins JAX_PLATFORMS=axon (remote TPU tunnel); tests
# must run locally on a virtual multi-device CPU platform, so override hard.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# sitecustomize (axon TPU tunnel) imports jax at interpreter start, locking
# jax_platforms to "axon" before this conftest runs — override via config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", "tests must run on local CPU devices"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for sharding tests"


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """The full 200+-test suite segfaults inside XLA:CPU's compiler near the
    end of a single-process run (deterministically at whatever test compiles
    next once enough executables have accumulated — any half of the suite
    passes).  Dropping the in-process executable cache between modules keeps
    the process footprint bounded; cross-module recompiles are cheap on CPU.
    """
    yield
    import jax
    jax.clear_caches()
