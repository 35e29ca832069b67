"""Test configuration: force an 8-device virtual CPU mesh.

Tests run on CPU (deterministic, no TPU needed); multi-chip sharding tests
use the 8 virtual host devices. Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin in this image ignores JAX_PLATFORMS; force via config.
jax.config.update("jax_platforms", "cpu")

# Persistent CPU compile cache: the suite's cost is dominated by
# compiling interpret-mode Pallas mega-graphs, which are identical
# across runs. Dedicated directory — the TPU bench cache at .jax_cache
# must not absorb CPU executables.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    The suite compiles hundreds of interpret-mode Pallas graphs; keeping
    them all live grew the process until XLA's compiler crashed
    (SIGSEGV/SIGABRT mid-compile ~2/3 through a full run).  Per-module
    eviction keeps peak memory flat at a small re-compile cost within
    parametrized modules.
    """
    yield
    jax.clear_caches()
