"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip hardware is not available in CI; parallelism (DP shardings,
all-gather loss, sharded retrieval) is exercised on 8 virtual CPU devices —
the strategy SURVEY.md §4 prescribes for this rebuild.
"""

import os
import sys

# Hard override: the ambient environment pins JAX_PLATFORMS=axon (TPU) and a
# sitecustomize hook force-registers the axon plugin with
# jax_platforms="axon,cpu" in every interpreter. Tests must run on the
# virtual CPU mesh (TPU f32 matmuls are bf16-reduced, which would break
# parity tolerances), so override the already-applied config value too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep CPU compile times short in tests.
os.environ.setdefault("JAX_ENABLE_X64", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    "tests must run on CPU; got " + jax.default_backend()
)

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_programs():
    """Free accumulated XLA executables at module boundaries.

    The full suite compiles a few hundred XLA:CPU programs in one process.
    Past ~185 of them, the next large compile intermittently segfaults
    inside libgcc's DWARF CFI parser (JIT EH-frame registry walked while
    corrupt — executables are otherwise freed whenever Python GC happens
    to run, possibly on a non-main thread concurrent with a compile that
    is registering new frames). Dropping the jit caches and collecting on
    the main thread between modules keeps the registry small and makes
    deallocation happen only at controlled, compile-free points.
    """
    yield
    jax.clear_caches()
    gc.collect()
