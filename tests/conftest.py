"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip hardware is not available in CI; parallelism (DP shardings,
all-gather loss, sharded retrieval) is exercised on 8 virtual CPU devices —
the strategy SURVEY.md §4 prescribes for this rebuild.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep CPU compile times short in tests.
os.environ.setdefault("JAX_ENABLE_X64", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
