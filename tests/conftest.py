"""Test environment: CPU backend with 8 virtual devices.

The sharded-semantics tests (SURVEY.md §4.2) run the multi-chip code paths
on a simulated mesh — the TPU-world equivalent of the reference's missing
multi-node rig.  Must run before any jax import, hence conftest.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
