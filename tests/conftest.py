"""Test environment: CPU backend with 8 virtual devices.

The sharded-semantics tests (SURVEY.md §4.2) run the multi-chip code paths
on a simulated mesh — the TPU-world equivalent of the reference's missing
multi-node rig.

Note: this dev box presets ``JAX_PLATFORMS=axon`` (tunnelled TPU) and the
axon plugin's ``register()`` force-sets ``jax_platforms="axon,cpu"`` at
interpreter start, so the env var alone cannot restrict platforms. Pin
BOTH ``jax_platforms`` (so backend init never dials the tunnel — a dead
tunnel otherwise hangs every test) and ``jax_default_device`` (which
``ops._dispatch`` / ``parallel.mesh`` honour for placement).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_device", "cpu")


