"""The examples/ scripts stay runnable and self-verifying (each prints
PASS and exits 0) — the per-experiment-script idiom of the reference
sandbox (SURVEY.md §2.1), kept green as part of the suite."""

import os
import subprocess
import sys

import pytest

_EX = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")


@pytest.mark.parametrize("script", ["fx_observation.py",
                                    "beam_pointing.py",
                                    "spead_loopback.py",
                                    "udp_observation.py",
                                    "observe.py",
                                    "beams.py"])
def test_example_passes(script):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, os.path.join(_EX, script)],
                       capture_output=True, text=True, timeout=300,
                       env=env)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "PASS" in r.stdout
