"""The verification driver itself (C16): every preset passes at reduced
scale on CPU, including config 4's sharded mode over the virtual mesh —
the same entry the CLI and the judge use."""

import numpy as np
import pytest

from dc_sand_tpu.verify import verify_config, SNR_BOUND
from dc_sand_tpu.parallel import build_mesh


@pytest.mark.parametrize("name", ["pfb1k", "pfb4k", "fx4"])
def test_configs_pass_scaled(name):
    snrs, _ = verify_config(name, scale=128, impl="jnp")
    assert snrs and all(v > SNR_BOUND for v in snrs.values()), snrs


def test_fx64_sharded_mesh_passes():
    mesh = build_mesh(n_devices=4)
    snrs, _ = verify_config("fx64", scale=128, mesh=mesh, impl="jnp")
    assert snrs["visibilities"] > SNR_BOUND


def test_beam64_passes_scaled():
    snrs, _ = verify_config("beam64", scale=128, impl="jnp")
    assert snrs["beams"] > SNR_BOUND
    assert snrs["incoherent"] > SNR_BOUND


def test_misaligned_cadence_rejected():
    """The golden oracle slices exact integration windows while the
    runner dumps at chunk boundaries — a misaligned cadence must raise,
    not report a silently wrong SNR."""
    with pytest.raises(ValueError, match="multiple of spectra_per_chunk"):
        verify_config("fx4", scale=128, impl="jnp",
                      spectra_per_chunk=3, n_spectra_per_acc=None)
