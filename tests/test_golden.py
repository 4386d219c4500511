"""Property tests of the float64 golden models themselves (SURVEY.md §4.2,
"Golden-vs-analytic" level): the oracle must be right before anything is
judged against it."""

import numpy as np
import pytest

from dc_sand_tpu import golden
from dc_sand_tpu.windows import pfb_window
from dc_sand_tpu.utils import snr_db

N_CHANS = 256
M = 2 * N_CHANS
TAPS = 8
FS = 1712e6


def _tone_spectra(freq_hz, n_spectra=4, kind="hann", amplitude=100.0,
                  phase=0.0):
    n = (n_spectra + TAPS - 1) * M
    x = golden.cw_tone(n, freq_hz, FS, amplitude=amplitude, phase=phase)
    w = pfb_window(TAPS, M, kind)
    fir = golden.pfb_fir(x, w, TAPS, M)
    return golden.channelize(fir, N_CHANS)


class TestPFB:
    def test_tone_lands_in_exact_channel(self):
        """CW tone at a channel centre puts (almost) all energy there."""
        k0 = 37
        spec = _tone_spectra(k0 * FS / M)
        power = np.abs(spec) ** 2
        total = power.sum(axis=-1)
        in_chan = power[:, k0]
        assert np.all(in_chan / total > 0.98)

    def test_tone_amplitude_scaling(self):
        """Window normalisation: bin amplitude = a/2 * M for an on-bin tone."""
        k0 = 64
        a = 50.0
        spec = _tone_spectra(k0 * FS / M, amplitude=a, kind="hann-sinc")
        # hann-sinc passband is flat to a few %, hann to ~1e-3.
        ratio = np.abs(spec[:, k0]) / (a / 2 * M)
        assert np.all(np.abs(ratio - 1.0) < 0.05)

    def test_offbin_tone_leakage_is_windowed(self):
        """Half-bin offset tone: hann window confines leakage to neighbours."""
        k0 = 100
        spec = _tone_spectra((k0 + 0.5) * FS / M)
        power = (np.abs(spec) ** 2).mean(axis=0)
        near = power[k0 - 1:k0 + 3].sum()
        assert near / power.sum() > 0.95

    def test_noise_response_flat(self):
        """White noise -> flat average PFB bandpass (excluding DC edge)."""
        x = golden.gaussian_noise((64 + TAPS - 1) * M, sigma=10.0, seed=1)
        w = pfb_window(TAPS, M, "hann-sinc")
        spec = golden.channelize(golden.pfb_fir(x, w, TAPS, M), N_CHANS)
        power = (np.abs(spec) ** 2).mean(axis=0)
        mid = power[4:-4]
        assert mid.max() / mid.min() < 3.0  # statistically flat

    def test_pfb_linearity(self):
        x1 = golden.gaussian_noise((3 + TAPS - 1) * M, seed=2)
        x2 = golden.gaussian_noise((3 + TAPS - 1) * M, seed=3)
        w = pfb_window(TAPS, M)
        a = golden.pfb_fir(x1 + x2, w, TAPS, M)
        b = golden.pfb_fir(x1, w, TAPS, M) + golden.pfb_fir(x2, w, TAPS, M)
        assert snr_db(a, b) > 250


class TestDelayPhase:
    def test_coarse_delay_shifts_samples(self):
        x = np.arange(100.0)[None, :]
        y = golden.apply_coarse_delay(x, np.array([3]), max_delay=10)
        assert y.shape == (1, 90)
        # delayed-by-3 stream at output index 0 reads input index 7
        assert y[0, 0] == 7.0

    def test_coarse_delay_zero_is_passthrough_tail(self):
        x = np.arange(50.0)
        y = golden.apply_coarse_delay(x, np.array(0), max_delay=5)
        np.testing.assert_array_equal(y, x[5:])

    def test_fine_delay_matches_true_shift(self):
        """A tone delayed by d samples == fine_delay_fringe with frac d.

        Validates the per-channel phase-ramp formula against an actual
        sub-sample shift of the input (the physics the F-engine corrects).
        """
        k0 = 90
        freq = k0 * FS / M  # on-bin so leakage doesn't confound
        d = 0.37
        n = (4 + TAPS - 1) * M
        t = np.arange(n) / FS
        x_ref = 80.0 * np.cos(2 * np.pi * freq * t)
        x_del = 80.0 * np.cos(2 * np.pi * freq * (t - d / FS))
        w = pfb_window(TAPS, M, "hann-sinc")
        s_ref = golden.channelize(golden.pfb_fir(x_ref, w, TAPS, M), N_CHANS)
        s_del = golden.channelize(golden.pfb_fir(x_del, w, TAPS, M), N_CHANS)
        # correcting the delayed stream with +d fine delay realigns it:
        # delay by d multiplies bin k by exp(-j 2pi k d / M); our correction
        # with frac_delay=-d applies exp(+j 2pi k d / M).
        s_fix = golden.fine_delay_fringe(s_del, np.array(-d), np.array(0.0))
        assert snr_db(s_ref[:, k0], s_fix[:, k0]) > 55

    def test_fringe_phase_rotates(self):
        s = np.ones((2, 8), dtype=np.complex128)
        out = golden.fine_delay_fringe(s, np.array(0.0), np.array(np.pi / 2))
        np.testing.assert_allclose(out, np.exp(-1j * np.pi / 2) * s, atol=1e-12)


class TestRequant:
    def test_exact_integers_roundtrip(self):
        s = (np.arange(-5, 6) + 1j * np.arange(5, -6, -1)).astype(np.complex128)
        q = golden.requantize(s, np.ones(11))
        np.testing.assert_array_equal(q, s)

    def test_saturation(self):
        s = np.array([300 + 0j, -300 - 300j])
        q = golden.requantize(s, np.array([1.0, 1.0]))
        assert q[0] == 127 + 0j
        assert q[1] == -127 - 127j

    def test_round_half_even(self):
        s = np.array([0.5 + 1.5j, 2.5 + 3.5j])
        q = golden.requantize(s, np.array([1.0, 1.0]))
        np.testing.assert_array_equal(q, np.array([0 + 2j, 2 + 4j]))

    def test_gaussian_noise_int8_bit_identical(self):
        """The slab-wise int8 generator (bounded-memory path used by the
        production-cadence verify) drains the SAME rng stream as the
        monolithic quantize_adc(gaussian_noise(...)) form."""
        shape = (3, 2, 1000)
        ref = golden.quantize_adc(golden.gaussian_noise(shape, 20.0, 5))
        got = golden.gaussian_noise_int8(shape, 20.0, 5)
        np.testing.assert_array_equal(got, ref)
        assert got.dtype == np.int8


class TestXcorr:
    def test_auto_is_real_power(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(3, 2, 5, 7)) + 1j * rng.normal(size=(3, 2, 5, 7))
        v = golden.xcorr(x)
        pairs = golden.baseline_pairs(3)
        for b, (i, j) in enumerate(pairs):
            if i == j:
                auto = v[b, 0, 0]  # pol product (0,0)
                np.testing.assert_allclose(auto.imag, 0.0, atol=1e-9)
                assert np.all(auto.real > 0)

    def test_cross_matches_manual(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 1, 4, 3)) + 1j * rng.normal(size=(2, 1, 4, 3))
        v = golden.xcorr(x)
        manual = (x[0, 0] * np.conj(x[1, 0])).sum(axis=0)
        np.testing.assert_allclose(v[1, 0, 0], manual, atol=1e-9)

    def test_baseline_count(self):
        assert len(golden.baseline_pairs(64)) == 2080  # BASELINE.json:5


class TestBeam:
    def test_unit_weights_sum_ants(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(4, 2, 3, 6)) + 1j * rng.normal(size=(4, 2, 3, 6))
        w = np.ones((1, 4, 6), dtype=np.complex128)
        y = golden.beamform(x, w)
        np.testing.assert_allclose(y[0], x.sum(axis=0), atol=1e-9)

    def test_steering_weights_cohere(self):
        """Weights conjugate to per-antenna phases recover N-fold gain."""
        n_ants, n_chans = 8, 16
        rng = np.random.default_rng(3)
        phases = rng.uniform(0, 2 * np.pi, size=(n_ants, n_chans))
        base = rng.normal(size=(1, 1, 10, n_chans)) + \
            1j * rng.normal(size=(1, 1, 10, n_chans))
        x = base * np.exp(1j * phases)[:, None, None, :]
        w = np.exp(-1j * phases)[None]  # (1, ant, chan)
        y = golden.beamform(x, w)
        np.testing.assert_allclose(y[0], n_ants * base[:, 0], atol=1e-9)

    def test_incoherent_sum(self):
        x = np.full((5, 1, 2, 3), 3 + 4j)
        np.testing.assert_allclose(golden.incoherent_sum(x),
                                   np.full((1, 2, 3), 125.0))


class TestFEngineComposition:
    def test_full_f_engine_stages_compose(self):
        cfgN, m, taps = 64, 128, 4
        w = pfb_window(taps, m)
        n = (3 + taps - 1) * m + 16
        x = golden.quantize_adc(golden.gaussian_noise((2, 2, n), sigma=20,
                                                      seed=4))
        delays = np.array([[0, 3], [7, 16]])
        out = golden.f_engine(
            x, w, taps, cfgN, coarse_delays=delays, max_delay=16,
            frac_delay=np.full((2, 2, 3), 0.25), phase=np.zeros((2, 2, 3)),
            gains=np.full(cfgN, 0.05))
        assert out.shape == (2, 2, 3, cfgN)
        assert out.real.max() <= 127 and out.real.min() >= -127


class TestWindowQuality:
    def test_hann_sinc_alias_suppression(self):
        """A tone 3+ channels away leaks < -60 dB through the hann-sinc
        prototype (the reason a PFB beats a plain FFT filterbank)."""
        k0 = 80
        spec = _tone_spectra((k0 + 0.5) * FS / M, kind="hann-sinc",
                             n_spectra=8)
        power = (np.abs(spec) ** 2).mean(axis=0)
        near = power[k0 - 1:k0 + 3].sum()
        far = power[k0 + 4:k0 + 40].max()
        assert 10 * np.log10(far / near) < -60

    def test_window_dc_normalisation(self):
        for kind in ("hann", "hann-sinc", "rect"):
            w = pfb_window(8, 64, kind)
            assert abs(w.sum() - 64) < 1e-9
