"""Kernel-unit level (SURVEY.md §4.2): every TPU op vs its float64 golden
model at >50 dB SNR, on the CPU backend; Pallas kernels additionally in
interpreter mode."""

import numpy as np
import pytest
import jax.numpy as jnp

from dc_sand_tpu import golden, ops
from dc_sand_tpu.models import f_engine as jx_f_engine
from dc_sand_tpu.models.fengine import coarse_delay
from dc_sand_tpu.windows import pfb_window
from dc_sand_tpu.utils import snr_db, np_c2ri, np_ri2c

SNR_BOUND = 50.0  # BASELINE.json:5

N_CHANS = 128
M = 2 * N_CHANS
TAPS = 4


def _noise_int8(shape, seed=0, sigma=20.0):
    return golden.quantize_adc(golden.gaussian_noise(shape, sigma, seed))


class TestPFBFir:
    @pytest.mark.parametrize("impl", ["jnp", "pallas_interpret"])
    def test_matches_golden(self, impl):
        # interpret mode is slow: use the smallest tileable shape (M=128,
        # B=2 tiles of 16) that still exercises history carry + both slots.
        m = M if impl == "jnp" else 128
        x = _noise_int8((2, (32 + TAPS - 1) * m), seed=1)
        w = pfb_window(TAPS, m)
        ref = golden.pfb_fir(x, w, TAPS, m)
        out = ops.pfb_fir(jnp.asarray(x), w, TAPS, m, impl=impl)
        assert out.shape == ref.shape
        assert snr_db(ref, np.asarray(out)) > 120  # int8-exact in fp32

    def test_pallas_interpret_16taps(self):
        """Contract tap count: TB must exceed history=15."""
        taps, m = 16, 128
        x = _noise_int8((1, (16 + taps - 1) * m), seed=2)
        w = pfb_window(taps, m)
        ref = golden.pfb_fir(x, w, taps, m)
        out = ops.pfb_fir(jnp.asarray(x), w, taps, m,
                          impl="pallas_interpret")
        assert snr_db(ref, np.asarray(out)) > 120

    def test_pallas_fallback_odd_blocks(self):
        """Non-tileable B falls back to jnp silently and stays correct."""
        x = _noise_int8((1, (7 + TAPS - 1) * M), seed=3)
        w = pfb_window(TAPS, M)
        ref = golden.pfb_fir(x, w, TAPS, M)
        out = ops.pfb_fir(jnp.asarray(x), w, TAPS, M, impl="pallas_interpret")
        assert snr_db(ref, np.asarray(out)) > 120

    def test_float_input(self):
        x = golden.gaussian_noise((8 + TAPS - 1) * M, seed=4).astype(np.float32)
        w = pfb_window(TAPS, M)
        ref = golden.pfb_fir(x, w, TAPS, M)
        out = ops.pfb_fir(jnp.asarray(x), w, TAPS, M, impl="jnp")
        assert snr_db(ref, np.asarray(out)) > 120


class TestChannelize:
    def test_matches_golden(self):
        x = _noise_int8((4 + TAPS - 1) * M, seed=5)
        w = pfb_window(TAPS, M)
        fir = golden.pfb_fir(x, w, TAPS, M)
        ref = golden.channelize(fir, N_CHANS)
        out = ops.channelize(jnp.asarray(fir, jnp.float32), N_CHANS)
        assert snr_db(ref, np.asarray(out)) > 100

    @pytest.mark.parametrize("n_chans", [64, 1024])
    def test_mxu_matmul_fft_matches_rfft(self, n_chans):
        """The MXU matmul-formulated rfft (ops/fft_mxu.py, benched via
        `cli bench fft`) matches numpy float64 rfft in natural bin
        order at contract precision."""
        from dc_sand_tpu.ops.fft_mxu import channelize_mxu
        rng = np.random.default_rng(9)
        x = rng.normal(size=(3, 4, 2 * n_chans)).astype(np.float32) * 30
        ref = np.fft.rfft(x.astype(np.float64))[..., :n_chans]
        out = np.asarray(channelize_mxu(jnp.asarray(x), n_chans))
        assert out.shape == ref.shape
        assert snr_db(ref, out) > 100

    def test_mxu_fft_rejects_bad_length(self):
        from dc_sand_tpu.ops.fft_mxu import channelize_mxu
        with pytest.raises(ValueError, match="FFT length"):
            channelize_mxu(jnp.zeros((2, 100), jnp.float32), 64)


class TestPhase:
    def test_matches_golden(self):
        rng = np.random.default_rng(6)
        s = (rng.normal(size=(2, 5, N_CHANS)) +
             1j * rng.normal(size=(2, 5, N_CHANS)))
        fd = rng.uniform(-0.5, 0.5, size=(2, 5))
        ph = rng.uniform(-np.pi, np.pi, size=(2, 5))
        ref = golden.fine_delay_fringe(s, fd, ph)
        out = ops.fine_delay_fringe(jnp.asarray(s, jnp.complex64),
                                    jnp.asarray(fd), jnp.asarray(ph))
        assert snr_db(ref, np.asarray(out)) > 100


class TestRequant:
    def test_matches_golden(self):
        rng = np.random.default_rng(7)
        s = 60 * (rng.normal(size=(3, 4, N_CHANS)) +
                  1j * rng.normal(size=(3, 4, N_CHANS)))
        g = rng.uniform(0.5, 2.0, size=N_CHANS) * np.exp(
            1j * rng.uniform(-np.pi, np.pi, size=N_CHANS))
        ref = golden.requantize(s, g)
        q = ops.requantize(jnp.asarray(s, jnp.complex64),
                           jnp.asarray(g, jnp.complex64))
        assert q.dtype == jnp.int8
        out = np.asarray(ops.dequantize(q))
        # rounding boundaries may differ by 1 LSB in fp32 vs fp64 on a
        # measure-zero set; require SNR not bit-exactness
        assert snr_db(ref, out) > 55

    def test_dequant_roundtrip(self):
        q = jnp.asarray(np.array([[3, -4], [127, -127]], np.int8))
        np.testing.assert_array_equal(np.asarray(ops.dequantize(q)),
                                      [3 - 4j, 127 - 127j])


class TestCoarseDelay:
    def test_matches_golden(self):
        x = _noise_int8((2, 2, 200), seed=8)
        d = np.array([[0, 5], [11, 16]])
        ref = golden.apply_coarse_delay(x, d, 16)
        out = coarse_delay(jnp.asarray(x), jnp.asarray(d), 16)
        np.testing.assert_array_equal(ref, np.asarray(out))


class TestXcorr:
    def test_matches_golden(self):
        n_ants, n_pols, nb = 4, 2, 10
        rng = np.random.default_rng(9)
        q_int = rng.integers(-100, 100, size=(n_ants, n_pols, nb, N_CHANS, 2))
        x_cplx = q_int[..., 0] + 1j * q_int[..., 1]
        ref = golden.xcorr(x_cplx)
        q = jnp.asarray(np.moveaxis(q_int, 3, 0), jnp.int8)  # channel-major
        v = np.asarray(ops.xcorr(q))  # (bl, pi, pj, k, 2) int32
        out = v[..., 0] + 1j * v[..., 1]
        np.testing.assert_array_equal(ref, out)  # int math: exact

    def test_accumulation_across_chunks_adds(self):
        rng = np.random.default_rng(10)
        q_int = rng.integers(-50, 50, size=(2, 1, 8, 16, 2))
        q = jnp.asarray(np.moveaxis(q_int, 3, 0), jnp.int8)
        v_all = np.asarray(ops.xcorr(q))
        v_sum = np.asarray(ops.xcorr(q[:, :, :, :4])) + \
            np.asarray(ops.xcorr(q[:, :, :, 4:]))
        np.testing.assert_array_equal(v_all, v_sum)


class TestBeamform:
    def test_matches_golden_complex_input(self):
        rng = np.random.default_rng(11)
        x = (rng.normal(size=(4, 2, 3, N_CHANS)) +
             1j * rng.normal(size=(4, 2, 3, N_CHANS)))
        w = (rng.normal(size=(3, 4, N_CHANS)) +
             1j * rng.normal(size=(3, 4, N_CHANS)))
        ref = golden.beamform(x, w)
        out = ops.beamform(jnp.asarray(np_c2ri(x)), jnp.asarray(np_c2ri(w)))
        assert snr_db(ref, np_ri2c(out)) > 100

    def test_int8_input_path(self):
        rng = np.random.default_rng(12)
        q_int = rng.integers(-100, 100, size=(4, 2, 3, 32, 2))
        w = (rng.normal(size=(2, 4, 32)) + 1j * rng.normal(size=(2, 4, 32)))
        ref = golden.beamform(q_int[..., 0] + 1j * q_int[..., 1], w)
        out = ops.beamform(jnp.asarray(q_int, jnp.int8), jnp.asarray(np_c2ri(w)))
        assert snr_db(ref, np_ri2c(out)) > 100

    def test_incoherent_matches_golden(self):
        rng = np.random.default_rng(13)
        q_int = rng.integers(-100, 100, size=(5, 2, 3, 16, 2))
        ref = golden.incoherent_sum(q_int[..., 0] + 1j * q_int[..., 1])
        out = ops.incoherent_sum(jnp.asarray(q_int, jnp.int8))
        np.testing.assert_allclose(ref, np.asarray(out), rtol=1e-6)


class TestFEngineEndToEnd:
    """Config-1 semantics (BASELINE.json:7): full chain vs golden > 50 dB."""

    def test_bare_pfb_cw_tone(self):
        fs = 1712e6
        k0 = 33
        n = (8 + TAPS - 1) * M
        x = golden.quantize_adc(golden.cw_tone(n, k0 * fs / M, fs, 90.0))
        w = pfb_window(TAPS, M, "hann")
        ref = golden.channelize(golden.pfb_fir(x, w, TAPS, M), N_CHANS)
        out = jx_f_engine(jnp.asarray(x), w, TAPS, N_CHANS, impl="jnp")
        assert snr_db(ref, np_ri2c(out)) > SNR_BOUND

    def test_full_chain_with_all_stages(self):
        rng = np.random.default_rng(14)
        n = (6 + TAPS - 1) * M + 32
        x = _noise_int8((2, 2, n), seed=15)
        d = np.array([[0, 7], [13, 32]])
        fd = rng.uniform(-0.5, 0.5, size=(2, 2, 6))
        ph = rng.uniform(-np.pi, np.pi, size=(2, 2, 6))
        g = np.full(N_CHANS, 0.05) * np.exp(
            1j * rng.uniform(-np.pi, np.pi, size=N_CHANS))
        w = pfb_window(TAPS, M)
        ref = golden.f_engine(x, w, TAPS, N_CHANS, coarse_delays=d,
                              max_delay=32, frac_delay=fd, phase=ph, gains=g)
        out = jx_f_engine(jnp.asarray(x), w, TAPS, N_CHANS,
                          coarse_delays=jnp.asarray(d), max_delay=32,
                          frac_delay=jnp.asarray(fd), phase=jnp.asarray(ph),
                          gains=jnp.asarray(np_c2ri(g)), impl="jnp")
        assert snr_db(ref, np.asarray(ops.dequantize(out))) > SNR_BOUND


class TestFusedFEngine:
    """The fused Pallas F-engine kernel (FIR+MXU FFT+phase+requant in
    VMEM) vs golden, interpreter mode (SURVEY.md §4.2 kernel-unit)."""

    def _data(self, taps, nch, B, seed=20):
        m = 2 * nch
        rng = np.random.default_rng(seed)
        x = _noise_int8((2, (B + taps - 1) * m), seed=seed)
        w = pfb_window(taps, m)
        fd = rng.uniform(-0.5, 0.5, (2, B))
        ph = rng.uniform(-np.pi, np.pi, (2, B))
        g = np.full(nch, 0.05) * np.exp(
            1j * rng.uniform(-np.pi, np.pi, nch))
        return m, x, w, fd, ph, g

    def test_quantized_matches_golden(self):
        from dc_sand_tpu.ops.fengine_fused import fengine_fused
        taps, nch, B = 4, 512, 16
        m, x, w, fd, ph, g = self._data(taps, nch, B)
        ref = golden.f_engine(x, w, taps, nch, frac_delay=fd, phase=ph,
                              gains=g)
        out = fengine_fused(jnp.asarray(x), w, taps, nch,
                            frac_delay=jnp.asarray(fd),
                            phase=jnp.asarray(ph),
                            gains=jnp.asarray(np_c2ri(g)), interpret=True)
        # fp32-vs-fp64 rounding flips at requant half-way boundaries cost
        # a few dB on small integers; contract bound is 50 (BASELINE.json:5)
        assert snr_db(ref, np_ri2c(out)) > 65

    @pytest.mark.parametrize("nch", [1024, 2048, 4096])
    def test_contract_channel_counts_match_golden(self, nch):
        """Stage-1 DIF depth grows with m2 = M/m1 (4 at the 512-chan
        test shape, but 8/16/32 at the contract shapes) — the deeper
        butterfly codegen and k2-group tiling must be CI-verified, not
        only hardware-verified."""
        from dc_sand_tpu.ops.fengine_fused import fengine_fused
        taps, B = 4, 16
        m, x, w, fd, ph, g = self._data(taps, nch, B, seed=22)
        ref = golden.f_engine(x, w, taps, nch, frac_delay=fd, phase=ph,
                              gains=g)
        out = fengine_fused(jnp.asarray(x), w, taps, nch,
                            frac_delay=jnp.asarray(fd),
                            phase=jnp.asarray(ph),
                            gains=jnp.asarray(np_c2ri(g)),
                            interpret=True)
        assert snr_db(ref, np_ri2c(out)) > 65

    def test_fir_modes_bitwise(self):
        """fir_mode="mxu" (shifted-identity MXU dots producing the
        shifted FIR operands) is BITWISE the roll path: buf holds
        int8-derived integers, exact in bfloat16, and the 0/1 shift
        matrix makes every dot output a single exact product."""
        from dc_sand_tpu.ops.fengine_fused import fengine_fused
        taps, nch, B = 16, 512, 16
        m, x, w, fd, ph, g = self._data(taps, nch, B, seed=21)
        outs = [fengine_fused(jnp.asarray(x), w, taps, nch,
                              frac_delay=jnp.asarray(fd),
                              phase=jnp.asarray(ph),
                              gains=jnp.asarray(np_c2ri(g)),
                              stage2="fp32", fir_mode=mode,
                              interpret=True)
                for mode in ("roll", "mxu")]
        np.testing.assert_array_equal(np.asarray(outs[0]),
                                      np.asarray(outs[1]))

    def test_z_modes_bitwise(self):
        """z_mode="concat" (stage-2 operand built as a concatenated
        VALUE, no VMEM Z-scratch round trip — the 4k "floor" candidate)
        is bitwise the scratch path: same rows, same matmul, only the
        staging differs."""
        from dc_sand_tpu.ops.fengine_fused import fengine_fused
        taps, nch, B = 16, 512, 32
        m, x, w, fd, ph, g = self._data(taps, nch, B, seed=23)
        outs = [fengine_fused(jnp.asarray(x), w, taps, nch,
                              frac_delay=jnp.asarray(fd),
                              phase=jnp.asarray(ph),
                              gains=jnp.asarray(np_c2ri(g)),
                              stage2="fp32", z_mode=mode,
                              groups=2, interpret=True)
                for mode in ("scratch", "concat")]
        np.testing.assert_array_equal(np.asarray(outs[0]),
                                      np.asarray(outs[1]))

    def test_bare_matches_golden(self):
        from dc_sand_tpu.ops.fengine_fused import fengine_fused
        taps, nch, B = 16, 512, 16
        m, x, w, _, _, _ = self._data(taps, nch, B)
        ref = golden.f_engine(x, w, taps, nch)
        out = fengine_fused(jnp.asarray(x), w, taps, nch, interpret=True)
        assert snr_db(ref, np_ri2c(out)) > 100

    def test_wire_flat_bytes_equal_wire_at_contract_shape(self):
        """The flat (B, 2K) contract: byte-identical to the shipped
        shaped wire (B, K, 2) form, at a contract channel count (4096,
        where the m1=128 opack decode path is the default).  wire_flat
        is a bench/API surface (the pipeline ships the shaped form);
        this pins the documented byte contract end-to-end."""
        from dc_sand_tpu.ops.fengine_fused import fengine_fused
        taps, nch, B = 4, 4096, 16
        m, x, w, fd, ph, g = self._data(taps, nch, B, seed=24)
        kwargs = dict(frac_delay=jnp.asarray(fd), phase=jnp.asarray(ph),
                      gains=jnp.asarray(np_c2ri(g)), interpret=True)
        shaped = np.asarray(fengine_fused(jnp.asarray(x), w, taps, nch,
                                          layout="wire", **kwargs))
        flat = np.asarray(fengine_fused(jnp.asarray(x), w, taps, nch,
                                        layout="wire_flat", **kwargs))
        assert flat.shape == shaped.shape[:-2] + (2 * nch,)
        np.testing.assert_array_equal(
            shaped.reshape(flat.shape), flat)

    def test_split_io_matches_concat_path(self):
        """Split-I/O mode (chunk + carried history as separate kernel
        refs — the streaming fast path with no concat/relayout) equals
        the concatenated-stream path: float outputs to fp32 tolerance,
        quantised outputs within +-1 LSB (the pad0 shift regroups the
        FIR's residue-class summation order)."""
        from dc_sand_tpu.ops.fengine_fused import fengine_fused, _round_up
        rng = np.random.default_rng(33)
        taps, nch, B, s = 16, 512, 16, 3
        m = 2 * nch
        taps_pad = _round_up(taps, 8)
        pad0 = taps_pad - taps + 1
        w = pfb_window(taps, m)
        hist = rng.integers(-80, 80, (s, taps_pad, m)).astype(np.int8)
        chunk = rng.integers(-80, 80, (s, B, m)).astype(np.int8)
        fd = rng.uniform(-.5, .5, (s, B)).astype(np.float32)
        ph = rng.uniform(-np.pi, np.pi, (s, B)).astype(np.float32)
        g = np.stack([np.full((nch,), 0.05, np.float32),
                      np.zeros((nch,), np.float32)], -1)
        full = np.concatenate([hist[:, pad0:, :], chunk],
                              axis=1).reshape(s, -1)
        for kw in ({}, {"frac_delay": fd, "phase": ph,
                        "gains": jnp.asarray(g)}):
            ref = np.asarray(fengine_fused(
                jnp.asarray(full), w, taps, nch, stage2="fp32",
                interpret=True, **kw))
            got = np.asarray(fengine_fused(
                jnp.asarray(chunk), w, taps, nch,
                history=jnp.asarray(hist), stage2="fp32",
                interpret=True, **kw))
            if ref.dtype == np.int8:
                assert np.abs(ref.astype(int) - got.astype(int)).max() <= 1
            else:
                np.testing.assert_allclose(
                    got, ref, rtol=0, atol=2e-5 * np.abs(ref).max())

    def test_split_io_explicit_bad_tiling_raises(self):
        """An EXPLICIT tb that does not tile the chunk must raise, not
        silently re-choose (a tb=128 bench datapoint would otherwise
        measure the auto tiling)."""
        from dc_sand_tpu.ops.fengine_fused import fengine_fused, _round_up
        rng = np.random.default_rng(35)
        taps, nch, B, s = 4, 512, 8, 1
        m = 2 * nch
        hist = np.zeros((s, _round_up(taps, 8), m), np.int8)
        chunk = rng.integers(-80, 80, (s, B, m)).astype(np.int8)
        with pytest.raises(ValueError, match="explicit tiling"):
            fengine_fused(jnp.asarray(chunk), pfb_window(taps, m), taps,
                          nch, history=jnp.asarray(hist), tb=128,
                          interpret=True)

    def test_split_io_native_layout_streaming_vs_one_shot(self):
        """Two frames-I/O chunks chained through the carried history
        equal one long concatenated stream (overlap-save continuity
        across the chunk boundary), in the native plane layout."""
        from dc_sand_tpu.ops.fengine_fused import fengine_fused, _round_up
        rng = np.random.default_rng(34)
        taps, nch, B, s = 4, 512, 8, 2
        m = 2 * nch
        taps_pad = _round_up(taps, 8)
        w = pfb_window(taps, m)
        chunks = [rng.integers(-80, 80, (s, B, m)).astype(np.int8)
                  for _ in range(2)]
        hist = np.zeros((s, taps_pad, m), np.int8)
        outs = []
        for c in chunks:
            outs.append(np.asarray(fengine_fused(
                jnp.asarray(c), w, taps, nch, history=jnp.asarray(hist),
                stage2="fp32", layout="native", interpret=True)))
            hist = c[:, B - taps_pad:, :]
        full = np.concatenate(
            [np.zeros((s, taps - 1, m), np.int8)] + chunks,
            axis=1).reshape(s, -1)
        ref = np.asarray(fengine_fused(
            jnp.asarray(full), w, taps, nch, stage2="fp32",
            layout="native", interpret=True))
        got = np.concatenate(outs, axis=3)   # (s, m2, 2, B_total, k1n)
        np.testing.assert_allclose(got, ref,
                                   rtol=0, atol=2e-5 * np.abs(ref).max())

    def test_native_layout_decodes_to_golden_at_depth(self):
        """Native plane layout at a contract-scale m2 (=16; the 512-chan
        tests only cover m2=4): decoding (s, m2, 2, B, k1n) planes by
        k = k2 + m2*k1 must reproduce the golden spectra."""
        from dc_sand_tpu.ops.fengine_fused import (fengine_fused,
                                                   native_factor)
        taps, nch, B = 4, 2048, 16
        m, x, w, fd, ph, g = self._data(taps, nch, B, seed=23)
        qn = np.asarray(fengine_fused(
            jnp.asarray(x), w, taps, nch, frac_delay=jnp.asarray(fd),
            phase=jnp.asarray(ph), gains=jnp.asarray(np_c2ri(g)),
            layout="native", interpret=True))
        m2, k1n = native_factor(nch)
        assert qn.shape == (2, m2, 2, B, k1n)
        # k = k2 + m2*k1: (s, B, k1n, m2, c) raveled over (k1, k2)
        wire = qn.transpose(0, 3, 4, 1, 2).reshape(2, B, nch, 2)
        ref = golden.f_engine(x, w, taps, nch, frac_delay=fd, phase=ph,
                              gains=g)
        assert snr_db(ref, np_ri2c(wire)) > 65

    def test_small_m_falls_back(self):
        """Shapes the kernel can't tile route to the unfused ops."""
        from dc_sand_tpu.ops.fengine_fused import fengine_fused
        taps, nch, B = 4, 64, 8
        m, x, w, fd, ph, g = self._data(taps, nch, B)
        ref = golden.f_engine(x, w, taps, nch, frac_delay=fd, phase=ph,
                              gains=g)
        out = fengine_fused(jnp.asarray(x), w, taps, nch,
                            frac_delay=jnp.asarray(fd),
                            phase=jnp.asarray(ph),
                            gains=jnp.asarray(np_c2ri(g)))
        assert snr_db(ref, np_ri2c(out)) > 50


class TestRadixCodegen:
    """The fused kernel's trace-time radix-2 FFT codegen (_dft_tiles)
    vs numpy's FFT, directly on numpy 'tiles' — the stage-1 oracle."""

    @pytest.mark.parametrize("n", [4, 8, 16, 32, 64])
    def test_matches_numpy_fft(self, n):
        from dc_sand_tpu.ops.fengine_fused import _dft_tiles
        rng = np.random.default_rng(n)
        vals = rng.normal(size=(n, 3, 5))      # n real tiles
        out = _dft_tiles([(vals[i], None) for i in range(n)])
        ref = np.fft.fft(vals, axis=0)
        for k in range(n):
            re = out[k][0] if out[k][0] is not None else 0.0
            im = out[k][1] if out[k][1] is not None else 0.0
            np.testing.assert_allclose(re, ref[k].real, atol=1e-12)
            np.testing.assert_allclose(im, ref[k].imag, atol=1e-12)

    def test_real_input_elision(self):
        """k=0 and k=n/2 outputs of a real-input DFT stay exactly real
        (im component None — never materialised)."""
        from dc_sand_tpu.ops.fengine_fused import _dft_tiles
        vals = [(np.ones((2, 2)) * i, None) for i in range(8)]
        out = _dft_tiles(vals)
        assert out[0][1] is None
        assert out[4][1] is None


class TestBeamformPallas:
    def test_pallas_matches_jnp_and_golden(self):
        """C10's Pallas kernel (stacked-real bf16-split matmul per
        channel) vs the fp32 einsum path and the float64 golden."""
        rng = np.random.default_rng(55)
        a, p, b, k, nb = 4, 2, 64, 16, 4
        q = rng.integers(-100, 100, (a, p, b, k, 2), dtype=np.int8)
        w = rng.normal(size=(nb, a, k, 2)).astype(np.float32)
        ref_j = np.asarray(ops.beamform(jnp.asarray(q), jnp.asarray(w),
                                        impl="jnp"))
        got = np.asarray(ops.beamform(jnp.asarray(q), jnp.asarray(w),
                                      impl="pallas_interpret"))
        assert got.shape == ref_j.shape
        assert snr_db(ref_j, got) > 85      # bf16-split weight mantissa
        qc = q[..., 0] + 1j * q[..., 1]
        wg = w[..., 0] + 1j * w[..., 1]
        ref_g = golden.beamform(qc, wg)
        assert snr_db(ref_g, np_ri2c(got)) > 85

    @pytest.mark.parametrize("b", [128, 512])
    def test_native_layout_beamform_matches_wire_path(self, b):
        """beamform_native (MXU identity-dot relayout from the fused
        F-engine's plane layout, per-(k1, pol) bf16-split matmuls)
        equals decoding to wire order and beamforming there.
        b=512 drives the kg group scaling (kg 32 -> 16)."""
        rng = np.random.default_rng(57)
        a, p, m2, k1n, nb = 4, 2, 2, 128, 4
        k = m2 * k1n
        qn = jnp.asarray(rng.integers(-100, 100, (a, p, m2, 2, b, k1n),
                                      dtype=np.int8))
        w = jnp.asarray(rng.normal(size=(nb, a, k, 2)).astype(np.float32))
        got = np.asarray(ops.beamform_native(qn, w,
                                             impl="pallas_interpret"))
        # reference: decode native -> wire, then the jnp einsum path
        x = np.asarray(qn).transpose(0, 1, 4, 5, 2, 3).reshape(
            a, p, b, k, 2)
        ref = np.asarray(ops.beamform(jnp.asarray(x), w, impl="jnp"))
        assert got.shape == ref.shape == (nb, p, b, k, 2)
        assert snr_db(ref, got) > 85        # bf16-split weight mantissa
        # incoherent sum on the native layout, exact vs wire
        inc_n = np.asarray(ops.incoherent_sum_native(qn))
        inc_w = np.asarray(ops.incoherent_sum(jnp.asarray(x)))
        np.testing.assert_allclose(inc_n, inc_w, rtol=1e-6)

    @pytest.mark.parametrize("qs", [0.0, 0.25])
    def test_native_pmerge_matches_default_bitwise(self, qs):
        """The pol-merged-COLUMNS kernel (_pmerge: both pols on the
        lane axis of every relayout/beam dot — NOT the reverted
        sublane pol-merge) is bitwise the per-pol default kernel,
        with and without in-kernel quantisation."""
        rng = np.random.default_rng(61)
        a, p, m2, k1n, nb, b = 4, 2, 2, 128, 4, 128
        k = m2 * k1n
        qn = jnp.asarray(rng.integers(-100, 100, (a, p, m2, 2, b, k1n),
                                      dtype=np.int8))
        w = jnp.asarray(rng.normal(size=(nb, a, k, 2)).astype(np.float32))
        ref = np.asarray(ops.beamform_native(
            qn, w, impl="pallas_interpret", quant_scale=qs))
        got = np.asarray(ops.beamform_native(
            qn, w, impl="pallas_interpret", quant_scale=qs,
            _pmerge=True))
        np.testing.assert_array_equal(got, ref)

    def test_native_in_kernel_quant_bitwise(self):
        """quant_scale > 0 quantises IN KERNEL to the C10 int8 beam
        product — bitwise the XLA-level quantisation of the kernel's
        own fp32 output (same values, same round-half-even/saturate),
        on both the Pallas path and the small-shape fallback."""
        rng = np.random.default_rng(59)
        s = 0.25
        for (a, p, m2, k1n, b) in ((4, 2, 2, 128, 128), (2, 2, 2, 8, 4)):
            k = m2 * k1n
            nb = 4
            qn = jnp.asarray(rng.integers(-100, 100,
                                          (a, p, m2, 2, b, k1n),
                                          dtype=np.int8))
            w = jnp.asarray(rng.normal(size=(nb, a, k, 2))
                            .astype(np.float32))
            impl = "pallas_interpret" if k1n == 128 else "jnp"
            f32 = np.asarray(ops.beamform_native(qn, w, impl=impl))
            ref = np.clip(np.round(f32 * s), -127, 127).astype(np.int8)
            got = np.asarray(ops.beamform_native(qn, w, impl=impl,
                                                 quant_scale=s))
            assert got.dtype == np.int8
            np.testing.assert_array_equal(got, ref)

    def test_native_layout_beamform_fallback_small_shape(self):
        """Shapes the native kernel can't tile decode to wire and take
        the normal path (bitwise vs doing the decode by hand)."""
        rng = np.random.default_rng(58)
        a, p, m2, b, k1n, nb = 2, 2, 2, 4, 8, 2
        k = m2 * k1n
        qn = jnp.asarray(rng.integers(-50, 50, (a, p, m2, 2, b, k1n),
                                      dtype=np.int8))
        w = jnp.asarray(rng.normal(size=(nb, a, k, 2)).astype(np.float32))
        got = np.asarray(ops.beamform_native(qn, w, impl="jnp"))
        x = np.asarray(qn).transpose(0, 1, 4, 5, 2, 3).reshape(
            a, p, b, k, 2)
        ref = np.asarray(ops.beamform(jnp.asarray(x), w, impl="jnp"))
        np.testing.assert_array_equal(got, ref)

    def test_float_input_stays_on_einsum(self):
        """Non-int8 inputs (not exact in bf16) keep the fp32 path."""
        rng = np.random.default_rng(56)
        x = rng.normal(size=(4, 2, 64, 16, 2)).astype(np.float32)
        w = rng.normal(size=(4, 4, 16, 2)).astype(np.float32)
        got = np.asarray(ops.beamform(jnp.asarray(x), jnp.asarray(w),
                                      impl="pallas_interpret"))
        ref = np.asarray(ops.beamform(jnp.asarray(x), jnp.asarray(w),
                                      impl="jnp"))
        np.testing.assert_array_equal(got, ref)


class TestXcorrAccumulate:
    """Streaming block accumulator + dump-time extraction (C8/C9) vs the
    per-chunk golden xcorr; Pallas CMAC kernel in interpret mode."""

    def _chunks(self, k=8, n_ants=8, n_pols=2, b=128, n_chunks=3, seed=33):
        rng = np.random.default_rng(seed)
        return [rng.integers(-100, 100, (k, n_ants, n_pols, b, 2),
                             dtype=np.int8) for _ in range(n_chunks)]

    def _golden_total(self, chunks):
        tot = None
        for q in chunks:
            # golden.xcorr wants (ant, pol, b, k) complex
            qc = (q[..., 0] + 1j * q[..., 1]).transpose(1, 2, 3, 0)
            v = golden.xcorr(qc)
            tot = v if tot is None else tot + v
        return tot

    def _run(self, impl, chunks=None):
        if chunks is None:
            chunks = self._chunks()
        k, a, p = chunks[0].shape[:3]
        acc = jnp.zeros(ops.acc_shape(a, p, k), jnp.int32)
        for q in chunks:
            acc = ops.xcorr_accumulate(acc, jnp.asarray(q), impl=impl)
        return np.asarray(ops.extract_vis(acc, a, p)), chunks

    def test_jnp_matches_golden_exact(self):
        vis, chunks = self._run("jnp")
        ref = self._golden_total(chunks)
        np.testing.assert_array_equal(vis[..., 0], ref.real)
        np.testing.assert_array_equal(vis[..., 1], ref.imag)

    def test_pallas_interpret_matches_jnp_bitwise(self):
        vis_p, _ = self._run("pallas_interpret")
        vis_j, _ = self._run("jnp")
        np.testing.assert_array_equal(vis_p, vis_j)

    def test_matches_per_chunk_xcorr(self):
        """The dump-cadence path == summing per-chunk extracted xcorr."""
        chunks = self._chunks(n_chunks=2)
        vis, _ = self._run("jnp", chunks)
        per_chunk = sum(np.asarray(ops.xcorr(jnp.asarray(q)))
                        for q in chunks)
        np.testing.assert_array_equal(vis, per_chunk)

    @pytest.mark.parametrize("b", [128, 512])
    def test_native_layout_kernel_matches_transpose_path_bitwise(
            self, b):
        """The fused relayout+CMAC kernel (full-occupancy MXU
        identity-dot corner-turn into int8 scratch + four s8xs8->s32
        dots per channel) is exact vs the int8 a2 path at a
        kernel-eligible shape (b and k1n multiples of 128)."""
        rng = np.random.default_rng(7)
        a, p, m2, k1n = 4, 2, 2, 128
        qn = jnp.asarray(rng.integers(-127, 128, (a, p, m2, 2, b, k1n),
                                      dtype=np.int8))
        acc0 = jnp.asarray(rng.integers(
            -1000, 1000, ops.acc_shape(a, p, m2 * k1n), dtype=np.int32))
        got = np.asarray(ops.xcorr_accumulate_native(
            acc0, qn, impl="pallas_interpret"))
        a2 = qn.transpose(2, 5, 3, 0, 1, 4).reshape(
            m2 * k1n, 2 * a * p, b)
        ref = np.asarray(ops.xcorr_accumulate_a2(acc0, a2, impl="jnp"))
        np.testing.assert_array_equal(got, ref)

    @pytest.mark.parametrize("b,bc", [(256, 128), (1280, 256)])
    @pytest.mark.parametrize("epi_hoist", [False, True])
    def test_native_kernel_qn_pipe_matches_auto_bitwise(self, b, bc,
                                                        epi_hoist):
        """The manually double-buffered qn-streaming kernel (_qn_pipe:
        two-slot VMEM windows, cross-plane prefetch) is bitwise the
        auto-pipelined multi-tile kernel, including reset and a
        non-zero starting accumulator — with and without the r5
        pack-epilogue hoist (per-plane unpacked (dr, di) scratch; int32
        regrouping is exact)."""
        rng = np.random.default_rng(11)
        a, p, m2, k1n = 4, 2, 2, 128
        qn = jnp.asarray(rng.integers(-127, 128, (a, p, m2, 2, b, k1n),
                                      dtype=np.int8))
        acc0 = jnp.asarray(rng.integers(
            -1000, 1000, ops.acc_shape(a, p, m2 * k1n), dtype=np.int32))
        for reset in (None, jnp.bool_(True)):
            ref = np.asarray(ops.xcorr_accumulate_native(
                acc0, qn, reset=reset, impl="pallas_interpret", _bc=bc))
            got = np.asarray(ops.xcorr_accumulate_native(
                acc0, qn, reset=reset, impl="pallas_interpret", _bc=bc,
                _qn_pipe=True, _epi_hoist=epi_hoist))
            np.testing.assert_array_equal(got, ref)

    def test_native_kernel_m2major_probe_bitwise(self):
        """The _m2major bench probe (qn pre-arranged (m2, ap, 2, b,
        k1n) so plane blocks are contiguous HBM slabs) computes the
        same accumulator as the production ap-major layout."""
        rng = np.random.default_rng(9)
        a, p, m2, k1n, b = 4, 2, 2, 128, 256
        qn = jnp.asarray(rng.integers(-127, 128, (a, p, m2, 2, b, k1n),
                                      dtype=np.int8))
        acc0 = jnp.asarray(rng.integers(
            -1000, 1000, ops.acc_shape(a, p, m2 * k1n), dtype=np.int32))
        ref = np.asarray(ops.xcorr_accumulate_native(
            acc0, qn, impl="pallas_interpret"))
        qn5 = qn.reshape(a * p, m2, 2, b, k1n).transpose(1, 0, 2, 3, 4)
        got = np.asarray(ops.xcorr_accumulate_native(
            acc0, qn5, impl="pallas_interpret", _m2major=True))
        np.testing.assert_array_equal(got, ref)
        # and on the multi-tile grid (b=1280 -> bc=256, nt=5)
        b3 = 1280
        qnc = jnp.asarray(rng.integers(-127, 128, (a, p, m2, 2, b3, k1n),
                                       dtype=np.int8))
        ref3 = np.asarray(ops.xcorr_accumulate_native(
            acc0, qnc, impl="pallas_interpret"))
        qn5c = qnc.reshape(a * p, m2, 2, b3, k1n).transpose(1, 0, 2, 3, 4)
        got3 = np.asarray(ops.xcorr_accumulate_native(
            acc0, qn5c, impl="pallas_interpret", _m2major=True))
        np.testing.assert_array_equal(got3, ref3)

    def test_native_kernel_admits_long_integration_tiles(self):
        """b > 1024 (outside round 2's fp32 bf16-dot exactness bound)
        is legal for the s32-accumulating int8 kernel — the runner's
        dump cadence enforces the int32 headroom; the gate admits it
        and the kernel stays exact."""
        rng = np.random.default_rng(11)
        a, p, m2, k1n, b = 2, 2, 1, 128, 1280
        qn = jnp.asarray(rng.integers(-127, 128, (a, p, m2, 2, b, k1n),
                                      dtype=np.int8))
        acc0 = jnp.zeros(ops.acc_shape(a, p, m2 * k1n), jnp.int32)
        got = np.asarray(ops.xcorr_accumulate_native(
            acc0, qn, impl="pallas_interpret"))
        a2 = qn.transpose(2, 5, 3, 0, 1, 4).reshape(
            m2 * k1n, 2 * a * p, b)
        ref = np.asarray(ops.xcorr_accumulate_a2(acc0, a2, impl="jnp"))
        np.testing.assert_array_equal(got, ref)


class TestStokes:
    def test_matches_golden(self):
        rng = np.random.default_rng(31)
        b_ri = rng.normal(size=(3, 2, 4, 16, 2)).astype(np.float32)
        b_c = b_ri[..., 0] + 1j * b_ri[..., 1]
        ref = golden.stokes(b_c)
        out = ops.stokes(jnp.asarray(b_ri))
        assert out.shape == (3, 4, 4, 16)
        assert snr_db(ref, np.asarray(out)) > 100

    def test_pure_x_pol(self):
        b = np.zeros((1, 2, 1, 4, 2), np.float32)
        b[0, 0, 0, :, 0] = 3.0  # x = 3+0j, y = 0
        s = np.asarray(ops.stokes(jnp.asarray(b)))
        np.testing.assert_allclose(s[0, 0, 0], 9.0)   # I
        np.testing.assert_allclose(s[0, 1, 0], 9.0)   # Q
        np.testing.assert_allclose(s[0, 2:, 0], 0.0)  # U, V

    def test_single_pol_rejected(self):
        with pytest.raises(ValueError):
            ops.stokes(jnp.zeros((1, 1, 2, 4, 2)))


class TestFusedInt16Stage2:
    def test_int16_stage2_above_contract(self):
        """Opt-in int8-MXU stage-2 (hi/lo 14-bit split): ~80 dB bare,
        >50 dB quantized — valid but left non-default (thin margin)."""
        from dc_sand_tpu.ops.fengine_fused import fengine_fused
        taps, nch, B = 4, 512, 16
        m = 2 * nch
        rng = np.random.default_rng(22)
        x = _noise_int8((2, (B + taps - 1) * m), seed=22)
        w = pfb_window(taps, m)
        ref = golden.f_engine(x, w, taps, nch)
        out = fengine_fused(jnp.asarray(x), w, taps, nch,
                            stage2="int16", interpret=True)
        assert snr_db(ref, np_ri2c(out)) > 70


class TestFuzzFEngine:
    def test_shapes_fuzz_vs_golden(self):
        """Property fuzz over (taps, chans, ants, pols, chunks, stage
        toggles): the jnp F-engine path must track the float64 golden
        chain above the contract bound at ANY shape combination, not
        just the pinned test shapes."""
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=15, deadline=None)
        @given(st.data())
        def check(data):
            taps = data.draw(st.sampled_from([2, 3, 4, 8, 16]))
            nch = data.draw(st.sampled_from([16, 32, 64, 128]))
            a = data.draw(st.integers(1, 3))
            p = data.draw(st.integers(1, 2))
            nb = data.draw(st.integers(1, 6))
            with_delay = data.draw(st.booleans())
            with_gains = data.draw(st.booleans())
            seed = data.draw(st.integers(0, 2**16))
            m = 2 * nch
            rng = np.random.default_rng(seed)
            x = _noise_int8((a, p, (nb + taps - 1) * m), seed=seed)
            w = pfb_window(taps, m)
            kw_g, kw_j = {}, {}
            if with_delay:
                fd = rng.uniform(-0.5, 0.5, (a, p, nb))
                ph = rng.uniform(-np.pi, np.pi, (a, p, nb))
                kw_g = {"frac_delay": fd, "phase": ph}
                kw_j = {"frac_delay": jnp.asarray(fd, jnp.float32),
                        "phase": jnp.asarray(ph, jnp.float32)}
            if with_gains:
                g = np.full(nch, 0.05) * np.exp(
                    1j * rng.uniform(-np.pi, np.pi, nch))
                kw_g["gains"] = g
                kw_j["gains"] = jnp.asarray(np_c2ri(g))
            ref = golden.f_engine(x, w, taps, nch, **kw_g)
            out = jx_f_engine(jnp.asarray(x), w, taps, nch, impl="jnp",
                              **kw_j)
            outc = np_ri2c(out)
            snr = snr_db(ref, outc)
            if not with_gains:
                assert snr > 100, (taps, nch, a, p, nb, with_delay, snr)
                return
            # With requant the comparison is int8 vs int8, and the fp32
            # fine-delay phasor differs from the fp64 golden by ~1e-6
            # absolute at |v|~10 — a value that lands within that of a
            # round-half-even boundary legitimately flips one LSB either
            # way.  At fuzz sizes (512 samples) a single flip alone is
            # ~51 dB, so a bare SNR bound >50 would be flaky by
            # construction.  Certify instead that EVERY diff is a
            # single-LSB flip whose golden *pre-round* component sits
            # within 1e-3 of a .5 boundary (a wrong rounding mode, gain,
            # or phase produces diffs far from boundaries / >1 LSB), and
            # keep the >50 dB contract bound (BASELINE.json:5).
            assert snr > 50, (taps, nch, a, p, nb, with_delay, snr)
            d = outc - ref
            flips = np.argwhere(np.abs(d) > 0)
            if flips.size:
                kw_pre = dict(kw_g)
                g = kw_pre.pop("gains")
                pre = golden.f_engine(x, w, taps, nch, **kw_pre) * g
                assert np.abs(d.real).max() <= 1 and \
                    np.abs(d.imag).max() <= 1, (taps, nch, seed, snr)
                for i in map(tuple, flips):
                    for comp, dd in ((pre[i].real, d[i].real),
                                     (pre[i].imag, d[i].imag)):
                        if dd:
                            frac = abs(comp - np.floor(comp) - 0.5)
                            assert frac < 1e-3, (i, comp, snr)

        check()

    def test_boundary_flip_regression(self):
        """Round-3 red case pinned: taps=2 nch=128 nb=4 seed=38282 with
        delay+gains produced exactly one 1-LSB flip (golden pre-round
        imag 7.5000011, i.e. 1.1e-6 from the .5 boundary) -> 50.78 dB.
        The flip is irreducible fp32-phasor-vs-fp64 boundary ambiguity;
        certify the flip-site property and the 50 dB contract bound."""
        taps, nch, a, p, nb, seed = 2, 128, 1, 1, 4, 38282
        m = 2 * nch
        rng = np.random.default_rng(seed)
        x = _noise_int8((a, p, (nb + taps - 1) * m), seed=seed)
        w = pfb_window(taps, m)
        fd = rng.uniform(-0.5, 0.5, (a, p, nb))
        ph = rng.uniform(-np.pi, np.pi, (a, p, nb))
        g = np.full(nch, 0.05) * np.exp(1j * rng.uniform(-np.pi, np.pi, nch))
        ref = golden.f_engine(x, w, taps, nch, frac_delay=fd, phase=ph,
                              gains=g)
        out = jx_f_engine(jnp.asarray(x), w, taps, nch, impl="jnp",
                          frac_delay=jnp.asarray(fd, jnp.float32),
                          phase=jnp.asarray(ph, jnp.float32),
                          gains=jnp.asarray(np_c2ri(g)))
        outc = np_ri2c(out)
        assert snr_db(ref, outc) > 50
        d = outc - ref
        pre = golden.f_engine(x, w, taps, nch, frac_delay=fd, phase=ph) * g
        for i in map(tuple, np.argwhere(np.abs(d) > 0)):
            for comp, dd in ((pre[i].real, d[i].real),
                             (pre[i].imag, d[i].imag)):
                if dd:
                    assert abs(dd) <= 1, (i, dd)
                    assert abs(comp - np.floor(comp) - 0.5) < 1e-3, (i, comp)
