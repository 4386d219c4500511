#!/usr/bin/env python
"""Headline benchmark: prints ONE JSON line for the driver.

Metric: channelized samples/s/chip of the full F-engine (PFB-FIR + FFT +
fine-delay/fringe + 8-bit requant) on the local TPU chip — BASELINE.json:2
primary metric 1 — at the CONTRACT shape: 4096 channels, the channel
count configs 2/4/5 (BASELINE.json:8,10,11) actually run.  ``vs_baseline``
is the ratio to the 13.7 Gsamp/s/chip real-time floor a v5e-16 needs for
the 64-ant 856 MHz target (BASELINE.md derived table): >= 1.0 means this
chip alone sustains its share of the full array in real time.  The
1k-channel rate (round-1's headline shape) rides along in ``extra``.
"""

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _require_device(timeout_s: float = 300.0):
    """Initialise the jax backend with a deadline.

    Backend init dials the tunnelled TPU service on this machine; when
    the tunnel is down the PJRT client retries forever, which would hang
    the driver's bench run silently.  Probe from a daemon thread and
    fail loudly instead.  On success the initialised backend is cached
    process-wide, so the main thread reuses it.
    """
    import threading

    out: list = []
    err: list = []

    def probe() -> None:
        try:
            import jax
            out.append(jax.devices())
        except BaseException as e:   # report the real failure, not a
            err.append(e)            # misdiagnosed "timeout"

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if err:
        print(f"bench.py: jax backend init failed: "
              f"{type(err[0]).__name__}: {err[0]}", file=sys.stderr)
        _recorded_fallback("backend init failed")
    if not out:
        print(f"bench.py: jax backend init did not complete within "
              f"{timeout_s:.0f}s — TPU tunnel unreachable?",
              file=sys.stderr)
        _recorded_fallback(f"backend init blocked {timeout_s:.0f}s "
                           "(TPU tunnel down)")
    return out[0]


def _recorded_fallback(reason: str) -> "NoReturn":  # noqa: F821
    """Emit the newest RECORDED on-chip headline, clearly marked stale.

    The TPU on this box arrives through a tunnel that is sometimes down
    (observed dead for whole sessions).  A live measurement is always
    preferred — this path only runs when backend init itself fails — but
    an honest, provenance-stamped recorded number beats an empty
    BENCH_r{N}.json.  Every field needed to audit it (commit, timestamp,
    record filename) is included, and ``stale_recorded`` makes it
    impossible to mistake for a live run.
    """
    rdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench", "results")

    def _ts(name):
        try:
            return int(name.rsplit("_", 1)[1].split(".")[0])
        except ValueError:
            return None

    best = None
    for name in sorted((f for f in os.listdir(rdir)
                        if f.startswith("fengine_full_auto_")
                        and _ts(f) is not None), key=_ts, reverse=True):
        with open(os.path.join(rdir, name)) as fh:
            r = json.load(fh)
        if r["extra"].get("n_chans") == 4096 and r["extra"].get("chip"):
            best = (name, r)          # chip tag == measured on real TPU
            break
    if best is None:
        raise SystemExit(2)   # nothing recorded either — fail loudly
    name, r = best
    print(json.dumps({
        "metric": r["metric"] + " (4k chans, contract shape)",
        "value": r["value"],
        "unit": r["unit"],
        "vs_baseline": r["extra"]["vs_realtime_floor"],
        "extra": {
            "stale_recorded": True,
            "reason": f"no live measurement: {reason}",
            "record": name,
            "commit": name.split("_")[3],
            "chip": r["extra"]["chip"],
            "recorded_unix": _ts(name),
            "bottleneck": r["extra"].get("bottleneck"),
        },
    }))
    raise SystemExit(0)


def _arm_deadline(seconds: float) -> None:
    """Emit the recorded fallback if the LIVE benches overrun.

    The round-5 refresh lost its headline to `timeout 1500 bench.py`
    exiting 124 with NO output at all — a cold server compile can eat
    the whole budget.  A live number is still always preferred; this
    watchdog only fires when the deadline passes, and the emitted line
    is the same provenance-stamped `stale_recorded` record the
    dead-tunnel path uses.  Tune with BENCH_DEADLINE_S (<= the caller's
    own timeout, or 0 to disable)."""
    import threading

    def fire():
        try:
            _recorded_fallback(f"live bench exceeded {seconds:.0f}s "
                               "deadline (cold server compile?)")
        except SystemExit as e:
            sys.stdout.flush()
            os._exit(e.code or 0)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()


def main() -> None:
    _require_device()
    deadline = float(os.environ.get("BENCH_DEADLINE_S", "1380"))
    if deadline > 0:
        _arm_deadline(deadline)
    from dc_sand_tpu.bench.pipelines import (bench_fengine,
                                             REALTIME_FLOOR_PER_CHIP)

    res = bench_fengine(n_streams=16, n_spectra=512, n_chans=4096,
                        taps=16, impl="auto", full_chain=True, iters=192)
    res.save(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "bench", "results"))
    res1k = bench_fengine(n_streams=16, n_spectra=512, n_chans=1024,
                          taps=16, impl="auto", full_chain=True,
                          iters=128)
    res1k.save(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench", "results"))
    # the full single-chip FX-correlator step (F-engine + X-engine +
    # integration, 64 ants dual-pol 4k chans) rides along from its most
    # recent recorded run — its ~20 min scan-program compile is too
    # fragile for this entry point (axon compile-helper roulette), but
    # the record is measured on this same chip by bench_fx_step
    fx = None
    try:
        rdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench", "results")
        # order by the RECORDED timestamp in the filename (as
        # bench/regress.py does) — file mtimes are checkout times on a
        # fresh clone, which would make "newest" arbitrary; skip any
        # foreign file whose name doesn't parse rather than aborting
        def _ts(name):
            try:
                return int(name.rsplit("_", 1)[1].split(".")[0])
            except ValueError:
                return None

        recs = sorted((f for f in os.listdir(rdir)
                       if f.startswith("fx_step_64ant_")
                       and _ts(f) is not None), key=_ts)
        # the newest record (at ANY shape) identifies the current
        # kernel; only 4k records from that same batch may ride along —
        # an older commit's 4k number must never masquerade as current.
        # The best chunk-size variant within the batch is the headline
        # (512-spectra chunks amortise accumulator traffic better than
        # 256 — both are recorded).
        batch = None
        for name in reversed(recs):
            commit = name.split("_")[3]
            if batch is None:
                batch = commit
            elif commit != batch:
                break
            with open(os.path.join(rdir, name)) as fh:
                r = json.load(fh)
            if r["extra"].get("n_chans") != 4096:
                continue
            cand = {"gsamp_s": r["value"] / 1e9,
                    "vs_realtime_floor":
                        r["extra"]["vs_realtime_floor"],
                    "record": name}
            if fx is None or cand["gsamp_s"] > fx["gsamp_s"]:
                fx = cand
    except Exception:
        pass
    # primary metric 2 (BASELINE.json:2): correlator baselines/s at 64
    # antennas — measured LIVE on the kernel the production fx step
    # actually dispatches (xcorr_accumulate_native at the 512-spectra
    # production cadence).  A regression at HEAD therefore shows up in
    # BENCH_rN directly (VERDICT r2 missing #6); the recorded-number
    # path survives only as an explicitly-tagged fallback, and the
    # measurement basis (mode + n_spectra) is always stamped so two
    # BENCH rounds can't silently compare different kernels (ADVICE r2).
    xc = None
    try:
        from dc_sand_tpu.bench.kernels import bench_xcorr
        from dc_sand_tpu.config import get_config
        # measure at the fx64 preset's OWN chunk size — the shape the
        # production step dispatches (the cadence is data-driven, see
        # config.py; n_spectra is stamped in the record/extra either way)
        xr = bench_xcorr(mode="native",
                         n_spectra=get_config("fx64").spectra_per_chunk,
                         iters=32)
        xr.save(rdir)
        xc = {"value": xr.value, "unit": xr.unit,
              "int8_tops": xr.extra.get("int8_tops"),
              "mode": "native",
              "n_spectra": xr.extra.get("n_spectra"), "live": True}
    except Exception as e:
        print(f"bench.py: live xcorr bench failed ({type(e).__name__}: "
              f"{e}); falling back to newest record", file=sys.stderr)
        try:
            recs = sorted((f for f in os.listdir(rdir)
                           if (f.startswith("xcorr_cmac_accumulate_")
                               or f.startswith("xcorr_cmac_native_"))
                           and _ts(f) is not None), key=_ts)
            for name in reversed(recs):
                with open(os.path.join(rdir, name)) as fh:
                    r = json.load(fh)
                if (r["extra"].get("n_ants") == 64
                        and r["extra"].get("chip")):
                    xc = {"value": r["value"], "unit": r["unit"],
                          "int8_tops": r["extra"].get("int8_tops"),
                          "mode": r["extra"].get("mode"),
                          "n_spectra": r["extra"].get("n_spectra"),
                          "live": False, "record": name}
                    break
        except Exception:
            pass
    # speed-of-light accounting (BASELINE.json:5): the fraction of the
    # kernel's OWN cost-model bound (bottleneck unit at measured unit
    # rates — see bench.pipelines.fengine_cost_model) achieved live,
    # printed next to vs_realtime_floor per VERDICT r3 #4
    def _pct_of_bound(r):
        cm = r.extra.get("cost_model") or {}
        b = cm.get("bound_gsamp_s")
        return (r.value / 1e9 / b) if b else None

    print(json.dumps({
        "metric": res.metric + " (4k chans, contract shape)",
        "value": res.value,
        "unit": res.unit,
        "vs_baseline": res.value / REALTIME_FLOOR_PER_CHIP,
        "extra": {"gsamp_s_1k_chans": res1k.value / 1e9,
                  "bottleneck": res.extra.get("bottleneck"),
                  "pct_of_cost_model_bound": _pct_of_bound(res),
                  "pct_of_cost_model_bound_1k": _pct_of_bound(res1k),
                  "fx_step_64ant_4k_recorded": fx,
                  "xcorr_baselines_per_s_64ant": xc},
    }))


if __name__ == "__main__":
    main()
