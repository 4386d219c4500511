#!/usr/bin/env /opt/venv/bin/python
"""Session-10 z_mode sweep at the NEW m1=128 default (4k wire contract
shape).

VERDICT r3 weak #6 named the z-scratch round trip as an unattacked,
measured floor item; z_mode="concat" (build the stage-2 operand by
concatenating the stage-1 halves instead of round-tripping a VMEM Z
scratch) was implemented but never swept at the m1=128 radix that is
now the 4k default.  groups=1..8 re-swept alongside because the
stage-2 matmul M-dim (mg*tb) interacts with both knobs.
"""

import importlib.util
import os
import sys

_spec = importlib.util.spec_from_file_location(
    "occ", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "sweep_stage2_occupancy.py"))
occ = importlib.util.module_from_spec(_spec)
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
_spec.loader.exec_module(occ)


def main():
    occ.require_tunnel()
    results = {}
    for g in (1, 2, 8):
        for zm in ("scratch", "concat"):
            key = (g, zm)
            try:
                results[key] = occ.bench_variant(
                    16, 512, tb=64, groups=g, fir_mode="mxu",
                    z_mode=zm, m1=128, iters=128)
            except Exception as e:
                print(f"  g={g} z={zm}: FAILED {type(e).__name__}: {e}",
                      flush=True)
    if results:
        best = max(results, key=results.get)
        print(f"winner: g={best[0]} z={best[1]} "
              f"{results[best]/1e9:.2f} Gsamp/s")


if __name__ == "__main__":
    main()
