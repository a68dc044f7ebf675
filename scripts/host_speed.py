#!/usr/bin/env python3
"""Host-speed calibration anchor for bench comparability.

The build host's effective CPU speed fluctuates (shared VM): round 9
measured identical code at 33 s and 54 s full-suite wall hours apart,
with ~2% steal — the variance is upstream of the guest. Bench numbers
are only comparable within one speed regime, so every recorded bench
run should note this anchor's reading.

Usage: python3 scripts/host_speed.py [n_probes]
Prints one line per probe: seconds for a fixed 30M-iteration integer
loop on one core. Reference points measured in round 9:
  ~1.4 s      -> fast window (r9's committed artifacts; q20 solo 1.1-1.3 s)
  ~3.0-3.7 s  -> slow window (do NOT record bench artifacts)
A sustained 32-core run drains the credit bucket mid-run (a 1-wide
probe right after a 10-minute bench read 3.35 s; ~45 s of idle
restored 1.4 s), so long benches degrade their own later passes —
best-pass selection absorbs most of it.
"""
import sys
import time

def burn():
    t0 = time.time()
    s = 0
    for i in range(30_000_000):
        s += i * i
    return time.time() - t0

if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    for _ in range(n):
        print(f"{burn():.2f}")
