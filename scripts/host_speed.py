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
  ~3.0-3.7 s  -> slow window (do NOT record bench artifacts)
  the fast-window value is whatever the smallest reading across rounds
  has been; r9's committed sf0.1 artifact (33 s wall) was taken when
  solo q20 ran 1.14 s — re-calibrate against that query if in doubt.
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
