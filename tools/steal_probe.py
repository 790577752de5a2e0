#!/usr/bin/env python3
"""Host-contention probe: measure hypervisor steal + per-core throughput
spread under full load, BEFORE trusting a bench run's wall clock.

A shared box can read loadavg 0.1 from inside the guest while the
hypervisor still de-schedules it under load (round 15 measured 12% steal
and a 28% per-core spread at loadavg 0.11 — BASELINE.md §round-15). The
bench's min-of-3 strips transient spikes but not sustained steal, so the
standing rule: only a sub-2% steal reading makes a re-baseline run worth
the wall-clock; otherwise adjudicate on shuffle records and keep the old
table.

Usage: python3 tools/steal_probe.py [seconds] [nprocs]
Exit code 0 if steal < 2% AND spread < 10% (bench-worthy), 1 otherwise.
"""
import multiprocessing as mp
import os
import sys
import time


def _burn(seconds: float) -> int:
    x = 0
    t = time.time()
    while time.time() - t < seconds:
        x += 1
    return x


def _stat():
    with open("/proc/stat") as f:
        return [int(v) for v in f.readline().split()[1:]]


def main() -> int:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    nprocs = int(sys.argv[2]) if len(sys.argv) > 2 else (os.cpu_count() or 1)
    s0 = _stat()
    t0 = time.time()
    with mp.Pool(nprocs) as pool:
        iters = pool.map(_burn, [seconds] * nprocs)
    elapsed = time.time() - t0
    d = [b - a for a, b in zip(s0, _stat())]
    # /proc/stat fields: user nice system idle iowait irq softirq steal ...
    expected = elapsed * os.sysconf("SC_CLK_TCK") * nprocs
    steal_pct = 100.0 * d[7] / expected
    spread_pct = 100.0 * (max(iters) - min(iters)) / max(iters)
    print(f"busy {nprocs}x{seconds:.0f}s: steal {steal_pct:.1f}% of "
          f"expected ticks, per-core throughput spread {spread_pct:.1f}% "
          f"(min {min(iters)} / max {max(iters)} iters)")
    ok = steal_pct < 2.0 and spread_pct < 10.0
    print("bench-worthy window" if ok
          else "contended: adjudicate on shuffle records, skip re-baseline")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
