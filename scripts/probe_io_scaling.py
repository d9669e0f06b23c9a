"""Spark-free platform probe: per-process memory-read, memory-copy,
and file-write bandwidth at 2 vs 8 concurrent processes.

Motivation (BASELINE.md, 8M seeded-scaling forensics): the 8M-URL
local[2]→local[8] check measured 0.680 against a pre-registered
0.90-0.95 band, with the local[2] leg matching the F+D/c cost model to
0.2% and the local[8] leg carrying ~160 s of reproducible data-plane
excess. This probe isolates which shared box resource stops scaling
when 2 workers become 8: CPU and memory bandwidth scale at 0.95/0.79,
but FILE WRITES collapse ~34x per process (disk writeback throttling)
— the resource an N→4N EXECUTOR cluster scales with node count but a
single sandbox VM shares across all cores. Run in the same window as
any scaling measurement you want to interpret.

Usage: python scripts/probe_io_scaling.py [seconds_per_cell]
Prints one line per (probe, procs) cell + a scaling ratio per probe.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import tempfile
import time

import numpy as np

MB = 512


def w_read(q, seconds: float, mb: int) -> None:
    a = np.arange(mb * 1024 * 1024 // 8, dtype=np.int64)
    t0 = time.time()
    n = 0
    while time.time() - t0 < seconds:
        a.sum()
        n += 1
    q.put(n * a.nbytes / (time.time() - t0))


def w_copy(q, seconds: float, mb: int) -> None:
    a = np.zeros(mb * 1024 * 1024 // 8, dtype=np.int64)
    b = np.ones_like(a)
    t0 = time.time()
    n = 0
    while time.time() - t0 < seconds:
        a[:] = b
        n += 1
    q.put(2 * n * a.nbytes / (time.time() - t0))


def w_file(q, seconds: float, mb: int) -> None:
    buf = os.urandom(64 * 1024 * 1024)
    t0 = time.time()
    n = 0
    while time.time() - t0 < seconds:
        with tempfile.NamedTemporaryFile(dir=tempfile.gettempdir()) as f:
            for _ in range(mb // 64):
                f.write(buf)
            f.flush()
        n += 1
    q.put(n * mb * 1024 * 1024 / (time.time() - t0))


def run(fn, procs: int, seconds: float) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=fn, args=(q, seconds, MB)) for _ in range(procs)]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(rates) / 1e9 / procs  # per-process GB/s


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 12.0
    for name, fn in (("mem-read", w_read), ("mem-copy", w_copy),
                     ("file-write", w_file)):
        per = {}
        for procs in (2, 8):
            per[procs] = run(fn, procs, seconds)
            print(f"{name:10s} {procs} procs: per-proc {per[procs]:.3f} GB/s"
                  f" (aggregate {per[procs] * procs:.1f})")
        print(f"{name:10s} 2->8 per-proc scaling: {per[8] / per[2]:.3f}")


if __name__ == "__main__":
    main()
