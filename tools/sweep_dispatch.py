"""Sweep device-dispatch batch sizes for the LSB and PEE cycles.

Round-3 finding: on the dev tunnel every jitted dispatch carries a fixed
~6-8 ms round-trip cost, so cycle throughput is governed by PIXELS PER
DISPATCH, not per-image size.  Measured (this round, one process per run,
no chip contention):

    LSB 512^2 preplaced : B=128 3.19 GPix/s | B=256 5.47 | B=512 8.07
    PEE 512^2           : B=128 1.79       | B=256 2.20
    PEE 2048^2          : B=8   1.5-1.6    | B=16  2.41  | B=32  3.23
    PEE 640x480 (padded): B=64  0.95-1.09  | B=128 1.64  | B=256 2.22

bench.py's defaults sit at the knee of this curve (B=256 for 512^2-class
workloads) to balance amortization against single-core host prep time; on
production hosts without the tunnel the fixed cost is microseconds and the
curve flattens far earlier.

Run on the real chip, one process at a time:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/sweep_dispatch.py

Prints one JSON line per (workload, batch) with the cycle MPix/s.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench  # noqa: E402


def run() -> None:
    cases = [
        ("lsb_512_packed",
         lambda b: bench._bench_lsb(b, "packed"), (128, 256, 512)),
        ("lsb_512_preplaced",
         lambda b: bench._bench_lsb(b, "preplaced"), (128, 256, 512)),
        ("lsb_2048_packed", bench._bench_big, (8, 16, 32)),
        ("pee_512", bench._bench_pee, (64, 128, 256)),
        ("pee_2048", bench._bench_pee_big, (8, 16, 32)),
        ("pee_odd_640x480", bench._bench_pee_odd, (64, 128, 256)),
    ]
    for name, fn, batches in cases:
        for b in batches:
            try:
                v = fn(b)
            except Exception as exc:
                print(json.dumps({"workload": name, "batch": b,
                                  "error": f"{type(exc).__name__}: {exc}"[:160]}))
                continue
            print(json.dumps({"workload": name, "batch": b,
                              "mpix_s": round(v, 1)}), flush=True)


if __name__ == "__main__":
    run()
