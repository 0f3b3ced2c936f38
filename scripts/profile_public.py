"""Itemize the warm public deseq()+results() call at the headline shape.

VERDICT r4 weak #1: warm public call is ~1.19 s vs 0.61 s pipeline-only.
This script runs the exact bench path with per-stage profiling enabled
and prints the breakdown for the third (steady-state) call.

Usage:  python scripts/profile_public.py [G] [S]
"""
import os
import sys
import time

os.environ.setdefault("DESEQ2_TPU_X64", "0")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_inputs, _make_dds  # noqa: E402
import deseq2_tpu as dt  # noqa: E402
from deseq2_tpu import profiling  # noqa: E402

G = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
S = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

counts, x, sf, grid = make_inputs(G, S)
dds = _make_dds(counts)


def run():
    fit = dt.deseq(dds, engine="fused")
    res = dt.results(fit)
    return np.asarray(res["stat"]), np.asarray(res["padj"])


t0 = time.perf_counter()
run()
print(f"cold call: {time.perf_counter() - t0:.2f}s", flush=True)
run()

profiling.enable()
for rep in range(3):
    profiling.reset()
    t0 = time.perf_counter()
    run()
    total = time.perf_counter() - t0
    print(f"\n=== rep {rep}: total {total:.3f}s "
          f"({G / total:,.0f} genes/s) ===")
    print(profiling.report())
    accounted = sum(r["seconds"] for r in profiling.records()
                    if r["depth"] == 0)
    print(f"unaccounted: {total - accounted:.3f}s")
