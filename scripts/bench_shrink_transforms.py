"""Wall times for lfcShrink (normal/apeglm/ashr) and the transforms
(vst / rlog) at the headline shape (VERDICT r4 items 4 and 6).

Runs deseq() through the fused engine first (the shrink/transform
inputs), then times each downstream call as a user would issue it.

Usage: python scripts/bench_shrink_transforms.py [G] [S] [--skip ...]
"""
import json
import os
import sys
import time

os.environ.setdefault("DESEQ2_TPU_X64", "0")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_inputs, _make_dds  # noqa: E402
import deseq2_tpu as dt  # noqa: E402

G = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
S = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

counts, x, sf, grid = make_inputs(G, S)
dds = _make_dds(counts)

t0 = time.perf_counter()
fit = dt.deseq(dds, engine="fused")
res = dt.results(fit)
_ = np.asarray(res["padj"])
print(f"deseq+results (fused, cold): {time.perf_counter()-t0:.2f}s",
      flush=True)

out = {"shape": f"{G}x{S}"}


def t(name, fn, reps=2):
    fn()   # warm (compile)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    out[name] = round(float(np.median(ts)), 3)
    print(f"{name}: {out[name]}s", flush=True)


t("lfc_shrink_apeglm_s", lambda: dt.lfc_shrink(fit, coef=2,
                                               type="apeglm"))
t("lfc_shrink_ashr_s", lambda: dt.lfc_shrink(fit, res=res, type="ashr"))
t("lfc_shrink_normal_s",
  lambda: dt.lfc_shrink(fit, contrast=("condition", "B", "A"),
                        type="normal"))
t("vst_s", lambda: dt.vst(dds), reps=1)


def vst_mat():
    v = dt.vst(dds)
    _ = v.matrix            # materialize: the (G,S) tunnel download
    return v


t("vst_plus_materialize_s", vst_mat, reps=1)
t("rlog_s", lambda: dt.rlog(dds), reps=1)


def rlog_mat():
    r = dt.rlog(dds)
    _ = r.matrix
    return r


t("rlog_plus_materialize_s", rlog_mat, reps=1)

print(json.dumps(out))
