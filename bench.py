"""Headline benchmark: genes/sec for the full DESeq Wald pipeline.

Runs the fused pipeline (size-factor-normalized counts -> gene-wise
dispersion MLE -> parametric trend -> MAP shrinkage -> ridge IRLS ->
Wald statistics -> Cook's distances -> count-outlier replacement +
refit -> Cook's p masking -> independent filtering + BH;
deseq2_tpu/parallel/fused.py:fused_results — the deseq()+results()
equivalent, proven column-identical to the host-exact path by
tests/test_fused_exact.py) on the default bulk configuration from
BASELINE.json: 60k genes x 128 samples, ~condition design
(BENCH_SAMPLES=1024 for the 60k x 1k config).

Baseline: the reference (thelovelab/DESeq2) publishes no formal
throughput benchmark; its vignette claims "less than 30 seconds for most
analyses" on typical bulk datasets (~10-60k genes) on one CPU core
(vignettes/DESeq2.Rmd:723-725).  We take the generous reading — 60,000
genes / 30 s = 2,000 genes/s single-core — as the reference number
(BASELINE.md; R is not present in this image so it cannot be re-measured
here).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

os.environ.setdefault("DESEQ2_TPU_X64", "0")  # f32 fast path on TPU

import numpy as np  # noqa: E402

G = int(os.environ.get("BENCH_GENES", 60000))
S = int(os.environ.get("BENCH_SAMPLES", 128))


def baseline_genes_per_sec(n_samples):
    """Single-core reference genes/s at the benched sample count.

    The 2,000 genes/s number (60k genes / 30 s, vignette claim) covers
    bulk datasets up to ~dozens of samples; we charge it unchanged up to
    S=128 (conservative: generous to the reference).  Beyond that the
    reference's own cost model is linear in the sample count
    (NEWS:179-187, the v1.26 linear-in-n rewrite), so its single-core
    throughput at S>128 scales as 128/S.  R is not in this image, so
    the 60k x 1k single-core number BASELINE.md calls for cannot be
    measured directly; this is the documented extrapolation.
    """
    return 2000.0 * min(1.0, 128.0 / float(n_samples))


def make_inputs(G, S, seed=0):
    rng = np.random.default_rng(seed)
    S2 = S // 2
    x = np.column_stack([np.ones(S), np.repeat([0.0, 1.0], [S2, S - S2])])
    intercept = rng.normal(4.0, 2.0, G)
    mu0 = 2.0 ** intercept
    disp = 4.0 / mu0 + 0.1
    mu = mu0[:, None] * np.ones((1, S))
    size = 1.0 / disp[:, None]
    counts = rng.negative_binomial(size, size / (size + mu)).astype(np.int32)
    sf = np.ones(S)
    grid = np.linspace(np.log(1e-8), np.log(max(10.0, S)), 20)
    return counts, x, sf, grid


def main_sc():
    """Single-cell config (BASELINE #5): BENCH_SC=1, 30k genes x 50k
    cells by default.  Streams the sample axis (parallel/sc.py)."""
    import jax
    import jax.numpy as jnp

    from deseq2_tpu.parallel.sc import fused_sc_pipeline

    Gs = int(os.environ.get("BENCH_GENES", 30000))
    Ss = int(os.environ.get("BENCH_SAMPLES", 50000))
    rng = np.random.default_rng(0)
    cells = (np.arange(Ss) % 2).astype(np.int32)
    mu0 = np.maximum(2.0 ** rng.normal(-1.0, 2.0, Gs), 0.01)  # UMI-scale
    disp = np.minimum(4.0 / mu0 + 0.3, 20.0)

    # NB counts generated on device (gamma-Poisson mixture) in sample
    # chunks: host numpy NB sampling of G*S ~ 1.5e9 values takes minutes
    # and the full-float intermediate would not fit HBM
    ck = next((c for c in (2500, 2048, 2000, 1024, 1000, 512, 500, 128)
               if Ss % c == 0), 2048)

    @jax.jit
    def gen_counts(key, mu0_d, disp_d):
        n_ck = Ss // ck + (Ss % ck > 0)

        def body(buf, xs):
            k, i = xs
            k1, k2 = jax.random.split(k)
            shape = 1.0 / disp_d[:, None]
            lam = jax.random.gamma(k1, shape, (Gs, ck),
                                   dtype=jnp.float32) * (
                disp_d[:, None] * mu0_d[:, None])
            y = jax.random.poisson(k2, lam, dtype=jnp.int32)
            buf = jax.lax.dynamic_update_slice(
                buf, y, (jnp.zeros((), jnp.int32),
                         (i * ck).astype(jnp.int32)))
            return buf, None

        keys = jax.random.split(key, n_ck)
        buf0 = jnp.zeros((Gs, n_ck * ck), jnp.int32)
        buf, _ = jax.lax.scan(body, buf0,
                              (keys, jnp.arange(n_ck, dtype=jnp.int32)))
        return buf[:, :Ss] if n_ck * ck != Ss else buf

    counts_d = gen_counts(jax.random.PRNGKey(0), jnp.asarray(mu0),
                          jnp.asarray(disp))
    # force completion before the pipeline compiles/runs (on the axon
    # platform block_until_ready does not block; a host fetch does)
    _ = np.asarray(counts_d[:2, :8])
    sf = np.ones(Ss)
    grid = np.linspace(np.log(1e-8), np.log(max(10.0, Ss)), 20)
    args = (counts_d, jnp.asarray(cells), jnp.asarray(sf, jnp.float32),
            jnp.asarray(grid, jnp.float32))

    chunk = next((c for c in (2048, 2500, 2000, 1024, 1000, 512, 500)
                  if Ss % c == 0), 2048)

    def run_sync():
        out = fused_sc_pipeline(*args, n_groups=2, chunk=chunk)
        return np.asarray(out["stat"])

    run_sync()
    t0 = time.perf_counter()
    stat = run_sync()
    dt = time.perf_counter() - t0
    assert np.isfinite(stat).any()
    print(json.dumps({
        "metric": f"deseq_sc_genes_per_sec_{Gs}x{Ss}",
        "value": round(Gs / dt, 1), "unit": "genes/s/chip",
        "vs_baseline": round(Gs / dt / baseline_genes_per_sec(Ss), 2),
    }))


def main():
    import jax
    import jax.numpy as jnp

    from deseq2_tpu.parallel.fused import fused_results

    counts, x, sf, grid = make_inputs(G, S)
    counts = jnp.asarray(counts)  # upload once; steady-state = on-device

    def run_sync():
        # fused_results fetches padj to host (the filtering tail), which
        # is the synchronization barrier: on the axon tunnel platform
        # block_until_ready returns before execution completes, so a
        # host fetch is the only reliable barrier
        res = fused_results(counts, x, sf, two_group=True)
        return res["stat"], res["padj"]

    run_sync()  # warmup (compile)

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        stat, padj = run_sync()
    dt = (time.perf_counter() - t0) / reps
    assert np.isfinite(stat).mean() > 0.95
    assert np.isfinite(padj).mean() > 0.5

    genes_per_sec = G / dt
    print(json.dumps({
        "metric": f"deseq_wald_genes_per_sec_{G}x{S}",
        "value": round(genes_per_sec, 1),
        "unit": "genes/s/chip",
        "vs_baseline": round(genes_per_sec / baseline_genes_per_sec(S), 2),
    }))


if __name__ == "__main__":
    sys.exit(main_sc() if os.environ.get("BENCH_SC") == "1" else main())
