"""Roofline / MFU accounting for the bulk Pallas kernels (VERDICT r4
weak #6 / item 5).

At the headline shape (60k genes x 1024 samples, f32) this measures:

1. the HBM floor: a masked count sweep (one (G,S) read) — the time any
   kernel that touches the counts once must pay;
2. the VPU transcendental unit costs: one full (G,S) lgamma sweep and
   one digamma sweep (the dominant per-element work of the dispersion
   line search / grid: src/DESeq2.cpp:52-56, 93-97);
3. each hot Pallas kernel standalone: gene-est line search (fitDisp
   MLE), MAP line search (fitDisp with prior), grid search
   (fitDispGrid), IRLS (fitBeta);
4. the full fused pipeline for reference.

The bound statement: each line-search trip evaluates lp+dlp fused at
one proposed point = ~2 lgamma-class + ~2 digamma-class (G,S) sweeps
plus O(p^2) VPU algebra.  kernel_time / (trips * per-trip transcendental
cost) ~ 1 means the kernel sits at the VPU transcendental bound and
further speedups need FEWER transcendentals (fewer trips / cheaper
polynomials), not better memory behavior.

Prints a JSON block for BENCH_EXTRA_r05.
"""
import json
import os
import sys
import time

os.environ.setdefault("DESEQ2_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import make_inputs  # noqa: E402
from deseq2_tpu.ops.pallas_ls import fit_disp_line_search_pallas  # noqa: E402
from deseq2_tpu.ops.pallas_irls import fit_beta_pallas  # noqa: E402
from deseq2_tpu.ops.pallas_disp import fit_disp_grid_pallas  # noqa: E402
from deseq2_tpu.parallel.fused import fused_results  # noqa: E402

G = int(os.environ.get("BENCH_GENES", 60000))
S = int(os.environ.get("BENCH_SAMPLES", 1024))

counts, x, sf, grid = make_inputs(G, S)
y = jnp.asarray(counts, jnp.float32)
_ = np.asarray(y[:1, :4])   # force upload


def timeit(fn, *args, reps=5, **kw):
    out = fn(*args, **kw)
    jax.tree_util.tree_map(
        lambda a: np.asarray(a).ravel()[:1] if hasattr(a, "shape") else a,
        out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        # host fetch of one element = execution barrier on axon
        jax.tree_util.tree_map(
            lambda a: np.asarray(a).ravel()[:1] if hasattr(a, "shape")
            else a, out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


# ---- 1. HBM floor: one masked (G,S) read ----
@jax.jit
def count_sweep(y):
    return jnp.sum(jnp.where(y > 0, y, 0.0), axis=-1)


t_sweep = timeit(count_sweep, y)
gb = G * S * 4 / 1e9
print(f"count sweep (1x (G,S) read): {t_sweep*1e3:.1f} ms "
      f"-> {gb/t_sweep:.0f} GB/s effective", flush=True)


# ---- 2. transcendental sweeps ----
@jax.jit
def lgamma_sweep(y):
    return jnp.sum(jax.lax.lgamma(y + 3.714), axis=-1)


@jax.jit
def digamma_sweep(y):
    return jnp.sum(jax.lax.digamma(y + 3.714), axis=-1)


t_lg = timeit(lgamma_sweep, y)
t_dg = timeit(digamma_sweep, y)
print(f"lgamma sweep: {t_lg*1e3:.1f} ms ({G*S/t_lg/1e9:.2f} Glgamma/s); "
      f"digamma sweep: {t_dg*1e3:.1f} ms", flush=True)

# ---- 3. kernels standalone (realistic inputs) ----
xd = jnp.asarray(x, jnp.float32)
# group-mean mu (linearMu shape, what the pipeline feeds fitDisp)
grp = (np.arange(S) >= S // 2).astype(np.float32)
gmeans0 = counts[:, : S // 2].mean(1, keepdims=True)
gmeans1 = counts[:, S // 2:].mean(1, keepdims=True)
mu_h = np.maximum(np.where(grp[None, :] > 0, gmeans1, gmeans0), 0.5)
mu = jnp.asarray(mu_h, jnp.float32)
la0 = jnp.asarray(np.full(G, np.log(0.1)), jnp.float32)
pm = la0
t_ls = timeit(fit_disp_line_search_pallas, y, xd, mu, la0, pm,
              jnp.float32(1.0), jnp.float32(np.log(1e-8)),
              maxit=100, use_prior=False, use_cr=True)
iters = fit_disp_line_search_pallas(y, xd, mu, la0, pm, jnp.float32(1.0),
                                    jnp.float32(np.log(1e-8)), maxit=100,
                                    use_prior=False, use_cr=True)["iter"]
mean_iters = float(np.asarray(iters, np.float32).mean())
print(f"LS kernel (gene-est): {t_ls*1e3:.1f} ms, mean iters "
      f"{mean_iters:.1f}", flush=True)

t_map = timeit(fit_disp_line_search_pallas, y, xd, mu, la0, pm,
               jnp.float32(0.25), jnp.float32(np.log(1e-8)),
               maxit=100, use_prior=True, use_cr=True)
print(f"LS kernel (MAP, prior): {t_map*1e3:.1f} ms", flush=True)

t_grid = timeit(fit_disp_grid_pallas, y, xd, mu,
                jnp.asarray(grid, jnp.float32), la0, jnp.float32(1.0),
                use_prior=False, use_cr=True)
print(f"grid kernel: {t_grid*1e3:.1f} ms", flush=True)

alpha = jnp.asarray(np.full(G, 0.1), jnp.float32)
beta0 = jnp.zeros((G, 2), jnp.float32)
ridge = jnp.asarray(np.full(2, 1e-6 / np.log(2) ** 2), jnp.float32)
nf1 = jnp.asarray(np.ones(S), jnp.float32)
t_irls = timeit(fit_beta_pallas, y, xd, nf1, alpha, beta0, ridge,
                maxit=100)
it_b = fit_beta_pallas(y, xd, nf1, alpha, beta0, ridge, maxit=100)["iter"]
mean_it_b = float(np.asarray(it_b, np.float32).mean())
print(f"IRLS kernel: {t_irls*1e3:.1f} ms, mean iters {mean_it_b:.1f}",
      flush=True)

# ---- 4. full pipeline ----
def run_pipe():
    return fused_results(y.astype(jnp.int32), x, sf, two_group=True)["padj"]


t_pipe = timeit(run_pipe, reps=3)
print(f"full fused pipeline: {t_pipe*1e3:.0f} ms "
      f"({G/t_pipe:,.0f} genes/s)", flush=True)

# ---- bound statement ----
# per LS trip: lp+dlp fused at one point = ~2 lgamma-class + 2
# digamma-class (G,S) sweeps (pallas_ls evaluates lgamma_diff and
# digamma_diff of (y + 1/alpha) vs (1/alpha) once per proposal)
per_trip = 2 * t_lg + 2 * t_dg
ls_bound = mean_iters * per_trip
line = {
    "shape": f"{G}x{S}",
    "hbm_read_floor_ms": round(t_sweep * 1e3, 2),
    "hbm_effective_gbps": round(gb / t_sweep, 1),
    "lgamma_sweep_ms": round(t_lg * 1e3, 2),
    "digamma_sweep_ms": round(t_dg * 1e3, 2),
    "ls_kernel_ms": round(t_ls * 1e3, 1),
    "ls_mean_iters": round(mean_iters, 1),
    "ls_transcendental_bound_ms": round(ls_bound * 1e3, 1),
    "ls_pct_of_bound": round(100 * ls_bound / t_ls, 1),
    "map_kernel_ms": round(t_map * 1e3, 1),
    "grid_kernel_ms": round(t_grid * 1e3, 1),
    "irls_kernel_ms": round(t_irls * 1e3, 1),
    "irls_mean_iters": round(mean_it_b, 1),
    "pipeline_ms": round(t_pipe * 1e3, 0),
    "kernel_sum_ms": round((t_ls + t_map + t_grid + t_irls) * 1e3, 1),
}
print(json.dumps(line))
