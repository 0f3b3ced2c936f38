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


def _barrier(out):
    # fetch ONE element of ONE output: execution barrier on axon.
    # (fetching every leaf costs one ~28 ms tunnel RTT each and
    # inflates sub-second kernels by hundreds of ms)
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(leaves[0].ravel()[:1])


def timeit(fn, *args, reps=5, **kw):
    _barrier(fn(*args, **kw))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _barrier(fn(*args, **kw))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


# ---- 0. dispatch/fetch floor over the tunnel (amortized out below) ----
@jax.jit
def tiny(y):
    return y[0, 0]


t_floor = timeit(tiny, y)
print(f"dispatch+fetch floor (tunnel RTT): {t_floor*1e3:.1f} ms",
      flush=True)

K = 16


def scan_k(fn):
    """K data-dependent repetitions inside ONE jit: marginal per-sweep
    cost without the ~35 ms tunnel dispatch floor."""
    @jax.jit
    def run(y):
        def body(acc, _):
            acc = acc + fn(y + acc * 1e-30)
            return acc, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return acc
    return run


# ---- 1. HBM floor: one masked (G,S) read ----
t_sweep = (timeit(scan_k(lambda v: jnp.sum(jnp.where(v > 0, v, 0.0))), y)
           - t_floor) / K
gb = G * S * 4 / 1e9
print(f"count sweep (1x (G,S) read): {t_sweep*1e3:.2f} ms "
      f"-> {gb/t_sweep:.0f} GB/s effective", flush=True)

# ---- 2. transcendental sweeps ----
t_lg = (timeit(scan_k(lambda v: jnp.sum(jax.lax.lgamma(v + 3.714))), y)
        - t_floor) / K
t_dg = (timeit(scan_k(lambda v: jnp.sum(jax.lax.digamma(v + 3.714))), y)
        - t_floor) / K
print(f"lgamma sweep: {t_lg*1e3:.2f} ms ({G*S/t_lg/1e9:.2f} Glgamma/s); "
      f"digamma sweep: {t_dg*1e3:.2f} ms", flush=True)

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
# realistic dispersion init (moments-style) and true-ish alphas so the
# micro runs match the pipeline's convergence behavior
mu0 = counts.mean(1)
alpha_true = np.maximum(4.0 / np.maximum(mu0, 0.05) + 0.1, 1e-4)
la_init = jnp.asarray(np.log(alpha_true).astype(np.float32))

def t_ls_at(maxit):
    return timeit(fit_disp_line_search_pallas, y, xd, mu, la_init,
                  la_init, jnp.float32(1.0), jnp.float32(np.log(1e-8)),
                  maxit=maxit, use_prior=False, use_cr=True)

t_ls = t_ls_at(100)
iters = fit_disp_line_search_pallas(y, xd, mu, la_init, la_init,
                                    jnp.float32(1.0),
                                    jnp.float32(np.log(1e-8)), maxit=100,
                                    use_prior=False, use_cr=True)["iter"]
mean_iters = float(np.asarray(iters, np.float32).mean())
ls_trip = (t_ls_at(10) - t_ls_at(2)) / 8.0
print(f"LS kernel (gene-est): {t_ls*1e3:.1f} ms, mean iters "
      f"{mean_iters:.1f}, per-trip {ls_trip*1e3:.1f} ms", flush=True)

t_map = timeit(fit_disp_line_search_pallas, y, xd, mu, la_init, la_init,
               jnp.float32(0.25), jnp.float32(np.log(1e-8)),
               maxit=100, use_prior=True, use_cr=True)
print(f"LS kernel (MAP, prior): {t_map*1e3:.1f} ms", flush=True)

t_grid = timeit(fit_disp_grid_pallas, y, xd, mu,
                jnp.asarray(grid, jnp.float32), la_init, jnp.float32(1.0),
                use_prior=False, use_cr=True)
print(f"grid kernel (20+20 pts): {t_grid*1e3:.1f} ms", flush=True)

alpha = jnp.asarray(alpha_true.astype(np.float32))
b0h = np.log(np.maximum(mu_h, 0.5))
beta0 = jnp.asarray(np.column_stack(
    [b0h[:, 0], b0h[:, -1] - b0h[:, 0]]).astype(np.float32))
ridge = jnp.asarray(np.full(2, 1e-6 / np.log(2) ** 2), jnp.float32)
nf1 = jnp.asarray(np.ones(S), jnp.float32)

def t_irls_at(maxit):
    return timeit(fit_beta_pallas, y, xd, nf1, alpha, beta0, ridge,
                  maxit=maxit)

# maxit=12 bounds block-level stragglers the way the pipeline's
# warm-started IRLS behaves (p50 iters ~2-8); an uncapped run on this
# synthetic fixture lets a handful of ill-posed genes drag every block
# to 100 trips, which the real pipeline never does
t_irls = t_irls_at(12)
it_b = fit_beta_pallas(y, xd, nf1, alpha, beta0, ridge, maxit=12)["iter"]
mean_it_b = float(np.asarray(it_b, np.float32).mean())
irls_trip = (t_irls_at(10) - t_irls_at(2)) / 8.0
print(f"IRLS kernel (maxit=12): {t_irls*1e3:.1f} ms, mean iters "
      f"{mean_it_b:.1f}, per-trip {irls_trip*1e3:.1f} ms", flush=True)

# ---- 4. full pipeline ----
def run_pipe():
    return fused_results(y.astype(jnp.int32), x, sf, two_group=True)["padj"]


t_pipe = timeit(run_pipe, reps=3)
print(f"full fused pipeline: {t_pipe*1e3:.0f} ms "
      f"({G/t_pipe:,.0f} genes/s)", flush=True)

# ---- bound statement ----
# per LS trip the kernel evaluates lp+dlp fused at one proposed point:
# one lgamma-difference sweep (lgamma(y+1/a) - lgamma(1/a)), one
# digamma-difference sweep, one log/log1p sweep and the p x p Cox-Reid
# Cholesky per gene — call it ~2 lgamma-class + ~2 digamma-class (G,S)
# transcendental passes.  The measured per-trip cost vs that
# transcendental floor is the headroom statement.
per_trip_bound = 2 * t_lg + 2 * t_dg
line = {
    "shape": f"{G}x{S}",
    "dispatch_floor_ms": round(t_floor * 1e3, 1),
    "hbm_read_floor_ms": round(t_sweep * 1e3, 2),
    "hbm_effective_gbps": round(gb / t_sweep, 1),
    "lgamma_sweep_ms": round(t_lg * 1e3, 2),
    "digamma_sweep_ms": round(t_dg * 1e3, 2),
    "ls_kernel_ms": round(t_ls * 1e3, 1),
    "ls_mean_iters": round(mean_iters, 1),
    "ls_per_trip_ms": round(ls_trip * 1e3, 2),
    "ls_trip_transcendental_floor_ms": round(per_trip_bound * 1e3, 2),
    "ls_trip_pct_of_floor": round(100 * per_trip_bound / ls_trip, 1)
    if ls_trip > 0 else None,
    "map_kernel_ms": round(t_map * 1e3, 1),
    "grid_kernel_ms": round(t_grid * 1e3, 1),
    "irls_kernel_ms": round(t_irls * 1e3, 1),
    "irls_mean_iters": round(mean_it_b, 1),
    "irls_per_trip_ms": round(irls_trip * 1e3, 2),
    "pipeline_ms": round(t_pipe * 1e3, 0),
}
print(json.dumps(line))
