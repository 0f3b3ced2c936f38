"""Single-cell scale fused pipeline: sample-axis streaming (BASELINE #5).

At 30k genes x 50k cells a resident (G,S) f32 intermediate is ~6 GB, so
the bulk pipeline's materialize-mu design cannot keep several live
buffers in HBM.  This variant exploits the group-like design structure
(the only design class DESeq2's single-cell path targets): the fitted
mean factorizes as mu[g,s] = q[g, cell(s)] * sf[s], so persistent state
is (G,C) group means plus (G,p) betas, and every per-sample quantity is
recomputed on the fly inside `lax.scan` passes over sample chunks —
counts are the only (G,S) array, read from HBM once per solver sweep.

Math is identical to the bulk fused pipeline (same clamps/convergence
rules; reference: src/DESeq2.cpp:163-465, R/core.R:657-1508) with the
single-cell defaults minmu=1e-6 and no outlier replacement — the
reference disables replacement for its single-cell path
(R/core.R:297-303).

Two entry points:

- `fused_sc_pipeline`: the original single-jit Wald pipeline
  (parametric trend, normal z-test) — kept for the pure-throughput
  Wald configuration.
- `fused_sc_results`: the full single-cell DESeq story as a staged
  orchestrator — fit_type="glmGamPoi" (loc_median_fit trend + QL
  dispersion shrinkage, R/core.R:906-925, 1064-1096) with
  test="LRT" (quasi-likelihood F-test, R/core.R:1898-1947), plus the
  independent-filtering tail (R/results.R:638-718) and optional
  genes-axis `mesh` sharding (the cross-gene reductions — trend, MAD,
  filtering — run in the auto-sharded outer program exactly as the
  bulk path's, SURVEY.md section 2.7).

The per-gene streamed stages (gene-wise dispersion line search, grid
fallback, IRLS) run under `jax.shard_map` when a mesh is supplied:
each shard iterates until ITS genes converge and compacts stragglers
locally, no collectives inside solver loops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.special import erfc, gammaln, polygamma

from ..ops.nb import digamma_diff, lgamma_diff_centered
from .fused import LN2, LOG2E, _bh_adjust, _gamma_trend_fit, _masked_median

DEFAULT_CHUNK = 2048


class _DenseLedger:
    """Trace-time byte ledger for dense straggler blocks.

    Gathering a cascade level's straggler rows into a dense (cap, S)
    buffer beats per-chunk row gathers ~8x per element, but the 2025
    libtpu buffer assignment charges the dense blocks' lifetimes
    against HBM at compile time: granting EVERY level at 30k x 50k put
    one stage program at 17.08 GB on a 15.75 GB chip (the 6 GB counts
    leave no room for a 3.3 GB G/2 block plus its successors).  The
    ledger bounds the total granted inside one stage program instead:
    each jitted stage resets it at trace entry, then every dense site
    asks grant(nbytes) and falls back to the row-gather formulation
    once the stage's budget is spent.  Grant order = trace order =
    cascade order, so the early (largest, most-iterated) levels that
    fit are served first.  Mixed dense/row-gather cascades are exact
    by construction (gather -> identical body -> scatter either way;
    regression-tested with a budget that splits a cascade,
    tests/test_sc.py::test_sc_mixed_dense_budget_exact).

    Budget: DESEQ2_TPU_SC_DENSE_BUDGET bytes per stage program
    (default 2.2 GB — measured fastest at 30k x 50k and leaves >2 GB more headroom than all-dense; 0 disables dense blocks).  Baked at trace time —
    changing the env var mid-process only affects not-yet-compiled
    shapes.
    """

    def __init__(self):
        self.budget = 0
        self.used = 0

    def configure(self):
        import os
        self.budget = int(os.environ.get("DESEQ2_TPU_SC_DENSE_BUDGET",
                                         2_200_000_000))
        self.used = 0

    def reset_stage(self):
        self.used = 0

    def grant(self, nbytes):
        if self.used + nbytes <= self.budget:
            self.used += nbytes
            return True
        return False


_DENSE = _DenseLedger()
_DENSE.configure()


def _gather_rows_streamed(mat, idx, chunk):
    """Row-gather for dense straggler blocks that preserves the
    streaming layout of `mat`.

    A monolithic ``jnp.take(mat, idx, axis=0)`` on the (G, Sp) counts
    makes XLA materialize a second full-size copy of the matrix in the
    row-major layout gathers prefer — the streamed scans read it in
    column-chunk order, so BOTH layouts stay live and the 30k x 50k
    stage programs OOM at compile ("Used 17.08G of 15.75G hbm": a
    5.6 GB ``copy(counts)`` plus its remat-compressed twin, the real
    cause behind the round-4/5 dense-block failures).  Gathering the
    straggler rows chunk-by-chunk along the sample axis reads `mat` in
    the same column-chunk pattern as the scans: the only large buffer
    is the (cap, Sp) dense block itself.
    """
    G, Sp = mat.shape
    n_ck = Sp // chunk      # Sp is chunk-padded by _setup/_setup_x

    def piece(i):
        blk = jax.lax.dynamic_slice_in_dim(mat, i * chunk, chunk, axis=1)
        return jnp.take(blk, idx, axis=0)

    parts = jax.lax.map(piece, jnp.arange(n_ck))
    return jnp.moveaxis(parts, 0, 1).reshape(idx.shape[0], Sp)

__all__ = ["fused_sc_pipeline", "fused_sc_results", "DEFAULT_CHUNK"]


def _setup(counts, cells, size_factors, n_groups, chunk, dtype):
    """Pad to a whole number of sample chunks and build the per-chunk
    stacked small arrays the streamed scans consume."""
    C = p = n_groups
    G, S = counts.shape
    sf = size_factors.astype(dtype)
    cells = cells.astype(jnp.int32)
    n_chunks = -(-S // chunk)
    pad = n_chunks * chunk - S
    counts_p = jnp.pad(counts, ((0, 0), (0, pad))) if pad else counts
    sf_p = jnp.pad(sf, (0, pad), constant_values=1.0)
    cells_p = jnp.pad(cells, (0, pad))
    valid_p = jnp.pad(jnp.ones(S, dtype), (0, pad))
    Sp = S + pad
    # intercept + treatment indicators of the group factor: (Sp, p)
    x_p = jnp.concatenate(
        [jnp.ones((Sp, 1), dtype),
         (cells_p[:, None] == jnp.arange(1, C, dtype=jnp.int32)[None, :]
          ).astype(dtype)], axis=1)
    idxs = jnp.arange(n_chunks, dtype=jnp.int32)
    xs = x_p.reshape(n_chunks, chunk, p)
    return dict(
        counts_p=counts_p, G=G, S=S, Sp=Sp, C=C, p=p, idxs=idxs,
        sfs=sf_p.reshape(n_chunks, chunk),
        cls=cells_p.reshape(n_chunks, chunk),
        vs=valid_p.reshape(n_chunks, chunk),
        xs=xs,
        xxs=(xs[..., :, None] * xs[..., None, :]).reshape(
            n_chunks, chunk, p * p),
        valid_p=valid_p, n_valid=jnp.asarray(S, dtype),
        ridge=jnp.diag(jnp.full(p, 1e-6 / LN2 ** 2, dtype=dtype)))


def _setup_x(counts, x, size_factors, chunk, dtype, norm_factors=None):
    """X-based variant of _setup for arbitrary (small-p) model matrices
    (the reference's glmGamPoi path takes the full model matrix,
    R/core.R:789-816, 1898-1947): no group factorization — the
    persistent per-gene state is a (G,p) beta and mu is recomputed as
    sf * exp(x beta) inside every streamed chunk."""
    G, S = counts.shape
    x = x.astype(dtype)
    p = x.shape[1]
    sf = size_factors.astype(dtype)
    n_chunks = -(-S // chunk)
    pad = n_chunks * chunk - S
    counts_p = jnp.pad(counts, ((0, 0), (0, pad))) if pad else counts
    sf_p = jnp.pad(sf, (0, pad), constant_values=1.0)
    valid_p = jnp.pad(jnp.ones(S, dtype), (0, pad))
    x_p = jnp.pad(x, ((0, pad), (0, 0)))
    Sp = S + pad
    idxs = jnp.arange(n_chunks, dtype=jnp.int32)
    xs = x_p.reshape(n_chunks, chunk, p)
    # padded rows carry x=0, v=0: excluded from every sum
    xtx = jnp.einsum("s,sp,sq->pq", valid_p, x_p, x_p)
    nf_p = None
    if norm_factors is not None:
        nf_p = jnp.pad(norm_factors.astype(dtype), ((0, 0), (0, pad)),
                       constant_values=1.0) if pad \
            else norm_factors.astype(dtype)
    return dict(
        nf_p=nf_p,
        counts_p=counts_p, G=G, S=S, Sp=Sp, p=p, idxs=idxs,
        sfs=sf_p.reshape(n_chunks, chunk),
        vs=valid_p.reshape(n_chunks, chunk),
        xs=xs,
        xxs=(xs[..., :, None] * xs[..., None, :]).reshape(
            n_chunks, chunk, p * p),
        valid_p=valid_p, n_valid=jnp.asarray(S, dtype), xtx=xtx,
        ridge=jnp.diag(jnp.full(p, 1e-6 / LN2 ** 2, dtype=dtype)))


def _make_lp_dlp_x(env, cnt, beta, min_mu, dtype, row_idx=None,
                   tails=None):
    """Streamed dispersion log-posterior + derivative with mu from a
    (g,p) beta: mu = max(sf * exp(x beta), min_mu).  Same math as
    _make_lp_dlp (which gathers group means instead); the Cox-Reid
    X'WX accumulates over the same xxs chunks."""
    p, chunk = env["p"], env["sfs"].shape[1]

    def lp_dlp(la, use_prior, pm, pv):
        g = la.shape[0]
        alpha = jnp.exp(la)
        inv_a = 1.0 / alpha

        def body(carry, xc):
            ll, s1, b, db = carry
            i_c, sf_c, v_c, x_c, xx_c = xc
            y_blk = _chunk_of(cnt, i_c, chunk)
            if row_idx is not None:
                y_blk = jnp.take(y_blk, row_idx, axis=0)
            y_f = y_blk.astype(dtype)
            mu = jnp.maximum(_mu_factor(env, i_c, sf_c, row_idx)
                             * jnp.exp(jnp.dot(
                                 beta, x_c.T,
                                 preferred_element_type=dtype)),
                             min_mu)
            mu = jnp.where(v_c[None, :] > 0, mu, 1.0)
            mua = mu * alpha[:, None]
            r = 1.0 / (1.0 + mua)      # single reciprocal (see group)
            l1p = jnp.log1p(mua)
            if tails is None:
                ll += jnp.sum(v_c[None, :] * (
                    lgamma_diff_centered(y_f, inv_a[:, None])
                    - (y_f + inv_a[:, None]) * l1p), axis=1)
                s1 += jnp.sum(v_c[None, :] * (
                    l1p - mua * r + y_f * (alpha[:, None] * r)
                    - digamma_diff(y_f, inv_a[:, None])), axis=1)
            else:
                ll += jnp.sum(v_c[None, :] * (
                    -(y_f + inv_a[:, None]) * l1p), axis=1)
                s1 += jnp.sum(v_c[None, :] * (
                    l1p - mua * r + y_f * (alpha[:, None] * r)), axis=1)
            w = v_c[None, :] * (mu * r)
            b += jnp.dot(w, xx_c, preferred_element_type=dtype)
            db += jnp.dot(-w * w, xx_c, preferred_element_type=dtype)
            return (ll, s1, b, db), None

        z_pp = jnp.zeros((g, p * p), dtype)
        z_gv = jnp.zeros(g, dtype)
        (ll, s1, b, db), _ = jax.lax.scan(
            body, (z_gv, z_gv, z_pp, z_pp),
            (env["idxs"], env["sfs"], env["vs"], env["xs"], env["xxs"]))
        if tails is not None:
            ks = jnp.arange(tails.shape[1], dtype=dtype)[None, :]
            # lgamma_diff_centered(y,c) = sum_{k<y} log(1 + k/c): per
            # gene that is sum_k tail_k * log1p(k*alpha); digamma_diff
            # = sum_{k<y} 1/(c+k) -> sum_k tail_k/(c+k)
            ll = ll + jnp.sum(tails * jnp.log1p(ks * alpha[:, None]),
                              axis=1)
            s1 = s1 - jnp.sum(tails / (inv_a[:, None] + ks), axis=1)
        bm = b.reshape(g, p, p)
        _, logdet = jnp.linalg.slogdet(bm)
        binv = jnp.linalg.inv(bm)
        tr = jnp.einsum("gij,gji->g", binv, db.reshape(g, p, p))
        lp = ll - 0.5 * logdet
        dlp = (s1 / (alpha * alpha) - 0.5 * tr) * alpha
        if use_prior:
            lp = lp - 0.5 * (la - pm) ** 2 / pv
            dlp = dlp - (la - pm) / pv
        return lp, dlp

    return lp_dlp


def _chunk_of(cnt, i, chunk):
    zero = jnp.zeros((), jnp.int32)
    return jax.lax.dynamic_slice(
        cnt, (zero, (i * chunk).astype(jnp.int32)), (cnt.shape[0], chunk))


def _mu_factor(env, i_c, sf_c, row_idx=None):
    """Per-chunk normalization for mu: the (g, chunk) gene x sample
    normalization-factor block when present (tximport/avgTxLength
    datasets, R/methods.R:286-361 — streamed exactly like the counts),
    else the shared per-sample size-factor row."""
    nf_p = env.get("nf_p")
    if nf_p is None:
        return sf_c[None, :]
    blk = _chunk_of(nf_p, i_c, env["sfs"].shape[1])
    if row_idx is not None:
        blk = jnp.take(blk, row_idx, axis=0)
    return blk


HIST_K = 64   # count-tail histogram width for the low-count fast path


def _count_tails(env, dtype, K=HIST_K):
    """Per-gene count-tail histogram: tails[g, k] = #{s: y[g,s] > k} for
    k < K, over valid samples.

    For integer counts, lgamma(y+c) - lgamma(c) = sum_{k<y} log(c+k)
    and digamma(y+c) - digamma(c) = sum_{k<y} 1/(c+k), so the
    dispersion log-posterior's per-SAMPLE transcendental sums collapse
    into per-GENE sums over the K histogram bins — the line search's
    dominant VPU cost (Lanczos lgamma + digamma series per element per
    sweep) becomes O(K) per gene per sweep.  Exact for genes whose
    counts all fit below K; genes with any y >= K re-run on the generic
    per-sample path (UMI data: a fraction of a percent)."""
    counts_p = env["counts_p"]
    chunk = env["sfs"].shape[1]
    G = counts_p.shape[0]
    ks = jnp.arange(K, dtype=jnp.int32)

    def body(carry, xc):
        tails, mx = carry
        i_c, v_c = xc
        y_c = _chunk_of(counts_p, i_c, chunk)
        yv = jnp.where(v_c[None, :] > 0, y_c, 0)
        # (g, chunk) > k accumulated per k: fori keeps the chunk live
        # without a (g, chunk, K) broadcast temporary
        def kbody(k, t):
            col = jnp.sum((yv > ks[k]).astype(dtype), axis=1)
            cur = jax.lax.dynamic_slice(
                t, (jnp.zeros((), jnp.int32), ks[k]), (t.shape[0], 1))
            return jax.lax.dynamic_update_slice(
                t, cur + col[:, None], (jnp.zeros((), jnp.int32), ks[k]))

        tails = jax.lax.fori_loop(0, K, kbody, tails)
        mx = jnp.maximum(mx, yv.max(axis=1))
        return (tails, mx), None

    (tails, mx), _ = jax.lax.scan(
        body, (jnp.zeros((G, K), dtype), jnp.zeros(G, jnp.int32)),
        (env["idxs"], env["vs"]))
    return tails, mx


def _smap(mesh, f, in_specs, out_specs=None):
    """shard_map over a 1-D 'genes' mesh (identity without a mesh)."""
    if mesh is None or mesh.devices.size <= 1:
        return f
    from jax.sharding import PartitionSpec
    gP = PartitionSpec("genes")
    return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=gP if out_specs is None else out_specs,
                         check_vma=False)


def _gene_spec(mesh):
    from jax.sharding import PartitionSpec
    return PartitionSpec("genes")


# ---------------------------------------------------------------------------
# per-gene streamed solvers (shard-local building blocks)
# ---------------------------------------------------------------------------

def _make_lp_dlp(env, cnt, q_, min_mu, dtype, row_idx=None, tails=None):
    """Streamed fused log-posterior + derivative for a gene block
    (cnt: (G, Sp) resident counts; q_: (g, C) clamped group means;
    row_idx: optional (g,) compacted gene indices).  Compacted
    blocks gather their rows per streamed chunk — gathering from
    the whole (G, Sp) matrix at 30k x 50k makes XLA materialize
    half-matrix slice temporaries (~2.8 GB each) plus a relayout
    copy of the full counts, which OOMs a 16 GB chip.

    `tails`: optional (g, HIST_K) count-tail histogram (_count_tails)
    — the per-sample lgamma/digamma sums then collapse into per-gene
    bin sums, cutting the sweep's VPU cost ~6x.  Only exact for genes
    whose counts are all < HIST_K; the caller re-runs overflow genes
    without tails."""
    p, chunk = env["p"], env["sfs"].shape[1]
    n_valid = env["n_valid"]

    def lp_dlp(la, use_prior, pm, pv):
        g = la.shape[0]
        alpha = jnp.exp(la)
        inv_a = 1.0 / alpha

        def body(carry, xc):
            ll, s1, b, db = carry
            i_c, sf_c, cl_c, v_c, xx_c = xc
            y_blk = _chunk_of(cnt, i_c, chunk)
            if row_idx is not None:
                y_blk = jnp.take(y_blk, row_idx, axis=0)
            y_f = y_blk.astype(dtype)
            mu = jnp.maximum(q_[:, cl_c] * sf_c[None, :], min_mu)
            mu = jnp.where(v_c[None, :] > 0, mu, 1.0)
            mua = mu * alpha[:, None]
            # ONE reciprocal serves every ratio in the sweep (VPU
            # divides dominate at SC scale): w = mu*r, mua/(1+mua) =
            # mua*r, y/(mu + 1/alpha) = y*alpha*r
            r = 1.0 / (1.0 + mua)
            l1p = jnp.log1p(mua)
            # stable difference form (see ops/nb.py:lgamma_diff_centered
            # and ops/disp.py:log_posterior): identical values, no f32
            # catastrophic cancellation at 1/alpha >> y
            if tails is None:
                ll += jnp.sum(v_c[None, :] * (
                    lgamma_diff_centered(y_f, inv_a[:, None])
                    - (y_f + inv_a[:, None]) * l1p), axis=1)
                s1 += jnp.sum(v_c[None, :] * (
                    l1p - mua * r + y_f * (alpha[:, None] * r)
                    - digamma_diff(y_f, inv_a[:, None])), axis=1)
            else:
                ll += jnp.sum(v_c[None, :] * (
                    -(y_f + inv_a[:, None]) * l1p), axis=1)
                s1 += jnp.sum(v_c[None, :] * (
                    l1p - mua * r + y_f * (alpha[:, None] * r)), axis=1)
            w = v_c[None, :] * (mu * r)
            b += jnp.dot(w, xx_c, preferred_element_type=dtype)
            db += jnp.dot(-w * w, xx_c, preferred_element_type=dtype)
            return (ll, s1, b, db), None

        z_pp = jnp.zeros((g, p * p), dtype)
        z_gv = jnp.zeros(g, dtype)
        (ll, s1, b, db), _ = jax.lax.scan(
            body, (z_gv, z_gv, z_pp, z_pp),
            (env["idxs"], env["sfs"], env["cls"], env["vs"], env["xxs"]))
        if tails is not None:
            ks = jnp.arange(tails.shape[1], dtype=dtype)[None, :]
            # lgamma_diff_centered(y,c) = sum_{k<y} log(1 + k/c): per
            # gene that is sum_k tail_k * log1p(k*alpha); digamma_diff
            # = sum_{k<y} 1/(c+k) -> sum_k tail_k/(c+k)
            ll = ll + jnp.sum(tails * jnp.log1p(ks * alpha[:, None]),
                              axis=1)
            s1 = s1 - jnp.sum(tails / (inv_a[:, None] + ks), axis=1)
        bm = b.reshape(g, p, p)
        _, logdet = jnp.linalg.slogdet(bm)
        binv = jnp.linalg.inv(bm)
        tr = jnp.einsum("gij,gji->g", binv, db.reshape(g, p, p))
        lp = ll - 0.5 * logdet
        dlp = (s1 / (alpha * alpha) - 0.5 * tr) * alpha
        if use_prior:
            lp = lp - 0.5 * (la - pm) ** 2 / pv
            dlp = dlp - (la - pm) / pv
        return lp, dlp

    return lp_dlp


def _line_search(env, q_mu, la0, use_prior, pm, pv, maxit, min_disp,
                 min_mu, dtype, make_lp=_make_lp_dlp, tails=None, dense_ok=True):
    """Armijo backtracking ascent (cpp:163-277), streamed, with
    straggler compaction: once the live set fits G//8, gather those
    genes' count rows and finish on the compacted block — tail
    iterations then cost cap/G of a full HBM sweep."""
    G = la0.shape[0]          # may be a compacted sub-problem
    counts_p = env["counts_p"]
    lp_dlp = make_lp(env, counts_p, q_mu, min_mu, dtype, tails=tails)
    lp0, dlp0 = lp_dlp(la0, use_prior, pm, pv)
    eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    tol = jnp.maximum(1e-6, jnp.abs(lp0) * 50.0 * eps)
    min_la = jnp.log(jnp.asarray(min_disp / 10.0, dtype))
    state = (jnp.asarray(0, jnp.int32), la0, jnp.ones_like(la0),
             lp0, dlp0, jnp.zeros(G, jnp.int32),
             jnp.zeros(G, jnp.int32), jnp.zeros(G, dtype),
             jnp.asarray(tol, dtype) * jnp.ones(G, dtype)
             if jnp.ndim(tol) == 0 else tol)

    def make_body(lp_dlp_, pm_, pv_):
        def body(s):
            t, a, kappa, lp, dlp, iters, iacc, donef, tol_ = s
            done = donef > 0.5
            live = ~done
            iters = iters + live.astype(jnp.int32)
            a_pr = a + kappa * dlp
            kappa = jnp.where(a_pr < -30.0, (-30.0 - a) / dlp, kappa)
            kappa = jnp.where(a_pr > 10.0, (10.0 - a) / dlp, kappa)
            a_new = a + kappa * dlp
            lp_new, dlp_next = lp_dlp_(a_new, use_prior, pm_, pv_)
            accept = -lp_new <= -lp - kappa * 1e-4 * dlp * dlp
            upd = live & accept
            iacc = iacc + upd.astype(jnp.int32)
            change = lp_new - lp
            conv = change < tol_
            under = a_new < min_la
            a = jnp.where(upd, a_new, a)
            lp = jnp.where(upd & (conv | ~under), lp_new, lp)
            if jnp.finfo(dtype).eps > 1e-10:
                stalled = live & ~accept & (kappa * dlp * dlp < tol_)
            else:
                stalled = jnp.zeros_like(live)
            newly = (upd & (conv | under)) | stalled
            cont = upd & ~conv & ~under
            dlp = jnp.where(cont, dlp_next, dlp)
            kap = jnp.minimum(kappa * 1.1, 1.0)
            kap = jnp.where(iacc % 5 == 0, kap / 2.0, kap)
            kappa = jnp.where(cont, kap,
                              jnp.where(live & ~accept, kappa / 2.0,
                                        kappa))
            donef = jnp.maximum(donef, newly.astype(dtype))
            return (t + 1, a, kappa, lp, dlp, iters, iacc, donef,
                    tol_)

        return body

    from ..ops.padding import compact_live_indices
    # cascading straggler compaction (the convergence profile has a
    # long tail: ~half the genes finish in the first few sweeps, so a
    # G/2 buffer already halves sweep cost early; identical lockstep
    # semantics — gather -> same body -> scatter, see ops/padding.py)
    caps = []
    prev = G
    for frac in (2, 8, 32):
        c = min(1 << (max(G // frac, 512) - 1).bit_length(), G)
        if c * 2 <= prev:
            caps.append(c)
            prev = c

    def run_phase(s_, body_, stop_at):
        if stop_at is None:
            return jax.lax.while_loop(
                lambda st: (st[0] < maxit) & (jnp.max(1.0 - st[7]) > 0.5),
                body_, s_)
        return jax.lax.while_loop(
            lambda st: (st[0] < maxit) &
            (jnp.sum(1.0 - st[7]) > stop_at), body_, s_)

    body_full = make_body(lp_dlp, pm, pv)
    if not caps:
        s = run_phase(state, body_full, None)
    else:
        outer = []
        s = run_phase(state, body_full, caps[0])
        abs_idx = None
        for ci, cap in enumerate(caps):
            live = s[7] < 0.5
            loc = compact_live_indices(live, cap)
            abs_new = loc if abs_idx is None else abs_idx[loc]
            outer.append((s, loc))
            s = (s[0],) + tuple(v[loc] for v in s[1:])
            abs_idx = abs_new
            pm_c = pm[abs_idx] if jnp.ndim(pm) else pm
            t_sub = None if tails is None else tails[abs_idx]
            if dense_ok and \
                    _DENSE.grant(cap * counts_p.shape[1] * 4):
                # dense straggler block (see _ovf_subproblem): one row
                # gather beats per-chunk gathers ~8x per element.
                # dense_ok=False when make_lp composes a subproblem's
                # row indices (overflow redo): gathering global rows
                # under a composed index map would read the wrong genes
                ck_g = env["sfs"].shape[1]
                cnt_sub = _gather_rows_streamed(counts_p, abs_idx, ck_g)
                env_sub = dict(env, counts_p=cnt_sub)
                if env.get("nf_p") is not None:
                    env_sub["nf_p"] = _gather_rows_streamed(
                        env["nf_p"], abs_idx, ck_g)
                body_sub = make_body(
                    make_lp(env_sub, cnt_sub, q_mu[abs_idx], min_mu,
                            dtype, None, tails=t_sub), pm_c, pv)
            else:
                body_sub = make_body(
                    make_lp(env, counts_p, q_mu[abs_idx], min_mu, dtype,
                            abs_idx, tails=t_sub), pm_c, pv)
            nxt = caps[ci + 1] if ci + 1 < len(caps) else None
            s = run_phase(s, body_sub, nxt)
        for ostate, loc in reversed(outer):
            s = (s[0],) + tuple(
                full.at[loc].set(part)
                for full, part in zip(ostate[1:], s[1:]))
    return dict(log_alpha=s[1], last_lp=s[3], initial_lp=lp0,
                iter=s[5])


def _gene_est_search(env, mu_state, alpha_init, grid, maxit, min_disp,
                     min_mu, dtype, max_disp, make_lp, tails=None, dense_ok=True):
    """Gene-wise dispersion MLE: line search + no-increase rule + grid
    fallback (R/core.R:765-847), shared by the group and X stage-1
    variants and by the overflow redo of the histogram fast path."""
    la0 = jnp.log(alpha_init)
    mle = _line_search(env, mu_state, la0, False, la0,
                       jnp.asarray(1.0, dtype), maxit, min_disp, min_mu,
                       dtype, make_lp=make_lp, tails=tails,
                       dense_ok=dense_ok)
    alpha_mle = jnp.minimum(jnp.exp(mle["log_alpha"]), max_disp)
    no_inc = mle["last_lp"] < mle["initial_lp"] + \
        jnp.abs(mle["initial_lp"]) / 1e6
    dge = jnp.where(no_inc, alpha_init, alpha_mle)
    conv = (mle["iter"] < maxit) & (mle["iter"] != 1)
    need_grid = ~conv & (dge > min_disp * 10)
    dge = _grid_fallback(env, mu_state, grid, dge, need_grid,
                         jnp.zeros_like(dge), jnp.asarray(1.0, dtype),
                         False, min_mu, dtype, make_lp=make_lp,
                         tails=tails)
    return jnp.clip(dge, min_disp, max_disp), mle["iter"]


def _gene_est_hist(env, mu_state, alpha_init, grid, maxit, min_disp,
                   min_mu, dtype, max_disp, base_make, ovf_cap):
    """Gene-est search on the count-tail histogram fast path: run every
    gene with the collapsed lgamma/digamma sums, then re-run the (few)
    genes holding any count >= HIST_K — for which the histogram is
    truncated — on the exact per-sample path, compacted."""
    from ..ops.padding import compact_live_indices
    tails, max_y = _count_tails(env, dtype)
    dge, it = _gene_est_search(env, mu_state, alpha_init, grid, maxit,
                               min_disp, min_mu, dtype, max_disp,
                               base_make, tails=tails)
    if ovf_cap > 0:
        ovf = max_y >= HIST_K
        idx = compact_live_indices(ovf, ovf_cap)
        env_sub, sub_make, sub_dense = _ovf_subproblem(env, idx,
                                                       base_make)
        dge2, it2 = _gene_est_search(env_sub, mu_state[idx],
                                     alpha_init[idx], grid, maxit,
                                     min_disp, min_mu, dtype, max_disp,
                                     sub_make, dense_ok=sub_dense)
        sel = ovf[idx]
        dge = dge.at[idx].set(jnp.where(sel, dge2, dge[idx]))
        it = it.at[idx].set(jnp.where(sel, it2, it[idx]))
    return dge, it


def _ovf_subproblem(env, idx, base_make):
    """Sub-problem environment for the overflow redo.  When the
    compacted block fits a modest buffer, gather its count rows ONCE
    into a dense matrix — the per-chunk row gathers of the row_idx
    path cost ~8x per element (measured: 1.6 s for a 2048-gene redo at
    50k cells vs ~0.2 s dense).  Past the budget (only reachable when
    the histogram path was worth disabling anyway) fall back to the
    gathering formulation."""
    cap = idx.shape[0]
    Sp = env["counts_p"].shape[1]
    itemsize = 4
    if _DENSE.grant(cap * Sp * itemsize):
        ck_g = env["sfs"].shape[1]
        env_sub = dict(env, counts_p=_gather_rows_streamed(
            env["counts_p"], idx, ck_g))
        if env.get("nf_p") is not None:
            env_sub["nf_p"] = _gather_rows_streamed(env["nf_p"], idx,
                                                    ck_g)
        return env_sub, base_make, True

    def sub_make(e, c, ms, mm, dt, ri=None, tails=None):
        return base_make(e, c, ms, mm, dt,
                         idx if ri is None else idx[ri])

    # composed row-index formulation: the inner cascade must NOT take
    # dense blocks (a global-row gather under the composed index map
    # would read the wrong genes)
    return env, sub_make, False


def _map_search(env, mu_state, disp_init, pm, pv, grid, maxit,
                min_disp, min_mu, dtype, max_disp, make_lp, tails=None, dense_ok=True):
    """MAP shrinkage line search + grid fallback (R/core.R:1016-1063)."""
    map_res = _line_search(env, mu_state, jnp.log(disp_init), True, pm,
                           pv, maxit, min_disp, min_mu, dtype,
                           make_lp=make_lp, tails=tails,
                           dense_ok=dense_ok)
    disp_map = jnp.exp(map_res["log_alpha"])
    need = map_res["iter"] >= maxit
    disp_map = _grid_fallback(env, mu_state, grid, disp_map, need, pm,
                              pv, True, min_mu, dtype, make_lp=make_lp,
                              tails=tails)
    return jnp.clip(disp_map, min_disp, max_disp)


def _map_hist(env, mu_state, disp_init, pm, pv, grid, maxit, min_disp,
              min_mu, dtype, max_disp, base_make, ovf_cap):
    """MAP search on the histogram fast path + exact overflow redo."""
    from ..ops.padding import compact_live_indices
    tails, max_y = _count_tails(env, dtype)
    dm = _map_search(env, mu_state, disp_init, pm, pv, grid, maxit,
                     min_disp, min_mu, dtype, max_disp, base_make,
                     tails=tails)
    if ovf_cap > 0:
        ovf = max_y >= HIST_K
        idx = compact_live_indices(ovf, ovf_cap)
        env_sub, sub_make, sub_dense = _ovf_subproblem(env, idx,
                                                       base_make)
        dm2 = _map_search(env_sub, mu_state[idx], disp_init[idx],
                          pm[idx], pv, grid, maxit, min_disp, min_mu,
                          dtype, max_disp, sub_make,
                          dense_ok=sub_dense)
        dm = dm.at[idx].set(jnp.where(ovf[idx], dm2, dm[idx]))
    return dm


def _grid_fallback(env, q_mu, grid, disp_cur, need, pm, pv, use_prior,
                   min_mu, dtype, make_lp=_make_lp_dlp, tails=None):
    """Two-stage grid search (cpp:468-513) on the `need` genes only
    (compacted)."""
    from ..ops.padding import compact_live_indices
    G = disp_cur.shape[0]     # may be a compacted sub-problem
    cap = min(1 << (max(G // 16, 256) - 1).bit_length(), G)

    def grid_search_subset(idx, pm_, pv_):
        lp_dlp = make_lp(env, env["counts_p"], q_mu[idx], min_mu,
                         dtype, idx,
                         tails=None if tails is None else tails[idx])
        g = idx.shape[0]
        pm_c = pm_[idx] if jnp.ndim(pm_) else pm_

        def argmax_over(points):
            def body(carry, la_j):
                best_lp, best_a = carry
                lp, _ = lp_dlp(la_j, use_prior, pm_c, pv_)
                better = lp > best_lp
                return (jnp.where(better, lp, best_lp),
                        jnp.where(better, la_j, best_a)), None

            init = (jnp.full(g, -jnp.inf, dtype), jnp.zeros(g, dtype))
            (_, best_a), _ = jax.lax.scan(body, init, points)
            return best_a

        gridv = grid.astype(dtype)
        coarse = jnp.broadcast_to(gridv[:, None], (gridv.shape[0], g))
        a_hat = argmax_over(coarse)
        delta = gridv[1] - gridv[0]
        frac = jnp.linspace(0.0, 1.0, gridv.shape[0], dtype=dtype)
        fine = a_hat[None, :] - delta + 2.0 * delta * frac[:, None]
        return argmax_over(fine)

    def run(_):
        idx = compact_live_indices(need, cap)
        la = grid_search_subset(idx, pm, pv)
        new = jnp.where(need[idx], jnp.exp(la), disp_cur[idx])
        return disp_cur.at[idx].set(new)

    # over-capacity overflow: two passes cover 2*cap genes; beyond
    # that (pathological) the remainder keeps the line-search value
    def run2(_):
        d1 = run(None)
        still = need & (d1 == disp_cur)
        idx = compact_live_indices(still, cap)
        la = grid_search_subset(idx, pm, pv)
        new = jnp.where(still[idx], jnp.exp(la), d1[idx])
        return d1.at[idx].set(new)

    n = jnp.sum(need)
    return jax.lax.cond(
        n == 0, lambda _: disp_cur,
        lambda _: jax.lax.cond(n > cap, run2, run, operand=None),
        operand=None)


# ---------------------------------------------------------------------------
# staged jitted pipeline pieces
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_groups", "maxit", "min_disp_pow",
                                   "min_mu", "chunk", "mesh", "use_hist",
                                   "ovf_cap"))
def _sc_stage1(counts, cells, size_factors, grid, n_groups, maxit=100,
               min_disp_pow=-8, min_mu=1e-6, chunk=DEFAULT_CHUNK,
               mesh=None, use_hist=False, ovf_cap=0):
    """Base stats + group means + gene-wise dispersion MLE
    (R/core.R:657-860).  Returns only (G,) / (G,C) summaries."""
    _DENSE.reset_stage()
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    G, S = counts.shape
    p = n_groups
    min_disp = 10.0 ** min_disp_pow
    max_disp = jnp.maximum(10.0, S).astype(dtype)
    env0 = _setup(counts, cells, size_factors, n_groups, chunk, dtype)
    C = n_groups
    xim = jnp.sum(jnp.where(env0["valid_p"] > 0,
                            1.0 / env0["sfs"].reshape(-1), 0.0)) \
        / env0["n_valid"]

    def per_gene(counts_p):
        env = dict(env0, counts_p=counts_p)
        n_valid = env["n_valid"]
        g_loc = counts_p.shape[0]
        z_g = jnp.zeros(g_loc, dtype)

        # ---- base stats + group means q (g,C): one streamed pass ----
        def stats_body(carry, xc):
            s_yn, s_yn2, s_qn, tot, n_c, s_lq = carry
            i_c, sf_c, cl_c, v_c = xc
            y_c = _chunk_of(counts_p, i_c, chunk)
            yn = y_c.astype(dtype) / sf_c[None, :]
            oh = (jax.nn.one_hot(cl_c, C, dtype=dtype) * v_c[:, None])
            s_yn += yn.sum(axis=1)
            s_yn2 += (yn * yn).sum(axis=1)
            s_qn += jnp.dot(yn * v_c[None, :], oh,
                            preferred_element_type=dtype)      # (g,C)
            tot += y_c.astype(dtype).sum(axis=1)
            n_c += oh.sum(axis=0)
            s_lq += jnp.dot(jnp.log(yn + 0.1), oh,
                            preferred_element_type=dtype)
            return (s_yn, s_yn2, s_qn, tot, n_c, s_lq), None

        (s_yn, s_yn2, q_num, tot, n_c, s_lq), _ = jax.lax.scan(
            stats_body, (z_g, z_g, jnp.zeros((g_loc, C), dtype), z_g,
                         jnp.zeros(C, dtype), jnp.zeros((g_loc, C), dtype)),
            (env["idxs"], env["sfs"], env["cls"], env["vs"]))
        base_mean = s_yn / n_valid
        base_var = (s_yn2 - n_valid * base_mean ** 2) / (n_valid - 1.0)
        all_zero = tot == 0
        q = q_num / n_c[None, :]          # (g,C) normalized group means
        logq = s_lq / n_c[None, :]        # group means of log(yn + 0.1)

        # ---- dispersion init (R/core.R:709-728) ----
        q_ls = jnp.maximum(q, 1.0)

        def rough_body(acc, xc):
            i_c, sf_c, cl_c, v_c = xc
            y_c = _chunk_of(counts_p, i_c, chunk)
            yn = y_c.astype(dtype) / sf_c[None, :]
            mu_ls = q_ls[:, cl_c]
            acc += jnp.sum(v_c[None, :] * ((yn - mu_ls) ** 2 - mu_ls)
                           / mu_ls ** 2, axis=1)
            return acc, None

        rough_sum, _ = jax.lax.scan(
            rough_body, z_g,
            (env["idxs"], env["sfs"], env["cls"], env["vs"]))
        rough = jnp.maximum(rough_sum / (S - p), 0.0)
        moments = (base_var - xim * base_mean) / base_mean ** 2
        alpha_init = jnp.minimum(rough,
                                 jnp.where(all_zero, rough, moments))
        alpha_init = jnp.clip(jnp.where(jnp.isnan(alpha_init), min_disp,
                                        alpha_init), min_disp, max_disp)

        # mu for dispersion fitting: q gather * sf, clamped (linearMu
        # fast path — exact for the group design; R/core.R:754-764)
        q_mu = jnp.where(all_zero[:, None], 1.0, q)

        if use_hist:
            dge, dgi = _gene_est_hist(env, q_mu, alpha_init, grid, maxit,
                                      min_disp, min_mu, dtype, max_disp,
                                      _make_lp_dlp, ovf_cap)
        else:
            dge, dgi = _gene_est_search(env, q_mu, alpha_init, grid,
                                        maxit, min_disp, min_mu, dtype,
                                        max_disp, _make_lp_dlp)
        return dict(base_mean=base_mean, base_var=base_var,
                    all_zero=all_zero, disp_gene_est=dge,
                    disp_gene_iter=dgi, q=q, logq=logq)

    if mesh is not None and mesh.devices.size > 1:
        gP = _gene_spec(mesh)
        out = _smap(mesh, per_gene, (gP,),
                    dict(base_mean=gP, base_var=gP, all_zero=gP,
                         disp_gene_est=gP, disp_gene_iter=gP, q=gP,
                         logq=gP))(
            env0["counts_p"])
    else:
        out = per_gene(env0["counts_p"])
    return out


@partial(jax.jit, static_argnames=("n_groups", "maxit", "min_disp_pow",
                                   "min_mu", "chunk", "mesh", "use_hist",
                                   "ovf_cap"))
def _sc_stage_map(counts, cells, size_factors, grid, q, all_zero,
                  disp_gene_est, disp_fit, disp_prior_var, n_groups,
                  maxit=100, min_disp_pow=-8, min_mu=1e-6,
                  chunk=DEFAULT_CHUNK, mesh=None, use_hist=False,
                  ovf_cap=0):
    """DESeq2-type MAP shrinkage line search with the log-normal prior
    (R/core.R:1016-1063)."""
    _DENSE.reset_stage()
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    G, S = counts.shape
    min_disp = 10.0 ** min_disp_pow
    max_disp = jnp.maximum(10.0, S).astype(dtype)
    env0 = _setup(counts, cells, size_factors, n_groups, chunk, dtype)

    def per_gene(counts_p, q_l, all_zero_l, dge_l, fit_l):
        env = dict(env0, counts_p=counts_p)
        q_mu = jnp.where(all_zero_l[:, None], 1.0, q_l)
        disp_init = jnp.where(dge_l > 0.1 * fit_l, dge_l, fit_l)
        pm = jnp.log(fit_l)
        if use_hist:
            return _map_hist(env, q_mu, disp_init, pm, disp_prior_var,
                             grid, maxit, min_disp, min_mu, dtype,
                             max_disp, _make_lp_dlp, ovf_cap)
        return _map_search(env, q_mu, disp_init, pm, disp_prior_var,
                           grid, maxit, min_disp, min_mu, dtype,
                           max_disp, _make_lp_dlp)

    if mesh is not None and mesh.devices.size > 1:
        gP = _gene_spec(mesh)
        return _smap(mesh, per_gene, (gP, gP, gP, gP, gP))(
            env0["counts_p"], q, all_zero, disp_gene_est, disp_fit)
    return per_gene(env0["counts_p"], q, all_zero, disp_gene_est,
                    disp_fit)


def _make_glm_per_gene(env0, maxit, min_mu, dtype,
                       with_reduced, with_loglik):
    """Factory for the streamed IRLS per-gene stage, shared by the
    group-design and arbitrary-X entry points (env0 from _setup or
    _setup_x; beta0 supplied by the caller)."""
    p = env0["p"]
    chunk = env0["sfs"].shape[1]

    def per_gene(counts_p, beta0, all_zero_l, alpha_l, base_mean_l,
                 llaf_l, llar_l, nf_loc=None):
        env = dict(env0, counts_p=counts_p)
        if nf_loc is not None:
            env["nf_p"] = nf_loc
        g_loc = counts_p.shape[0]
        z_g = jnp.zeros(g_loc, dtype)
        n_valid = env["n_valid"]
        ridge = env["ridge"]

        y_alpha = jnp.where(all_zero_l, 1.0, alpha_l)
        size = 1.0 / y_alpha

        eps = jnp.finfo(dtype).eps
        beta_tol = jnp.maximum(1e-8, 30.0 * eps)

        def make_irls(dcl, row_idx, with_const=False, cnt=None,
                      env_l=None):
            """IRLS closures for the full batch (row_idx=None) or a
            compacted straggler block.

            ONE streamed sweep per iteration: the sweep at beta_k yields
            both the deviance of beta_k (the convergence test the
            reference applies to successive iterates, cpp:365-382 —
            shifted by one sweep, identical dev/beta sequences) and the
            normal equations producing beta_{k+1}.  The two-sweep
            formulation (A,r at beta; then deviance at beta_new) reads
            the counts from HBM twice per iteration for the same
            numbers.  with_const=True additionally accumulates the
            beta-independent lgamma deviance constant in the same sweep
            (saves the separate dev_const pass)."""
            d_size, d_alpha, d_devc = dcl
            cnt_src = counts_p if cnt is None else cnt
            env_src = env if env_l is None else env_l

            def irls_pass(beta):
                def body(carry, xc):
                    A, r, dev, dc = carry
                    i_c, sf_c, v_c, x_c, xx_c = xc
                    y_blk = _chunk_of(cnt_src, i_c, chunk)
                    if row_idx is not None:
                        y_blk = jnp.take(y_blk, row_idx, axis=0)
                    y_f = y_blk.astype(dtype)
                    nfc = _mu_factor(env_src, i_c, sf_c, row_idx)
                    mu = jnp.maximum(nfc * jnp.exp(beta @ x_c.T),
                                     min_mu)
                    lm = jnp.log(mu)
                    mua = d_alpha[:, None] * mu
                    # one reciprocal: w = mu*rr, and w*z folds to
                    # rr*(mu*log(mu/nf) + y - mu) with no divides
                    rr = 1.0 / (1.0 + mua)
                    w = v_c[None, :] * (mu * rr)
                    wz = v_c[None, :] * rr * (
                        mu * (lm - jnp.log(nfc)) + y_f - mu)
                    A += jnp.dot(w, xx_c, preferred_element_type=dtype)
                    r += jnp.dot(wz, x_c, preferred_element_type=dtype)
                    # stable difference form of the NB deviance:
                    # ll_s = D(y,size) - lgamma(y+1) + y*log(mu)
                    #        - (y+size)*log1p(mu*alpha)
                    # (identical value to cpp:365-382's expression; the
                    # direct gammaln(y+size) form cancels
                    # catastrophically in f32 at size = 1/alpha >> y)
                    t = jnp.where(y_f > 0.0, y_f * lm, 0.0)
                    l1p = jnp.log1p(mua)
                    dev += -2.0 * jnp.sum(v_c[None, :] * (
                        t - (y_f + d_size[:, None]) * l1p), axis=1)
                    if with_const:
                        dc += jnp.sum(v_c[None, :] * (
                            lgamma_diff_centered(y_f, d_size[:, None])
                            - gammaln(y_f + 1.0)), axis=1)
                    return (A, r, dev, dc), None

                g_b = beta.shape[0]
                (A, r, dev, dc), _ = jax.lax.scan(
                    body, (jnp.zeros((g_b, p * p), dtype),
                           jnp.zeros((g_b, p), dtype),
                           jnp.zeros(g_b, dtype), jnp.zeros(g_b, dtype)),
                    (env["idxs"], env["sfs"], env["vs"], env["xs"],
                     env["xxs"]))
                if with_const:
                    return A.reshape(g_b, p, p), r, dev, dc
                return A.reshape(g_b, p, p), r, d_devc + dev

            def body(s):
                (k, beta_prev, beta, dev_prev, iters, dev_out, A_out,
                 activef) = s
                active = activef > 0.5
                A, r, dev_cur = irls_pass(beta)
                dev_out = jnp.where(active, dev_cur, dev_out)
                A_out = jnp.where(active[:, None, None], A, A_out)
                ct = jnp.abs(dev_cur - dev_prev) / (jnp.abs(dev_cur) + 0.1)
                bad = jnp.isnan(ct)
                convd = (k > 1) & (ct < beta_tol)
                if eps > 1e-10:  # f32-only beta-stall exit (ops/irls.py)
                    dbeta = jnp.max(jnp.abs(beta - beta_prev), axis=1)
                    bmax = jnp.max(jnp.abs(beta), axis=1)
                    convd = convd | ((k > 1) &
                                     (dbeta < 32.0 * eps * (1.0 + bmax)))
                iters = jnp.where(active & bad, maxit, iters)
                solve_now = active & ~convd & ~bad & (k < maxit)
                beta_new = jnp.linalg.solve(A + ridge[None],
                                            r[..., None])[..., 0]
                diverged = jnp.max(jnp.abs(beta_new), axis=1) > 30.0
                beta_prev_out = beta
                beta = jnp.where(solve_now[:, None], beta_new, beta)
                iters = iters + solve_now.astype(jnp.int32)
                iters = jnp.where(solve_now & diverged, maxit, iters)
                active_next = solve_now & ~diverged
                dev_prev = jnp.where(active, dev_cur, dev_prev)
                return (k + 1, beta_prev_out, beta, dev_prev, iters,
                        dev_out, A_out, active_next.astype(dtype))

            return irls_pass, body

        def irls_cond(s):
            return (s[0] <= maxit) & (jnp.max(s[7]) > 0.5)

        from ..ops.padding import compact_live_indices
        # cascading straggler caps (the IRLS convergence profile is as
        # long-tailed as the line search's): each compaction phase
        # gathers the live set into a dense block when the row budget
        # allows (one gather beats per-chunk gathers ~8x/element)
        caps = []
        prev = g_loc
        for frac in (4, 16, 64):
            c = min(1 << (max(g_loc // frac, 512) - 1).bit_length(),
                    g_loc)
            if c * 2 <= prev:
                caps.append(c)
                prev = c

        # ---- sweep 0 outside the loop, fused with the deviance
        # constant (no convergence test at k=0 anyway) ----
        pass0, _ = make_irls((size, y_alpha, None), None, with_const=True)
        A0, r0, dev0_core, dc = pass0(beta0)
        # in the stable regrouping the n*size*log(size) and
        # n*gammaln(size) terms cancel into the per-sample differences
        dev_const = -2.0 * dc
        dev0 = dev_const + dev0_core
        # same k=0 bookkeeping the loop body would do: no convergence
        # test, NaN deviance -> iter=maxit and keep beta0, otherwise
        # solve and count it, divergence stamps maxit
        bad0 = jnp.isnan(dev0)
        beta1 = jnp.linalg.solve(A0 + ridge[None], r0[..., None])[..., 0]
        div0 = jnp.max(jnp.abs(beta1), axis=1) > 30.0
        solve0 = ~bad0
        beta_a = jnp.where(solve0[:, None], beta1, beta0)
        iters0 = solve0.astype(jnp.int32)
        iters0 = jnp.where(bad0 | (solve0 & div0), maxit, iters0)
        active0 = (solve0 & ~div0).astype(dtype)
        state = (jnp.asarray(1, jnp.int32), beta0, beta_a, dev0,
                 iters0, dev0, A0, active0)

        data_full = (size, y_alpha, dev_const)
        _, body_full = make_irls(data_full, None)

        def run_phase(s_, body_, stop_at):
            if stop_at is None:
                return jax.lax.while_loop(irls_cond, body_, s_)
            return jax.lax.while_loop(
                lambda s: (s[0] <= maxit) & (jnp.sum(s[7]) > stop_at),
                body_, s_)

        if not caps:
            state = run_phase(state, body_full, None)
        else:
            outer = []
            state = run_phase(state, body_full, caps[0])
            abs_idx = None
            Sp_bytes = env["counts_p"].shape[1] * 4
            for ci, cap in enumerate(caps):
                live = state[7] > 0.5
                loc = compact_live_indices(live, cap)
                abs_new = loc if abs_idx is None else abs_idx[loc]
                outer.append((state, loc))
                state = (state[0],) + tuple(v[loc] for v in state[1:])
                abs_idx = abs_new
                data_sub = tuple(v[abs_idx] for v in data_full)
                if _DENSE.grant(cap * Sp_bytes):
                    ck_g = env["sfs"].shape[1]
                    cnt_sub = _gather_rows_streamed(counts_p, abs_idx,
                                                    ck_g)
                    env_sub = dict(env, counts_p=cnt_sub)
                    if env.get("nf_p") is not None:
                        env_sub["nf_p"] = _gather_rows_streamed(
                            env["nf_p"], abs_idx, ck_g)
                    _, body_sub = make_irls(data_sub, None, cnt=cnt_sub,
                                            env_l=env_sub)
                else:
                    _, body_sub = make_irls(data_sub, abs_idx)
                nxt = caps[ci + 1] if ci + 1 < len(caps) else None
                state = run_phase(state, body_sub, nxt)
            for ostate, loc in reversed(outer):
                state = (state[0],) + tuple(
                    full.at[loc].set(part)
                    for full, part in zip(ostate[1:], state[1:]))
        _, _, beta, _, beta_iter, deviance, A, _ = state

        # post-fit sigma sandwich diagonal (cpp:429-455) from the A of
        # the last swept beta (== final beta for converged/maxit rows;
        # pre-divergence beta for diverged rows, matching the host
        # kernel's kept-mu rule)
        Ainv = jnp.linalg.inv(A + ridge[None])
        sigma = Ainv @ A @ Ainv
        beta_var = jnp.diagonal(sigma, axis1=1, axis2=2)

        out = dict(beta=beta, beta_var=beta_var, beta_iter=beta_iter,
                   deviance=deviance)

        if with_loglik or with_reduced:
            # R-recomputed log-likelihoods at the UNclamped mu
            # (nbinomLogLike, R/core.R:2208-2230); gathered per gene in
            # one streamed pass (mu_reduced = baseMean*sf is the
            # intercept closed form, R/fitNbinomGLMs.R:99-137)
            af = jnp.where(all_zero_l, 1.0, llaf_l)
            ar = jnp.where(all_zero_l, 1.0, llar_l)
            szf, szr = 1.0 / af, 1.0 / ar

            def ll_body(acc, xc):
                ll_f, ll_r, ll_d = acc
                i_c, sf_c, v_c, x_c = xc
                y_f = _chunk_of(counts_p, i_c, chunk).astype(dtype)

                def row_terms(mu, inv_a, alp):
                    # stable difference form (same derivation as the
                    # deviance above): the final dispersion can sit at
                    # min_disp so 1/alpha reaches 1e8 and the direct
                    # gammaln(y+size) form destroys the QL F statistic
                    # in f32
                    t = jnp.where(y_f > 0.0, y_f * jnp.log(mu), 0.0)
                    return (lgamma_diff_centered(y_f, inv_a[:, None])
                            - gammaln(y_f + 1.0) + t
                            - (y_f + inv_a[:, None])
                            * jnp.log1p(mu * alp[:, None]))

                nfc = _mu_factor(env, i_c, sf_c)
                mu_f = nfc * jnp.exp(beta @ x_c.T)
                mu_f = jnp.where(v_c[None, :] > 0, mu_f, 1.0)
                tf = row_terms(mu_f, szf, af)
                ll_f += jnp.sum(v_c[None, :] * tf, axis=1)
                if with_reduced:
                    mu_r = base_mean_l[:, None] * nfc
                    mu_r = jnp.where(v_c[None, :] > 0,
                                     jnp.where(all_zero_l[:, None], 1.0,
                                               mu_r), 1.0)
                    tr = row_terms(mu_r, szr, ar)
                    ll_r += jnp.sum(v_c[None, :] * tr, axis=1)
                    # the LRT/QL statistic consumes ll_full - ll_reduced:
                    # accumulated ELEMENTWISE the difference is O(1) per
                    # sample, so its f32 sum keeps ~1e-4 absolute
                    # accuracy where (big sum) - (big sum) cancels to
                    # ~0.1 — the main f32 amplifier of the F statistic
                    ll_d += jnp.sum(v_c[None, :] * (tf - tr), axis=1)
                return (ll_f, ll_r, ll_d), None

            (ll_full, ll_red, ll_diff), _ = jax.lax.scan(
                ll_body, (z_g, z_g, z_g),
                (env["idxs"], env["sfs"], env["vs"], env["xs"]))
            out["ll_full"] = ll_full
            if with_reduced:
                out["ll_reduced"] = ll_red
                out["ll_diff"] = ll_diff
        return out

    return per_gene


@partial(jax.jit, static_argnames=("n_groups", "maxit", "min_disp_pow",
                                   "min_mu", "chunk", "mesh",
                                   "with_reduced", "with_loglik"))
def _sc_stage_glm(counts, cells, size_factors, logq, all_zero, dispersion,
                  base_mean, ll_alpha_full=None, ll_alpha_red=None,
                  n_groups=None, maxit=100, min_disp_pow=-8,
                  min_mu=1e-6, chunk=DEFAULT_CHUNK, mesh=None,
                  with_reduced=False, with_loglik=False):
    """Streamed ridge IRLS + sandwich SEs (cpp:282-465, R/core.R:1400-
    1508); optionally the intercept-only reduced model's closed form
    and the R-recomputed (unclamped-mu) log-likelihoods for LRT/QL.

    `dispersion` weights the IRLS; the full-model logLike uses
    `ll_alpha_full` (reference quirk: nbinomLogLike runs at
    dispersions(object) even when the betas were fit at the trend,
    R/fitNbinomGLMs.R:180-182) and the reduced closed form uses
    `ll_alpha_red` (= alpha_hat, R/fitNbinomGLMs.R:103-114)."""
    _DENSE.reset_stage()
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    G, S = counts.shape
    p = n_groups
    env0 = _setup(counts, cells, size_factors, n_groups, chunk, dtype)
    if ll_alpha_full is None:
        ll_alpha_full = dispersion
    if ll_alpha_red is None:
        ll_alpha_red = dispersion

    per_gene = _make_glm_per_gene(env0, maxit, min_mu, dtype,
                                  with_reduced, with_loglik)

    beta0 = jnp.concatenate([logq[:, :1], logq[:, 1:] - logq[:, :1]],
                            axis=1)
    if mesh is not None and mesh.devices.size > 1:
        gP = _gene_spec(mesh)
        return _smap(mesh, per_gene, (gP, gP, gP, gP, gP, gP, gP))(
            env0["counts_p"], beta0, all_zero, dispersion, base_mean,
            ll_alpha_full, ll_alpha_red)
    return per_gene(env0["counts_p"], beta0, all_zero, dispersion,
                    base_mean, ll_alpha_full, ll_alpha_red)



@partial(jax.jit, static_argnames=("maxit", "min_disp_pow", "min_mu",
                                   "chunk", "mesh", "use_hist",
                                   "ovf_cap"))
def _sc_stage1_x(counts, x, size_factors, grid, norm_factors=None,
                 maxit=100, min_disp_pow=-8, min_mu=1e-6,
                 chunk=DEFAULT_CHUNK, mesh=None, use_hist=False,
                 ovf_cap=0):
    """Arbitrary-design gene-wise stage at single-cell scale: base
    stats + rough/moments init + a streamed GLM fit at the initial
    dispersions for mu + the dispersion MLE line search — the covariate
    equivalent of _sc_stage1 (R/core.R:657-860 with linearMu=False).
    Persistent state per gene: the (G,p) mu betas, never a (G,S)."""
    _DENSE.reset_stage()
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    G, S = counts.shape
    x = x.astype(dtype)
    p = x.shape[1]
    min_disp = 10.0 ** min_disp_pow
    max_disp = jnp.maximum(10.0, S).astype(dtype)
    env0 = _setup_x(counts, x, size_factors, chunk, dtype,
                    norm_factors=norm_factors)
    if norm_factors is None:
        xim = jnp.sum(jnp.where(env0["valid_p"] > 0,
                                1.0 / env0["sfs"].reshape(-1), 0.0)) \
            / env0["n_valid"]
    else:
        # momentsDispEstimate xim with gene x sample factors
        # (R/core.R:2440-2444): mean over samples of 1/colMeans(nf)
        xim = jnp.mean(1.0 / jnp.mean(norm_factors.astype(dtype),
                                      axis=0))
    # the host inits the mu GLM via QR on log(normCounts + 0.1)
    # (fitNbinomGLMs.R:139-155); Q is (S,p) — computed once
    q_m, r_m = jnp.linalg.qr(x)
    q_pad = jnp.pad(q_m, ((0, env0["Sp"] - S), (0, 0)))
    qs = q_pad.reshape(-1, chunk, p)

    def per_gene(counts_p, nf_loc=None):
        env = dict(env0, counts_p=counts_p)
        if nf_loc is not None:
            env["nf_p"] = nf_loc
        n_valid = env["n_valid"]
        g_loc = counts_p.shape[0]
        z_g = jnp.zeros(g_loc, dtype)

        # ---- pass 1: base stats + X-projections of norm counts ----
        def stats_body(carry, xc):
            s_yn, s_yn2, tot, xty, qty = carry
            i_c, sf_c, v_c, x_c, q_c = xc
            y_c = _chunk_of(counts_p, i_c, chunk)
            yn = y_c.astype(dtype) / _mu_factor(env, i_c, sf_c)
            ynv = yn * v_c[None, :]
            s_yn += ynv.sum(axis=1)
            s_yn2 += (ynv * yn).sum(axis=1)
            tot += (y_c.astype(dtype) * v_c[None, :]).sum(axis=1)
            xty += jnp.dot(ynv, x_c, preferred_element_type=dtype)
            qty += jnp.dot(v_c[None, :] * jnp.log(yn + 0.1), q_c,
                           preferred_element_type=dtype)
            return (s_yn, s_yn2, tot, xty, qty), None

        (s_yn, s_yn2, tot, xty, qty), _ = jax.lax.scan(
            stats_body, (z_g, z_g, z_g, jnp.zeros((g_loc, p), dtype),
                         jnp.zeros((g_loc, p), dtype)),
            (env["idxs"], env["sfs"], env["vs"], env["xs"], qs))
        base_mean = s_yn / n_valid
        base_var = (s_yn2 - n_valid * base_mean ** 2) / (n_valid - 1.0)
        all_zero = tot == 0
        beta_ls = jnp.linalg.solve(
            env["xtx"][None], xty[..., None])[..., 0]     # (g,p) LS fit
        b0 = jnp.linalg.solve(r_m[None].astype(dtype),
                              qty[..., None])[..., 0]     # QR init

        # ---- pass 2: rough dispersion residual sum (R/core.R:2422) ----
        def rough_body(acc, xc):
            i_c, sf_c, v_c, x_c = xc
            y_c = _chunk_of(counts_p, i_c, chunk)
            yn = y_c.astype(dtype) / _mu_factor(env, i_c, sf_c)
            mu_ls = jnp.maximum(jnp.dot(beta_ls, x_c.T,
                                        preferred_element_type=dtype),
                                1.0)
            acc += jnp.sum(v_c[None, :] * ((yn - mu_ls) ** 2 - mu_ls)
                           / mu_ls ** 2, axis=1)
            return acc, None

        rough_sum, _ = jax.lax.scan(
            rough_body, z_g,
            (env["idxs"], env["sfs"], env["vs"], env["xs"]))
        rough = jnp.maximum(rough_sum / (S - p), 0.0)
        moments = (base_var - xim * base_mean) / base_mean ** 2
        alpha_init = jnp.minimum(rough,
                                 jnp.where(all_zero, rough, moments))
        alpha_init = jnp.clip(jnp.where(jnp.isnan(alpha_init), min_disp,
                                        alpha_init), min_disp, max_disp)

        # ---- mu for the dispersion search: streamed GLM fit at the
        # initial dispersions (R/core.R:753-764, linearMu=False) ----
        glm_pg = _make_glm_per_gene(env, maxit, min_mu, dtype,
                                    False, False)
        fit0 = glm_pg(counts_p, b0, all_zero, alpha_init, base_mean,
                      alpha_init, alpha_init, nf_loc)
        beta_mu = fit0["beta"]

        if use_hist:
            dge, dgi = _gene_est_hist(env, beta_mu, alpha_init, grid,
                                      maxit, min_disp, min_mu, dtype,
                                      max_disp, _make_lp_dlp_x, ovf_cap)
        else:
            dge, dgi = _gene_est_search(env, beta_mu, alpha_init, grid,
                                        maxit, min_disp, min_mu, dtype,
                                        max_disp, _make_lp_dlp_x)
        return dict(base_mean=base_mean, base_var=base_var,
                    all_zero=all_zero, disp_gene_est=dge,
                    disp_gene_iter=dgi, beta_mu=beta_mu, beta0=b0)

    if mesh is not None and mesh.devices.size > 1:
        gP = _gene_spec(mesh)
        outspec = dict(base_mean=gP, base_var=gP, all_zero=gP,
                       disp_gene_est=gP, disp_gene_iter=gP,
                       beta_mu=gP, beta0=gP)
        if env0["nf_p"] is not None:
            return _smap(mesh, per_gene, (gP, gP), outspec)(
                env0["counts_p"], env0["nf_p"])
        return _smap(mesh, per_gene, (gP,), outspec)(env0["counts_p"])
    return per_gene(env0["counts_p"])


@partial(jax.jit, static_argnames=("maxit", "min_disp_pow", "min_mu",
                                   "chunk", "mesh", "use_hist",
                                   "ovf_cap"))
def _sc_stage_map_x(counts, x, size_factors, grid, beta_mu, all_zero,
                    disp_gene_est, disp_fit, disp_prior_var,
                    norm_factors=None, maxit=100,
                    min_disp_pow=-8, min_mu=1e-6, chunk=DEFAULT_CHUNK,
                    mesh=None, use_hist=False, ovf_cap=0):
    """MAP shrinkage line search for arbitrary designs (mu from the
    stage-1 betas; R/core.R:1016-1063)."""
    _DENSE.reset_stage()
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    G, S = counts.shape
    min_disp = 10.0 ** min_disp_pow
    max_disp = jnp.maximum(10.0, S).astype(dtype)
    env0 = _setup_x(counts, x, size_factors, chunk, dtype,
                    norm_factors=norm_factors)

    def per_gene(counts_p, beta_l, all_zero_l, dge_l, fit_l,
                 nf_loc=None):
        env = dict(env0, counts_p=counts_p)
        if nf_loc is not None:
            env["nf_p"] = nf_loc
        disp_init = jnp.where(dge_l > 0.1 * fit_l, dge_l, fit_l)
        pm = jnp.log(fit_l)
        if use_hist:
            return _map_hist(env, beta_l, disp_init, pm, disp_prior_var,
                             grid, maxit, min_disp, min_mu, dtype,
                             max_disp, _make_lp_dlp_x, ovf_cap)
        return _map_search(env, beta_l, disp_init, pm, disp_prior_var,
                           grid, maxit, min_disp, min_mu, dtype,
                           max_disp, _make_lp_dlp_x)

    if mesh is not None and mesh.devices.size > 1:
        gP = _gene_spec(mesh)
        if env0["nf_p"] is not None:
            return _smap(mesh, per_gene, (gP, gP, gP, gP, gP, gP), gP)(
                env0["counts_p"], beta_mu, all_zero, disp_gene_est,
                disp_fit, env0["nf_p"])
        return _smap(mesh, per_gene, (gP, gP, gP, gP, gP))(
            env0["counts_p"], beta_mu, all_zero, disp_gene_est,
            disp_fit)
    return per_gene(env0["counts_p"], beta_mu, all_zero, disp_gene_est,
                    disp_fit)


@partial(jax.jit, static_argnames=("chunk", "mesh"))
def _sc_qr_init_x(counts, x, size_factors, norm_factors=None,
                  chunk=DEFAULT_CHUNK, mesh=None):
    """Streamed QR beta init on log(normCounts + 0.1) for an arbitrary
    model matrix (fitNbinomGLMs.R:139-155) — one pass over the counts,
    (G,p) output."""
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    S = counts.shape[1]
    p = x.shape[1]
    env0 = _setup_x(counts, x, size_factors, chunk, dtype,
                    norm_factors=norm_factors)
    q_m, r_m = jnp.linalg.qr(x.astype(dtype))
    qs = jnp.pad(q_m, ((0, env0["Sp"] - S), (0, 0))).reshape(-1, chunk, p)

    def per_gene(counts_p, nf_loc=None):
        env = dict(env0, counts_p=counts_p)
        if nf_loc is not None:
            env["nf_p"] = nf_loc

        def body(acc, xc):
            i_c, sf_c, v_c, q_c = xc
            y_c = _chunk_of(counts_p, i_c, chunk)
            yn = y_c.astype(dtype) / _mu_factor(env, i_c, sf_c)
            acc += jnp.dot(v_c[None, :] * jnp.log(yn + 0.1), q_c,
                           preferred_element_type=dtype)
            return acc, None

        qty, _ = jax.lax.scan(
            body, jnp.zeros((counts_p.shape[0], p), dtype),
            (env0["idxs"], env0["sfs"], env0["vs"], qs))
        return jnp.linalg.solve(r_m[None], qty[..., None])[..., 0]

    if mesh is not None and mesh.devices.size > 1:
        gP = _gene_spec(mesh)
        if env0["nf_p"] is not None:
            return _smap(mesh, per_gene, (gP, gP), gP)(
                env0["counts_p"], env0["nf_p"])
        return _smap(mesh, per_gene, (gP,))(env0["counts_p"])
    return per_gene(env0["counts_p"])


@partial(jax.jit, static_argnames=("maxit", "min_disp_pow", "min_mu",
                                   "chunk", "mesh", "with_reduced",
                                   "with_loglik"))
def _sc_stage_glm_x(counts, x, size_factors, beta0, all_zero,
                    dispersion, base_mean, ll_alpha_full=None,
                    ll_alpha_red=None, norm_factors=None, maxit=100,
                    min_disp_pow=-8,
                    min_mu=1e-6, chunk=DEFAULT_CHUNK, mesh=None,
                    with_reduced=False, with_loglik=False):
    """Streamed ridge IRLS for an arbitrary model matrix (same core as
    the group _sc_stage_glm via _make_glm_per_gene)."""
    _DENSE.reset_stage()
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    env0 = _setup_x(counts, x, size_factors, chunk, dtype,
                    norm_factors=norm_factors)
    if ll_alpha_full is None:
        ll_alpha_full = dispersion
    if ll_alpha_red is None:
        ll_alpha_red = dispersion
    per_gene = _make_glm_per_gene(env0, maxit, min_mu, dtype,
                                  with_reduced, with_loglik)
    if mesh is not None and mesh.devices.size > 1:
        gP = _gene_spec(mesh)
        if env0["nf_p"] is not None:
            return _smap(mesh, per_gene,
                         (gP, gP, gP, gP, gP, gP, gP, gP))(
                env0["counts_p"], beta0, all_zero, dispersion,
                base_mean, ll_alpha_full, ll_alpha_red, env0["nf_p"])
        return _smap(mesh, per_gene, (gP, gP, gP, gP, gP, gP, gP))(
            env0["counts_p"], beta0, all_zero, dispersion, base_mean,
            ll_alpha_full, ll_alpha_red)
    return per_gene(env0["counts_p"], beta0, all_zero, dispersion,
                    base_mean, ll_alpha_full, ll_alpha_red)


# ---------------------------------------------------------------------------
# orchestrators
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("npoints",))
def _loc_median_window_dev(ys, npoints):
    """Sliding tricube-weighted median over x-sorted values, on device.

    Same windows and first-crossing pick as gampoi.loc_median_fit's
    scalar loop (glmGamPoi::loc_median_fit contract).  Selection is an
    EXACT bit-space binary search instead of a per-window pair sort:
    for positive floats the integer bit pattern orders identically, so
    32/64 fixed halving steps converge hi to the smallest window VALUE
    v* with W(<= v*) >= half — precisely the first-crossing element of
    the sorted-cumsum formulation, ties included.  A (n, npoints) pair
    sort on TPU (bitonic, 2 keys) costs seconds at 30k genes; the
    masked-sum search is pure VPU streaming (~30 sweeps)."""
    n = ys.shape[0]
    half_w = npoints // 2
    lo_i = jnp.clip(jnp.arange(n) - half_w, 0, n - npoints)
    idx = lo_i[:, None] + jnp.arange(npoints)[None, :]
    Wc = ys[idx]
    off = (jnp.arange(n) - lo_i).astype(ys.dtype)
    rel = (jnp.arange(npoints, dtype=ys.dtype)[None, :]
           - off[:, None]) / max(half_w, 1)
    wts = (1.0 - jnp.minimum(jnp.abs(rel), 1.0) ** 3) ** 3
    half = 0.5 * jnp.sum(wts, axis=1)

    it = jnp.int64 if ys.dtype == jnp.float64 else jnp.int32
    nbits = 64 if ys.dtype == jnp.float64 else 32
    Wb = jax.lax.bitcast_convert_type(Wc, it)      # ys > 0: order-preserving
    lo = jnp.min(Wb, axis=1) - 1                   # predicate false
    hi = jnp.max(Wb, axis=1)                       # predicate true

    def body(_, st):
        lo, hi = st
        mid = lo + (hi - lo) // 2
        ok = jnp.sum(jnp.where(Wb <= mid[:, None], wts, 0.0),
                     axis=1) >= half
        return jnp.where(ok, lo, mid), jnp.where(ok, mid, hi)

    lo, hi = jax.lax.fori_loop(0, nbits, body, (lo, hi))
    return jax.lax.bitcast_convert_type(hi, ys.dtype)


def _loc_median_fit_fast(x, y, fraction=0.1):
    """gampoi.loc_median_fit with the window stage on device for large
    inputs (identical windows/weights/pick; value selection at device
    precision)."""
    import numpy as np
    from ..gampoi import loc_median_fit
    n = len(x)
    if n < 4096:
        return loc_median_fit(x, y)
    npoints = min(max(int(np.round(fraction * n)), 2), n)
    order = np.argsort(x, kind="stable")
    ys = np.asarray(y, np.float64)[order]
    med_sorted = np.asarray(_loc_median_window_dev(jnp.asarray(ys),
                                                   npoints))
    out = np.empty(n)
    out[order] = med_sorted
    return out


def _sc_trend_and_prior(base_mean, disp_gene_est, all_zero, S, p, min_disp,
                        fit_type):
    """Cross-gene trend + dispersion prior pieces.  parametric: gamma
    GLM on device (R/core.R:2166-2189).  glmGamPoi: loc_median_fit with
    closest-index prediction on host (R/core.R:906-925) — G scalars.
    Returns (disp_fit (G,) device, coefs or None, var_log_disp,
    disp_prior_var)."""
    import numpy as np
    dtype = base_mean.dtype

    if fit_type == "parametric":
        use = (disp_gene_est > 100 * min_disp) & ~all_zero
        coefs, _ = jax.jit(_gamma_trend_fit)(base_mean, disp_gene_est,
                                             use)
        disp_fit = coefs[0] + coefs[1] / jnp.where(all_zero, 1.0,
                                                   base_mean)
    elif fit_type == "glmGamPoi":
        from ..gampoi import make_closest_index_disp_fn
        # ONE batched device->host fetch (per-array np.asarray over the
        # device tunnel serializes ~0.1-0.5 s of latency each)
        host = jax.device_get(dict(bm=base_mean, dge=disp_gene_est,
                                   az=all_zero))
        bm = np.asarray(host["bm"], np.float64)
        dge = np.asarray(host["dge"], np.float64)
        az = np.asarray(host["az"], bool)
        use = (dge > 100 * min_disp) & ~az
        medians = _loc_median_fit_fast(bm[use], dge[use])
        fn = make_closest_index_disp_fn(bm[use], medians)
        fit = np.ones_like(bm)
        fit[~az] = fn(bm[~az])
        coefs = None
        # host MAD (same semantics as the device _masked_median path)
        with np.errstate(divide="ignore", invalid="ignore"):
            resid_h = np.where(az, np.nan, np.log(dge) - np.log(fit))
        med_h = np.nanmedian(resid_h)
        vld = (1.4826 * np.nanmedian(np.abs(resid_h - med_h))) ** 2
        from scipy.special import polygamma as spolygamma
        dpv = max(vld - float(spolygamma(1, (S - p) / 2.0)), 0.25)
        return (jnp.asarray(fit, dtype), None,
                jnp.asarray(vld, dtype), jnp.asarray(dpv, dtype),
                dict(bm=bm, dge=dge, az=az, fit=fit))
    else:
        raise ValueError("fused_sc_results supports fit_type='parametric' "
                         "or 'glmGamPoi'")

    resid = jnp.log(disp_gene_est) - jnp.log(disp_fit)
    med = _masked_median(resid, ~all_zero)
    var_log_disp = (1.4826 * _masked_median(jnp.abs(resid - med),
                                            ~all_zero)) ** 2
    exp_var = polygamma(1, (S - p) / 2.0).astype(dtype)
    disp_prior_var = jnp.maximum(var_log_disp - exp_var, 0.25)
    return disp_fit, coefs, var_log_disp, disp_prior_var, None


def fused_sc_results(counts, cells=None, size_factors=None, n_groups=None,
                     grid=None, maxit=100, min_disp_pow=-8, min_mu=1e-6,
                     chunk=DEFAULT_CHUNK, test="Wald",
                     fit_type="parametric", alpha=0.1,
                     independent_filtering=True, mesh=None, quiet=True,
                     design=None, reduced_design=None,
                     norm_factors=None):
    """Full single-cell-scale DESeq results: staged streamed pipeline.

    - fit_type="glmGamPoi": loc_median_fit dispersion trend
      (R/core.R:906-925) + quasi-likelihood dispersion shrinkage
      (overdispersion_shrinkage contract, R/core.R:1064-1096); with
      test="LRT" the quasi-likelihood F-test (glm_gp/test_de contract,
      R/core.R:1898-1947) against the intercept-only reduced model,
      with betas fit at the *trend* dispersions.
    - fit_type="parametric": the bulk pipeline's gamma trend + MAP
      line-search shrinkage; test="Wald" (z) or "LRT" (chi-square
      against ~1).
    - the tail runs Cook's-free (the reference disables outlier
      replacement for single cell, R/core.R:297-303) independent
      filtering + BH (R/results.R:638-718).
    - `mesh`: optional 1-D 'genes' device mesh; the streamed per-gene
      stages run under shard_map, cross-gene reductions auto-shard.

    Returns a dict of host numpy columns (results table + diagnostics).
    """
    import numpy as np
    from ..results import choose_filter_theta

    G, S = counts.shape
    _DENSE.configure()
    use_x = design is not None
    if norm_factors is not None and not use_x:
        raise ValueError("norm_factors at single-cell scale require the "
                         "design= (model matrix) mode — the group "
                         "factorization assumes shared per-sample "
                         "factors")
    if use_x:
        design = np.asarray(design, np.float64)
        if design.shape[0] != S:
            raise ValueError("design must be (samples, p)")
        p = design.shape[1]
        if reduced_design is not None:
            reduced_design = np.asarray(reduced_design, np.float64)
            rp = reduced_design.shape[1]
            if rp == 1 and np.all(reduced_design == 1.0):
                reduced_design = None    # ~1: intercept closed form
            elif rp >= p:
                raise ValueError("reduced_design must have fewer columns "
                                 "than design")
    else:
        if cells is None or n_groups is None:
            raise ValueError("provide cells+n_groups (group design) or "
                             "design= (arbitrary model matrix)")
        p = n_groups
    if size_factors is None:
        raise ValueError("size_factors are required (estimate on host "
                         "or pass ones)")
    min_disp = 10.0 ** min_disp_pow
    max_disp = max(10.0, S)
    if grid is None:
        grid = np.linspace(np.log(min_disp), np.log(max_disp), 20)
    if test not in ("Wald", "LRT"):
        raise ValueError("test must be 'Wald' or 'LRT'")
    if fit_type == "glmGamPoi" and test == "Wald" and not quiet:
        import warnings
        warnings.warn("glmGamPoi fitType is designed for the LRT "
                      "quasi-likelihood F-test (reference R/core.R:"
                      "347-350); Wald p-values use the QL-mapped "
                      "dispersions")

    padded_G = G
    if mesh is not None and mesh.devices.size > 1:
        from .sharding import pad_to_multiple, replicated, shard_genes
        n_dev = mesh.devices.size
        counts_h, _ = pad_to_multiple(np.asarray(counts), n_dev, 0)
        padded_G = counts_h.shape[0]
        counts = jax.device_put(counts_h, shard_genes(mesh))
        rep = replicated(mesh)
        if use_x:
            design_d = jax.device_put(design, rep)
            if reduced_design is not None:
                reduced_d = jax.device_put(reduced_design, rep)
            if norm_factors is not None:
                nf_h, _ = pad_to_multiple(
                    np.asarray(norm_factors, np.float64), n_dev, 1.0)
                norm_factors = jax.device_put(nf_h, shard_genes(mesh))
        else:
            cells = jax.device_put(np.asarray(cells, np.int32), rep)
        size_factors = jax.device_put(np.asarray(size_factors), rep)
        grid_d = jax.device_put(np.asarray(grid), rep)
    else:
        mesh = None
        counts = jnp.asarray(counts)
        if use_x:
            design_d = jnp.asarray(design)
            if reduced_design is not None:
                reduced_d = jnp.asarray(reduced_design)
            if norm_factors is not None:
                norm_factors = jnp.asarray(np.asarray(norm_factors))
        else:
            cells = jnp.asarray(cells, jnp.int32)
        size_factors = jnp.asarray(np.asarray(size_factors))
        grid_d = jnp.asarray(grid)

    kw = dict(maxit=maxit, min_disp_pow=min_disp_pow,
              min_mu=min_mu, chunk=chunk, mesh=mesh)
    kwg = dict(kw, n_groups=n_groups)

    # count-tail histogram fast path (f32): collapse the per-sample
    # lgamma/digamma line-search sums into HIST_K per-gene bins; genes
    # with any count >= HIST_K redo exactly on a compacted generic
    # pass.  Decision is host-side so the jitted stages see static
    # flags; disabled when the data is not UMI-like (too many
    # high-count genes) or in f64 (the reference-parity path).
    import os as _os
    _hist_env = _os.environ.get("DESEQ2_TPU_SC_HIST", "1")
    # default: f32 fast path only (f64 stays the reference-parity
    # per-sample form); "force" also enables it in f64 — used by the
    # bench gate's CPU worker so the f32-vs-f64 comparison is
    # summation-order-matched (hist-f64 == generic-f64 at 1e-10,
    # tests/test_sc.py::test_sc_histogram_fast_path_exact)
    use_hist = _hist_env != "0" and (not jax.config.jax_enable_x64
                                     or _hist_env == "force")
    ovf_cap = 0
    if use_hist:
        n_ovf = int(jax.device_get(jnp.sum(
            jnp.max(counts, axis=1) >= HIST_K)))
        if n_ovf > padded_G // 4:
            use_hist = False
        elif n_ovf > 0:
            ovf_cap = min(1 << (max(n_ovf, 64) - 1).bit_length(),
                          padded_G)
    hkw = dict(use_hist=use_hist, ovf_cap=ovf_cap)

    if use_x:
        st1 = _sc_stage1_x(counts, design_d, size_factors, grid_d,
                           norm_factors=norm_factors, **kw, **hkw)
    else:
        st1 = _sc_stage1(counts, cells, size_factors, grid_d,
                         **kwg, **hkw)
    base_mean, base_var = st1["base_mean"], st1["base_var"]
    all_zero, dge = st1["all_zero"], st1["disp_gene_est"]

    disp_fit, coefs, var_log_disp, disp_prior_var, host = \
        _sc_trend_and_prior(base_mean, dge, all_zero, S, p, min_disp,
                            fit_type)
    dgi = st1["disp_gene_iter"]

    out = dict(trendCoefs=coefs, dispPriorVar=disp_prior_var,
               varLogDispEsts=var_log_disp)

    disp_outlier = jnp.log(dge) > jnp.log(disp_fit) + \
        2.0 * jnp.sqrt(var_log_disp)

    if fit_type == "glmGamPoi":
        # QL shrinkage on host (G-vector ops; R/core.R:1064-1096),
        # reusing the single batched fetch from the trend stage
        from ..gampoi import overdispersion_shrinkage, ql_to_nb_alpha
        bm, az, fitv = host["bm"], host["az"], host["fit"]
        nzm = ~az
        shrink = overdispersion_shrinkage(
            host["dge"][nzm], bm[nzm], S - p, fitv[nzm],
            loc_median=_loc_median_fit_fast)
        disp_map_nz = ql_to_nb_alpha(shrink["ql_disp_shrunken"], bm[nzm],
                                     fitv[nzm], min_disp, max_disp)
        disp_map = np.ones(padded_G)
        disp_map[nzm] = disp_map_nz
        disp_map_d = jnp.asarray(disp_map, base_mean.dtype)
        dispersion = jnp.where(disp_outlier, dge, disp_map_d)
        for k_src, k_dst in (("ql_disp_estimate", "qlDispMLE"),
                             ("ql_disp_trend", "qlDispFit"),
                             ("ql_disp_shrunken", "qlDispMAP")):
            full = np.full(padded_G, np.nan)
            full[nzm] = shrink[k_src]
            out[k_dst] = full
        out["ql_df0"] = shrink["ql_df0"]
        disp_map = disp_map_d
    else:
        if use_x:
            disp_map = _sc_stage_map_x(counts, design_d, size_factors,
                                       grid_d, st1["beta_mu"], all_zero,
                                       dge, disp_fit, disp_prior_var,
                                       norm_factors=norm_factors,
                                       **kw, **hkw)
        else:
            disp_map = _sc_stage_map(counts, cells, size_factors, grid_d,
                                     st1["q"], all_zero, dge, disp_fit,
                                     disp_prior_var, **kwg, **hkw)
        dispersion = jnp.where(disp_outlier, dge, disp_map)

    # ---- GLM fits + test statistics ----
    lrt = test == "LRT"
    ql_mode = lrt and fit_type == "glmGamPoi"
    # QL betas are fit at the *trend* dispersions (lrt.py kwargs
    # alpha_hat=disp_trend, mirroring glm_gp); otherwise at the final
    # dispersions.  The full-model logLike always runs at the final
    # dispersion column while the reduced closed form runs at alpha_hat
    # (reference quirk, R/fitNbinomGLMs.R:103-114 vs 180-182).
    fit_alpha = disp_fit if ql_mode else dispersion
    # intercept-only reduced model -> closed form inside the full fit;
    # an arbitrary reduced_design (X mode) runs a second streamed fit
    red_closed = lrt and (not use_x or reduced_design is None)
    if use_x:
        glm = _sc_stage_glm_x(counts, design_d, size_factors,
                              st1["beta0"], all_zero, fit_alpha,
                              base_mean, ll_alpha_full=dispersion,
                              ll_alpha_red=fit_alpha,
                              norm_factors=norm_factors,
                              with_reduced=red_closed, with_loglik=lrt,
                              **kw)
        if lrt and not red_closed:
            b0r = _sc_qr_init_x(counts, reduced_d, size_factors,
                                norm_factors=norm_factors,
                                chunk=chunk, mesh=mesh)
            glm_r = _sc_stage_glm_x(counts, reduced_d, size_factors,
                                    b0r, all_zero, fit_alpha, base_mean,
                                    ll_alpha_full=dispersion,
                                    norm_factors=norm_factors,
                                    with_reduced=False, with_loglik=True,
                                    **kw)
            glm = dict(glm, ll_reduced=glm_r["ll_full"])
    else:
        glm = _sc_stage_glm(counts, cells, size_factors, st1["logq"],
                            all_zero, fit_alpha, base_mean,
                            ll_alpha_full=dispersion,
                            ll_alpha_red=fit_alpha,
                            with_reduced=red_closed, with_loglik=lrt,
                            **kwg)
    beta, beta_var = glm["beta"], glm["beta_var"]
    dtype = beta.dtype
    beta_log2 = LOG2E * beta
    se_log2 = LOG2E * jnp.sqrt(jnp.maximum(beta_var, 0.0))

    if lrt:
        if ql_mode:
            # quasi-likelihood F-test on host (G scalars, one fetch)
            from ..gampoi import ql_f_test
            lls = jax.device_get(dict(f=glm["ll_full"],
                                      r=glm["ll_reduced"],
                                      d=glm.get("ll_diff")))
            nzm = ~host["az"]
            llf = np.asarray(lls["f"], np.float64)
            # cancellation-free deviance drop when the one-pass
            # elementwise difference is available (see ll_body)
            llr = (llf - np.asarray(lls["d"], np.float64)
                   if lls["d"] is not None
                   else np.asarray(lls["r"], np.float64))
            qlmap = out["qlDispMAP"]
            f_stat = np.full(padded_G, np.nan)
            pval = np.full(padded_G, np.nan)
            df_test = p - (reduced_design.shape[1]
                           if use_x and reduced_design is not None
                           else 1)
            f_nz, p_nz = ql_f_test(llf[nzm], llr[nzm], df_test,
                                   qlmap[nzm], out["ql_df0"], S - p)
            f_stat[nzm] = f_nz
            pval[nzm] = p_nz
            stat_last = jnp.asarray(f_stat, dtype)
            p_last = jnp.asarray(pval, dtype)
        else:
            from jax.scipy.special import gammaincc
            df = p - (reduced_design.shape[1]
                      if use_x and reduced_design is not None else 1)
            lrt_stat = 2.0 * (glm["ll_diff"] if "ll_diff" in glm
                              else glm["ll_full"] - glm["ll_reduced"])
            # pchisq semantics: stat <= 0 -> p = 1 (gammaincc would NaN)
            p_chi = gammaincc(jnp.asarray(df / 2.0, dtype),
                              jnp.maximum(lrt_stat, 0.0) / 2.0)
            stat_last = jnp.where(all_zero, jnp.nan, lrt_stat)
            p_last = jnp.where(all_zero, jnp.nan, p_chi)
        out["LRTStatistic"] = jnp.where(all_zero, jnp.nan, stat_last)
        out["LRTPvalue"] = jnp.where(all_zero, jnp.nan, p_last)
        stat_full = jnp.where(all_zero[:, None], jnp.nan,
                              beta_log2 / se_log2)
        pval_full = None
    else:
        stat_full = beta_log2 / se_log2
        pval_full = erfc(jnp.abs(stat_full) / jnp.sqrt(2.0).astype(dtype))
        stat_last = jnp.where(all_zero, jnp.nan, stat_full[:, -1])
        p_last = jnp.where(all_zero, jnp.nan, pval_full[:, -1])

    p_last = jnp.where(all_zero, jnp.nan, p_last)

    # ---- independent filtering + BH tail (R/results.R:638-718) ----
    if independent_filtering:
        from .filterdev import filtered_bh_dev, theta_grid_dev
        # mesh gene padding looks like all-zero genes: exclude it from
        # the theta grid's zero share and the type-7 filter quantiles
        # exactly as run_fused_sharded does (fused.py valid_genes)
        vg = G if padded_G != G else None
        theta = theta_grid_dev(base_mean, valid_genes=vg)
        filter_padj, num_rej, cutoffs = filtered_bh_dev(
            p_last, base_mean, theta, jnp.asarray(alpha, dtype),
            valid_genes=vg)
        small = jax.device_get(dict(num_rej=num_rej, theta=theta,
                                    cutoffs=cutoffs))
        j, _, _ = choose_filter_theta(small["theta"], small["num_rej"])
        padj = filter_padj[j]
        out["filterThreshold"] = float(small["cutoffs"][j])
        out["filterTheta"] = float(small["theta"][j])
        out["filterNumRej"] = small["num_rej"]
    else:
        padj = _bh_adjust(p_last, ~jnp.isnan(p_last))

    nanmask = lambda v: jnp.where(all_zero, jnp.nan, v)
    out.update(
        baseMean=base_mean, baseVar=base_var, allZero=all_zero,
        dispGeneEst=nanmask(dge), dispFit=nanmask(disp_fit),
        dispersion=nanmask(dispersion), dispMAP=nanmask(disp_map),
        dispOutlier=disp_outlier & ~all_zero,
        beta=jnp.where(all_zero[:, None], jnp.nan, beta_log2),
        betaSE=jnp.where(all_zero[:, None], jnp.nan, se_log2),
        log2FoldChange=jnp.where(all_zero, jnp.nan, beta_log2[:, -1]),
        lfcSE=jnp.where(all_zero, jnp.nan, se_log2[:, -1]),
        stat=stat_last, pvalue=p_last, padj=padj,
        betaIter=glm["beta_iter"], betaConv=glm["beta_iter"] < maxit,
        dispGeneIter=jnp.where(all_zero, jnp.nan, dgi.astype(dtype)),
        deviance=nanmask(glm["deviance"]))
    if lrt and "ll_full" in glm:
        out["llFull"] = nanmask(glm["ll_full"])
    if not lrt and pval_full is not None:
        out["statMatrix"] = jnp.where(all_zero[:, None], jnp.nan,
                                      stat_full)
        out["pvalueMatrix"] = jnp.where(all_zero[:, None], jnp.nan,
                                        pval_full)

    # ONE batched device_get for all result columns (per-array fetches
    # over the device tunnel serialize a dozen round-trip latencies)
    fetched = jax.device_get({k: v for k, v in out.items()
                              if hasattr(v, "shape")})
    res = {}
    for k, v in out.items():
        a = np.asarray(fetched[k]) if k in fetched else v
        if hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] == padded_G \
                and padded_G != G:
            a = a[:G]
        res[k] = a
    return res


def fused_sc_pipeline(counts, cells, size_factors, grid, n_groups,
                      maxit=100, min_disp_pow=-8, min_mu=1e-6,
                      chunk=DEFAULT_CHUNK):
    """The original Wald/parametric single-cell pipeline contract
    (returns device arrays keyed like the bulk fused pipeline).  Now a
    thin wrapper over the staged implementation."""
    kw = dict(n_groups=n_groups, maxit=maxit, min_disp_pow=min_disp_pow,
              min_mu=min_mu, chunk=chunk, mesh=None)
    G, S = counts.shape
    p = n_groups
    min_disp = 10.0 ** min_disp_pow
    counts = jnp.asarray(counts)
    cells = jnp.asarray(cells, jnp.int32)
    size_factors = jnp.asarray(size_factors)
    grid_d = jnp.asarray(grid)

    st1 = _sc_stage1(counts, cells, size_factors, grid_d, **kw)
    base_mean, base_var = st1["base_mean"], st1["base_var"]
    all_zero, dge = st1["all_zero"], st1["disp_gene_est"]
    disp_fit, coefs, var_log_disp, disp_prior_var, _ = \
        _sc_trend_and_prior(base_mean, dge, all_zero, S, p, min_disp,
                            "parametric")
    disp_map = _sc_stage_map(counts, cells, size_factors, grid_d,
                             st1["q"], all_zero, dge, disp_fit,
                             disp_prior_var, **kw)
    disp_outlier = jnp.log(dge) > jnp.log(disp_fit) + \
        2.0 * jnp.sqrt(var_log_disp)
    dispersion = jnp.where(disp_outlier, dge, disp_map)
    glm = _sc_stage_glm(counts, cells, size_factors, st1["logq"],
                        all_zero, dispersion, base_mean, **kw)
    beta, beta_var = glm["beta"], glm["beta_var"]
    dtype = beta.dtype
    beta_log2 = LOG2E * beta
    se_log2 = LOG2E * jnp.sqrt(jnp.maximum(beta_var, 0.0))
    stat = beta_log2 / se_log2
    pval = erfc(jnp.abs(stat) / jnp.sqrt(2.0).astype(dtype))
    padj = _bh_adjust(jnp.where(all_zero, jnp.nan, pval[:, -1]),
                      ~all_zero)
    nanmask = lambda v: jnp.where(all_zero, jnp.nan, v)
    return dict(
        baseMean=base_mean, baseVar=base_var, allZero=all_zero,
        dispGeneEst=nanmask(dge), dispFit=nanmask(disp_fit),
        dispersion=nanmask(dispersion), dispMAP=nanmask(disp_map),
        dispOutlier=disp_outlier & ~all_zero,
        trendCoefs=coefs, dispPriorVar=disp_prior_var,
        varLogDispEsts=var_log_disp,
        beta=jnp.where(all_zero[:, None], jnp.nan, beta_log2),
        betaSE=jnp.where(all_zero[:, None], jnp.nan, se_log2),
        stat=jnp.where(all_zero[:, None], jnp.nan, stat),
        pvalue=jnp.where(all_zero[:, None], jnp.nan, pval),
        betaIter=glm["beta_iter"], betaConv=glm["beta_iter"] < maxit,
        deviance=nanmask(glm["deviance"]), padjLast=padj)
