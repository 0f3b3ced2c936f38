"""Genes-axis bucketing: pad batch dims to canonical sizes.

XLA compiles one program per shape.  The pipeline repeatedly calls the
same kernels on data-dependent subsets of genes (refit rows, non-converged
rows, outlier rows), which would trigger a fresh compile per subset size.
Padding the genes axis up to a bucket (powers of two below 4096, then
multiples of 4096) makes shapes canonical so the jitted kernels are
compiled once and reused — at most ~2x padding waste for small batches,
<=9% at 60k genes.

Dummy rows are filled with benign values (y=1, mu=1, nf=1, alpha=1,
beta=0, weights=1) that converge instantly and never produce NaN/Inf.
"""

from __future__ import annotations

import numpy as np

__all__ = ["bucket_size", "pad_rows", "straggler_capacity",
           "compact_live_indices"]


def bucket_size(g):
    if g <= 16:
        return 16
    if g < 4096:
        return 1 << (g - 1).bit_length()
    return -(-g // 4096) * 4096


def straggler_capacity(g, frac=64, floor=512):
    """Static capacity of the straggler buffer for compacted iteration.

    The batched masked loops (IRLS, dispersion line search) run all genes
    in lockstep, so one slow gene forces every gene through its trips.
    Once the live set is below this capacity, the loop gathers the
    stragglers into a (capacity, S) buffer and finishes there — the tail
    iterations then cost capacity/G of a full trip.  Returns 0 when the
    batch is too small for compaction to pay for itself.
    """
    cap = max(g // frac, floor)
    cap = min(bucket_size(cap), g)
    return 0 if cap * 2 >= g else cap


def cascade_caps(g, fracs=(8, 32, 128), floor=256):
    """Descending straggler-buffer capacities for cascade_while."""
    caps = []
    prev = g
    for f in fracs:
        c = min(bucket_size(max(g // f, floor)), g)
        if c * 2 <= prev:
            caps.append(c)
            prev = c
    return caps


def compact_live_indices(live, capacity):
    """Indices of live genes first (stable), truncated to `capacity`.

    jnp-traceable: argsort of the done flag puts live genes (False keys)
    ahead of done ones; slots beyond the live count hold done genes whose
    state the loop body leaves untouched, so gather -> iterate -> scatter
    is exact.
    """
    import jax.numpy as jnp
    return jnp.argsort(~live, stable=True)[:capacity]


def cascade_while(make_body, live_fn, data, state, maxit, caps):
    """Masked while-loop with cascading straggler compaction.

    The batched per-gene solvers converge at wildly different speeds
    (p50 ~6-10 trips, p99+ at maxit), and a lockstep loop pays the full
    (G, S) trip cost until the *last* gene converges.  This driver runs
    the loop in phases: as soon as the live set fits the next capacity,
    it gathers the live genes (plus inert converged fillers) into a
    smaller buffer and keeps iterating there, so tail trips cost
    cap/G of a full one.  Gather -> identical body -> scatter touches
    converged genes' state not at all: the result is bit-identical to
    the plain lockstep loop.

    make_body(data) -> body(state): loop body closed over the per-gene
      arrays in `data` (dict, leading axis = genes).
    live_fn(state) -> (G,) bool of still-iterating genes.
    state: (t_scalar, *per_gene_arrays).
    caps: descending capacities from cascade_caps().
    """
    import jax
    import jax.numpy as jnp

    outer = []
    for cap in caps:
        body = make_body(data)
        state = jax.lax.while_loop(
            lambda s: (s[0] < maxit) & (jnp.sum(live_fn(s)) > cap),
            body, state)
        idx = compact_live_indices(live_fn(state), cap)
        outer.append((state, idx))
        data = {k: v[idx] for k, v in data.items()}
        state = (state[0],) + tuple(v[idx] for v in state[1:])
    body = make_body(data)
    state = jax.lax.while_loop(
        lambda s: (s[0] < maxit) & jnp.any(live_fn(s)), body, state)
    for ostate, idx in reversed(outer):
        state = (state[0],) + tuple(
            ov.at[idx].set(iv) for ov, iv in zip(ostate[1:], state[1:]))
    return state


def pad_rows(arr, g_pad, fill):
    """Pad axis 0 of `arr` to g_pad with `fill`."""
    arr = np.asarray(arr)
    g = arr.shape[0]
    if g == g_pad:
        return arr
    pad_shape = (g_pad - g,) + arr.shape[1:]
    return np.concatenate([arr, np.full(pad_shape, fill, dtype=arr.dtype)],
                          axis=0)
