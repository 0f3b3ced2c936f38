"""Gene-axis device placement for the exact (host-orchestrated) path.

The reference's DESeqParallel (R/parallel.R:6-74) shards *every*
configuration of the pipeline — weighted fits, beta-prior refits, LRT —
because workers just re-run the same R functions on row blocks.  The
TPU-native equivalent for the exact path: a placement context that makes
the batched kernel wrappers (`ops.irls.fit_beta`,
`ops.disp.fit_disp_line_search/fit_disp_grid`) upload their gene-axis
arrays with a `NamedSharding` over a 1-D 'genes' mesh.  Every kernel is
embarrassingly gene-parallel, so XLA partitions the jitted solve across
devices with no collectives; the cross-gene reductions (trend fit, MAD,
prior variances, filtering) happen host-side in the orchestration layer
exactly as in the single-device run, so results are bit-identical.

Usage:

    from deseq2_tpu.parallel.sharding import gene_mesh, use_gene_mesh
    with use_gene_mesh(gene_mesh(8)):
        dds = deseq(dds)          # every stage's kernels run sharded

(The fused pipeline has its own shard_map machinery and ignores this
context.)
"""

from __future__ import annotations

from contextlib import contextmanager

import jax

_ACTIVE_MESH = None


def active_gene_mesh():
    """The mesh installed by use_gene_mesh, or None."""
    return _ACTIVE_MESH


@contextmanager
def use_gene_mesh(mesh):
    """Within this context the kernel wrappers place gene-axis arrays
    sharded over `mesh` (a 1-D mesh whose axis is named 'genes')."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        yield mesh
    finally:
        _ACTIVE_MESH = prev


def round_up_to_multiple(g, m):
    return ((g + m - 1) // m) * m


def place_gene_axis(*arrays):
    """device_put each (G, ...) array sharded on axis 0 over the active
    mesh; no-op (returns inputs unchanged) when no mesh is active or an
    array is None.  All arrays must share the same leading G, already a
    multiple of the mesh size."""
    mesh = _ACTIVE_MESH
    if mesh is None:
        return arrays
    from jax.sharding import NamedSharding, PartitionSpec as P
    axis = mesh.axis_names[0]
    sh = NamedSharding(mesh, P(axis))
    return tuple(None if a is None else jax.device_put(a, sh)
                 for a in arrays)
