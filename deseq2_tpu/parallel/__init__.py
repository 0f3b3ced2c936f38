"""Gene-sharded multi-device execution.

The reference's only parallelism is data parallelism over genes via
BiocParallel process pools (R/parallel.R:6-74) with three cross-gene
reductions (dispersion trend fit, prior variances, independent filtering).
The TPU-native equivalent shards the genes axis over a jax.sharding.Mesh;
the reductions become XLA collectives inserted automatically from sharded
jnp reductions.
"""

from .sharding import gene_mesh, shard_genes
from .fused import fused_results, fused_wald_pipeline
from .sc import fused_sc_pipeline, fused_sc_results

__all__ = ["gene_mesh", "shard_genes", "fused_wald_pipeline",
           "fused_results", "fused_sc_pipeline", "fused_sc_results"]
