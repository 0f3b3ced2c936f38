"""Mesh construction and genes-axis sharding helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def gene_mesh(n_devices=None, devices=None):
    """1-D device mesh over the 'genes' axis.

    The genes axis is the natural data-parallel axis: every per-gene fit is
    independent; only the trend fit / prior variance / filtering reduce
    across genes (SURVEY.md section 2.7)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("genes",))


def shard_genes(mesh):
    """NamedSharding that splits axis 0 (genes) across the mesh."""
    return NamedSharding(mesh, P("genes"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def pad_to_multiple(arr, multiple, fill):
    """Pad axis 0 so it divides evenly across mesh devices."""
    g = arr.shape[0]
    g_pad = -(-g // multiple) * multiple
    if g_pad == g:
        return arr, g
    pad = np.full((g_pad - g,) + arr.shape[1:], fill, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0), g


# exact-path placement context: kernels upload gene-sharded under this
# (see ops/placement.py)
from ..ops.placement import active_gene_mesh, use_gene_mesh  # noqa: E402,F401
