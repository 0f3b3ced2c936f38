"""Multi-process (DCN-style) dryrun worker: run the fused pipeline with
the genes axis sharded over a GLOBAL mesh spanning 2 processes.

Launched by test_multihost.py with args: <process_id> <num_processes>
<coordinator_port> <out_dir>.  Each process owns 4 virtual CPU devices;
the global mesh has 8.  Process 0 writes the gathered results to
out_dir/result.npz for comparison against the single-process run.
"""

import os
import sys

pid, nproc, port, out_dir = (int(sys.argv[1]), int(sys.argv[2]),
                             int(sys.argv[3]), sys.argv[4])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
os.environ.setdefault("DESEQ2_TPU_X64", "1")

import jax

jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import deseq2_tpu  # noqa: F401  (enables x64)
from deseq2_tpu.parallel.fused import fused_wald_pipeline, design_cells

G, S = 512, 8
rng = np.random.default_rng(0)
S2 = S // 2
x = np.column_stack([np.ones(S), np.repeat([0.0, 1.0], [S2, S - S2])])
mu = np.exp(rng.normal(3.0, 1.5, (G, 1))) * np.ones((1, S))
alpha = 4.0 / mu[:, 0] + 0.1
size = 1.0 / alpha[:, None]
counts = rng.negative_binomial(size, size / (size + mu)).astype(np.int32)
sf = np.ones(S)
grid = np.linspace(np.log(1e-8), np.log(10.0), 20)

devs = np.asarray(jax.devices())          # 8 global devices, 4 local
assert len(devs) == 4 * nproc, len(devs)
mesh = Mesh(devs, axis_names=("genes",))
gshard = NamedSharding(mesh, P("genes"))
rep = NamedSharding(mesh, P())

def put(arr, sh):
    """Build a global array from per-process local shards."""
    return jax.make_array_from_callback(
        arr.shape, sh, lambda idx: arr[idx])

counts_d = put(counts, gshard)
x_d = put(x, rep)
sf_d = put(sf, rep)
grid_d = put(grid, rep)

out = fused_wald_pipeline(counts_d, x_d, sf_d, grid_d, mesh=mesh,
                          cells=design_cells(x), two_group=True)
jax.block_until_ready(out)

keys = ["baseMean", "dispGeneEst", "dispersion", "lfcLast", "seLast",
        "statLast", "pvalueLast", "padjLast", "maxCooks"]
gathered = {}
for k in keys:
    # fully replicate then read — exercises the cross-host all-gather
    arr = jax.device_put(out[k], rep)
    gathered[k] = np.asarray(arr.addressable_data(0))

if pid == 0:
    np.savez(os.path.join(out_dir, "result.npz"), **gathered)
print(f"process {pid} done", flush=True)
