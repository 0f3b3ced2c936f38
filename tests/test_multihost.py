"""Multi-process (DCN-style) sharding correctness (VERDICT item 6).

Launches two jax.distributed processes (4 virtual CPU devices each) via
subprocess, runs the fused pipeline over the 8-device GLOBAL mesh, and
asserts the gathered results equal the single-process 8-device run —
the cross-host analog of the reference's test_parallel.R shard+recombine
equivalence.
"""

import os
import socket
import subprocess
import sys
import tempfile

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_mesh_matches_single(tmp_path):
    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "multihost", "worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "XLA_FLAGS",
                        "JAX_PLATFORMS")}
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) + os.pathsep
        + env.get("PYTHONPATH", ""))
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port), str(tmp_path)],
        env=env, cwd=root, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for pid in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=480)
        outs.append(out.decode())
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]
    multi = np.load(tmp_path / "result.npz")

    # single-process 8-device reference
    code = (
        "import os,sys,numpy as np\n"
        "os.environ['JAX_PLATFORMS']='cpu'\n"
        "os.environ['XLA_FLAGS']=' --xla_force_host_platform_device_count=8'\n"
        "os.environ.setdefault('DESEQ2_TPU_X64','1')\n"
        "import jax, jax.numpy as jnp\n"
        "import deseq2_tpu\n"
        "from deseq2_tpu.parallel.fused import run_fused_sharded, design_cells\n"
        "from deseq2_tpu.parallel.sharding import gene_mesh\n"
        "rng=np.random.default_rng(0); G,S=512,8; S2=S//2\n"
        "x=np.column_stack([np.ones(S),np.repeat([0.,1.],[S2,S-S2])])\n"
        "mu=np.exp(rng.normal(3.,1.5,(G,1)))*np.ones((1,S))\n"
        "al=4./mu[:,0]+.1; size=1./al[:,None]\n"
        "counts=rng.negative_binomial(size,size/(size+mu)).astype(np.int32)\n"
        "out=run_fused_sharded(counts,x,np.ones(S),gene_mesh(8),"
        "cells=design_cells(x),two_group=True)\n"
        "np.savez(sys.argv[1], **{k:out[k] for k in"
        " ['baseMean','dispGeneEst','dispersion','lfcLast','seLast',"
        "'statLast','pvalueLast','padjLast','maxCooks']})\n")
    ref_file = tmp_path / "ref.npz"
    subprocess.run([sys.executable, "-c", code, str(ref_file)], env=env,
                   cwd=root, check=True, timeout=480)
    ref = np.load(ref_file)
    for k in ref.files:
        np.testing.assert_allclose(multi[k], ref[k], rtol=1e-10,
                                   atol=1e-12, equal_nan=True, err_msg=k)
