"""Worker for tests/test_multihost.py — run as a real OS process.

One of N jax.distributed processes (the reference's mpirun rank,
parallel_context.cpp:76-96 MPI bootstrap analog). Validates the one
parallel path the single-process 8-device dryrun cannot: a REAL
cross-process DCN-style bootstrap plus a dp-across-process, tp-local
sharded model step whose collectives actually cross process boundaries.

Usage: python multihost_worker.py <coordinator> <num_procs> <pid>
Prints "MULTIHOST_OK <pid> <checksum>" on success.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
try:  # CPU cross-process collectives (newer jax: gloo backend)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neural_tpu.convert import init_random  # noqa: E402
from neural_tpu.models.config import ModelConfig  # noqa: E402
from neural_tpu.parallel.multihost import (auto_mesh,  # noqa: E402
                                           init_distributed, is_primary)
from neural_tpu.parallel.sharding import (data_sharding,  # noqa: E402
                                          shard_cache, shard_params)
from neural_tpu.parallel.tp import make_tp_step  # noqa: E402
from neural_tpu.runtime import init_cache  # noqa: E402
from neural_tpu.runtime.generate import model_step  # noqa: E402


def main():
    coord, nprocs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else "dp"
    init_distributed(coordinator=coord, num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs, jax.process_count()
    if mode == "tp":
        # tp spans BOTH processes: the per-layer psums cross the process
        # boundary — the cross-host tensor-parallel shape of the 70B
        # BASELINE config (reference: mpirun ranks on separate hosts)
        mesh = auto_mesh(tp=nprocs * jax.local_device_count())
    else:
        mesh = auto_mesh(tp=jax.local_device_count())  # dp across processes

    tp = mesh.shape["tp"]
    cfg = ModelConfig(arch="llama", vocab_size=128, hidden_size=64,
                      n_layers=2, n_heads=4,
                      n_kv_heads=2 if tp <= 2 else tp,  # heads % tp == 0
                      head_dim=16, intermediate_size=128, max_seq_len=64)
    params = init_random(cfg, seed=0, dtype=jnp.float32)  # same on all ranks

    B, T, S = nprocs, 5, 32
    rng = np.random.default_rng(0)
    tokens = rng.integers(1, 128, (B, T)).astype(np.int32)  # same everywhere

    # single-(local-)device reference BEFORE touching global arrays
    ref_logits, _ = model_step(params, jnp.asarray(tokens),
                               jnp.zeros((B,), jnp.int32),
                               init_cache(cfg, B, S), cfg)
    ref = np.asarray(ref_logits)

    sparams = shard_params(params, cfg, mesh)
    cache = shard_cache(init_cache(cfg, B, S), mesh)
    ds = data_sharding(mesh)
    gtok = jax.device_put(jnp.asarray(tokens), ds)
    gstart = jax.device_put(jnp.zeros((B,), jnp.int32),
                            jax.sharding.NamedSharding(
                                mesh, jax.sharding.PartitionSpec("dp")))

    step = make_tp_step(params, cfg, mesh)
    logits, cache = step(sparams, gtok, gstart, cache)

    # each process validates ITS dp rows against the local reference
    for shard in logits.addressable_shards:
        rows = shard.index[0]
        # TP changes the psum reduction order (f32): ~2.5e-3 max on these
        # logits — same tolerance class as the single-process TP tests
        np.testing.assert_allclose(np.asarray(shard.data), ref[rows],
                                   rtol=1e-3, atol=5e-3)
    checksum = float(np.abs(ref).sum())
    print(f"MULTIHOST_OK {pid} {checksum:.4f}", flush=True)


if __name__ == "__main__":
    main()
