"""Multi-host / multi-chip tensor-parallel inference launcher.

Replaces the reference's MPI launch path (`mpirun -np N ./run_llama ...`,
tests/model-test/run_tp.sh + core/parallel_context.cpp bootstrap): run THIS
SAME command on every host of the slice/cluster; `jax.distributed`
coordinates over DCN, the ("dp", "tp") mesh keeps the per-layer allreduces
on ICI, and only the primary host prints.

Single host, all local chips (tp = local device count):
  python scripts/run_tp.py --model m.gguf --prompt "..."

Multi-host (manual bootstrap — omit the three flags on TPU pods with the
standard launcher, they auto-detect):
  # on host i of N:
  python scripts/run_tp.py --model m.gguf \
      --coordinator host0:8476 --num-processes N --process-id i \
      --tp 8 --dp N

Smoke test without hardware (8 virtual CPU devices):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/run_tp.py --model m.gguf --tp 4 --dp 2
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    help="HF dir, .gguf, or .ntpu checkpoint")
    ap.add_argument("--weight-dtype", default="q4_0")
    ap.add_argument("--prompt", default="Once upon a time")
    ap.add_argument("--max-new-tokens", type=int, default=64)
    ap.add_argument("--max-len", type=int, default=2048)
    ap.add_argument("--tp", type=int, help="tensor-parallel size "
                    "(default: local device count)")
    ap.add_argument("--dp", type=int, help="data-parallel size")
    ap.add_argument("--coordinator", help="host:port of process 0")
    ap.add_argument("--num-processes", type=int)
    ap.add_argument("--process-id", type=int)
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS"):
        # some site setups re-register the default accelerator plugin;
        # honor an explicit platform request both ways
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    import numpy as np

    from neural_tpu.parallel.multihost import (init_distributed, auto_mesh,
                                               is_primary)
    from neural_tpu.parallel.sharding import shard_params, shard_cache
    from neural_tpu.parallel.tp import make_tp_step
    from neural_tpu.runtime import init_cache
    import neural_tpu as nt

    if args.coordinator or args.num_processes:
        init_distributed(args.coordinator, args.num_processes,
                         args.process_id)

    mesh = auto_mesh(tp=args.tp, dp=args.dp)
    log = print if is_primary() else (lambda *a, **k: None)
    log(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))} over "
        f"{len(jax.devices())} devices / {jax.process_count()} hosts")

    # every host loads the full checkpoint and keeps only its shards
    # (reference analog: every rank mmaps the file and reads its slice,
    # model_files.h:1432; device_put with a NamedSharding drops the rest)
    m = nt.Model()
    if os.path.isfile(args.model):
        m.init_from_bin(args.model)
    else:
        m.init(args.model, weight_dtype=args.weight_dtype)
    params, cfg = m.params, m.cfg

    params = shard_params(params, cfg, mesh)
    dp = mesh.devices.shape[0]
    cache = shard_cache(init_cache(cfg, dp, args.max_len), mesh)
    step = make_tp_step(params, cfg, mesh)

    ids = m.tokenizer.encode(args.prompt) if m.tokenizer else \
        [int(x) for x in args.prompt.split()]
    toks = np.tile(np.asarray(ids, np.int32)[None], (dp, 1))
    start = jnp.zeros((dp,), jnp.int32)

    t0 = time.time()
    logits, cache = step(params, jnp.asarray(toks), start, cache)
    nxt = jnp.argmax(logits[:, -1], -1)
    out = [int(np.asarray(nxt)[0])]
    log(f"first token: {(time.time() - t0) * 1e3:.0f} ms")

    pos = len(ids)
    t0 = time.time()
    for _ in range(args.max_new_tokens - 1):
        logits, cache = step(params, jnp.asarray(nxt, jnp.int32)[:, None],
                             jnp.full((dp,), pos, jnp.int32), cache)
        nxt = jnp.argmax(logits[:, -1], -1)
        tok = int(np.asarray(nxt)[0])
        out.append(tok)
        pos += 1
        if tok == cfg.eos_token_id:
            break
    dt = time.time() - t0
    log(f"decode: {len(out) - 1} tokens, "
        f"{(len(out) - 1) / max(dt, 1e-9):.1f} tok/s")
    if m.tokenizer:
        log(args.prompt + m.tokenizer.decode(out))
    else:
        log("output ids:", out)


if __name__ == "__main__":
    main()
