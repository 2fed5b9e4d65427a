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
    ap.add_argument("--do-sample", action="store_true",
                    help="sampled decode (full sampling stack on-device)")
    ap.add_argument("--temperature", type=float, default=0.8)
    ap.add_argument("--top-k", type=int, default=40)
    ap.add_argument("--top-p", type=float, default=0.95)
    ap.add_argument("--repeat-penalty", type=float, default=1.1)
    ap.add_argument("--seed", type=int, default=0)
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

    from neural_tpu.parallel.multihost import (init_distributed, auto_mesh,
                                               is_primary)
    from neural_tpu.parallel.sharding import shard_params
    from neural_tpu.parallel.tp import tp_generate
    from neural_tpu.runtime.sampling import SamplingParams
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

    ids = m.tokenizer.encode(args.prompt) if m.tokenizer else \
        [int(x) for x in args.prompt.split()]
    dp = mesh.devices.shape[0]
    sp = SamplingParams(greedy=not args.do_sample,
                        temperature=args.temperature, top_k=args.top_k,
                        top_p=args.top_p,
                        repeat_penalty=args.repeat_penalty)

    # the whole generation is TWO dispatches: one sharded ragged prefill +
    # one on-device sharded decode scan (per-layer psums ride ICI inside
    # the loop; no host round trip per token)
    t0 = time.time()
    outs = tp_generate(params, cfg, mesh, [ids] * dp, sampling=sp,
                       max_new_tokens=args.max_new_tokens,
                       max_len=args.max_len, seed=args.seed, sharded=True)
    dt = time.time() - t0
    out = outs[0][len(ids):]
    log(f"generate: {len(out)} tokens in {dt:.2f}s "
        f"({len(out) / max(dt, 1e-9):.1f} tok/s incl. compile)")
    if m.tokenizer:
        log(args.prompt + m.tokenizer.decode(out))
    else:
        log("output ids:", out)


if __name__ == "__main__":
    main()
