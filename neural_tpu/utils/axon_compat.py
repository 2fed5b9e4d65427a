"""Runtime workaround: sub-byte (int4) jit arguments on the axon PJRT client.

The tunneled TPU runtime ("axon") reports device arrays' layouts with
``sub_byte_element_size_in_bits=0`` while compiled executables declare the
same physical layout with ``=4`` for S4/U4 inputs. jax's argument-sharding
fast path compares ``x.format.layout == expected_layout`` (jax/_src/array.py
``_array_shard_arg``), so every int4 argument spuriously looks mis-laid-out
and is routed into ``device_put(x, Format(...))`` — which itself runs a jit
over the same int4 array and recurses forever (RecursionError).

The fix: wrap the registered shard-arg handler and, for sub-byte dtypes
whose array/expected layouts agree on ``major_to_minor`` and ``tiling``
(i.e. the physical layout IS identical), drop the expected layout to None
so the fast path takes the already-on-device buffer as-is. Everything else
passes through untouched.

This is what makes "convert quantized weights to native int4 codes ONCE at
load" possible (reference analog: packed weights are load-time artifacts,
bestla/bestla/bestla_storage.h:697) — without it every decode executable
had to re-run the uint8→int4 conversion in-jit, keeping a second full copy
of the model live (the round-2 HBM OOM).

No-op on runtimes without the bug: the patch only rewrites comparisons
that already agree physically, so behavior is identical on CPU/GPU/real
TPU runtimes.
"""
from __future__ import annotations

_applied = False


def _subbyte(dtype) -> bool:
    name = getattr(dtype, "name", str(dtype))
    return name in ("int4", "uint4", "int2", "uint2")


def _same_physical(a, b) -> bool:
    """Layouts equal modulo the sub_byte_element_size_in_bits field."""
    try:
        return (a.major_to_minor == b.major_to_minor
                and a.tiling == b.tiling)
    except AttributeError:
        return False


def apply() -> None:
    """Install the shard-arg layout shim (idempotent)."""
    global _applied
    if _applied:
        return
    _applied = True
    try:
        from jax._src import array as _array
        from jax._src.interpreters import pxla as _pxla
    except Exception:  # pragma: no cover - jax internals moved
        return

    orig = _pxla.shard_arg_handlers.get(_array.ArrayImpl)
    if orig is None:  # pragma: no cover
        return

    def patched(xs, shardings, layouts, copy_semantics):
        # Args whose physical layout+sharding already match pass through
        # AS-IS (true REUSE_INPUT): the axon client's device-to-device
        # copy hangs on sub-byte buffers, and its relayout path recurses.
        take = [None] * len(xs)
        rest = []
        for i, (x, sharding, layout) in enumerate(
                zip(xs, shardings, layouts)):
            if _subbyte(getattr(x, "dtype", None)):
                try:
                    phys_ok = (layout is None
                               or _same_physical(x.format.layout, layout))
                    shard_ok = (x.sharding == sharding
                                or x.sharding.device_set
                                == sharding.device_set)
                    if phys_ok and shard_ok and not getattr(
                            x, "is_deleted", lambda: False)():
                        take[i] = x
                        continue
                except Exception:
                    pass
            rest.append(i)
        if not rest:
            return take
        out = orig([xs[i] for i in rest], [shardings[i] for i in rest],
                   [layouts[i] for i in rest],
                   [copy_semantics[i] for i in rest])
        for i, r in zip(rest, out):
            take[i] = r
        return take

    _pxla.shard_arg_handlers[_array.ArrayImpl] = patched
