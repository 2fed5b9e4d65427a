"""Probe: pltpu.bitcast(uint8 -> int2) + int2->f32 convert in Mosaic."""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("has int2:", hasattr(jnp, "int2"))

def kern(x_ref, o_ref):
    x = x_ref[...]
    w = pltpu.bitcast(x, jnp.int2)          # [4R, N]?
    o_ref[...] = w.astype(jnp.float32)

R, N = 8, 128
x = jnp.asarray((np.arange(R * N) % 256).astype(np.uint8).reshape(R, N))
try:
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((4 * R, N), jnp.float32),
        in_specs=[pl.BlockSpec((R, N), lambda: (0, 0))],
        out_specs=pl.BlockSpec((4 * R, N), lambda: (0, 0)),
    )
    y = np.asarray(jax.block_until_ready(f(x)))
    print("int2 bitcast+convert ran; sample:", y[:5, :3].ravel())
    # check semantics: byte b -> rows 4r..4r+3, 2-bit fields, signed?
    b = np.asarray(x, np.uint8)
    print("byte0:", b[0, 0], "decoded rows:", y[0, 0], y[1, 0], y[2, 0], y[3, 0])
except Exception as e:
    print("int2 FAIL:", str(e).splitlines()[0][:160])
    for ln in str(e).splitlines():
        if "Not implemented" in ln or "implement" in ln or "nsupported" in ln:
            print("  ", ln[:160])
