"""Native C++ codec vs the Python/jnp implementations (exact agreement).

Models the reference's kernel_intrin UT strategy (optimized impl vs
kernel_ref.h scalar oracle).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from neural_tpu import native
from neural_tpu.core import QuantConfig, quantize, dequantize
from neural_tpu.core.qtensor import pack_plane as py_pack, \
    unpack_plane as py_unpack, pack_chunk

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


@pytest.mark.parametrize("bits,sym", [(4, True), (4, False), (8, True),
                                      (3, True), (2, False), (1, True)])
def test_rtn_matches_python(bits, sym):
    if bits == 1 and not sym:
        pytest.skip("1-bit is always sym")
    rng = np.random.default_rng(0)
    w = rng.standard_normal((128, 64)).astype(np.float32)
    cfg = QuantConfig(bits=bits, sym=sym, group_size=32)
    qt_native = native.quantize_qtensor(w, cfg)
    qt_py = quantize(jnp.asarray(w), cfg)
    # identical packed bytes, scales, zeros
    for a, b in zip(qt_native.planes, qt_py.planes):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(qt_native.scales),
                               np.asarray(qt_py.scales), rtol=1e-6)
    if qt_py.zeros is not None:
        np.testing.assert_array_equal(np.asarray(qt_native.zeros),
                                      np.asarray(qt_py.zeros))


@pytest.mark.parametrize("p", [1, 2, 4, 8])
def test_pack_unpack_matches(p):
    rng = np.random.default_rng(p)
    vals = rng.integers(0, 1 << p, (128, 32)).astype(np.uint8)
    a = native.pack_plane(vals, p, 32)
    b = np.asarray(py_pack(jnp.asarray(vals), p, 32))
    np.testing.assert_array_equal(a, b)
    back = native.unpack_plane(a, p, 32)
    np.testing.assert_array_equal(back, vals)


def test_q4_0_decode_matches_gguf_reader():
    from neural_tpu.convert.gguf import _pack_q4_0
    rng = np.random.default_rng(3)
    w = rng.standard_normal(256).astype(np.float32)
    blocks = np.frombuffer(_pack_q4_0(w), np.uint8)
    out = native.dequant_q4_0(blocks, 256)
    # python reference decode
    blk = blocks.reshape(-1, 18)
    d = blk[:, :2].copy().view(np.float16)[:, 0].astype(np.float32)
    q = blk[:, 2:]
    ref = np.concatenate([(q & 0xF), (q >> 4)], 1).astype(np.int8) - 8
    ref = ref.astype(np.float32) * d[:, None]
    np.testing.assert_allclose(out, ref.reshape(-1), rtol=1e-6)


def test_native_threads_reported():
    assert native.get_lib().ntpu_native_threads() >= 1
    assert native.get_lib().ntpu_native_version() == 1
