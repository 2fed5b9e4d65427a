"""Round-trip and oracle tests for the quantized weight container.

Models the reference's prologue_b UT strategy (bestla/bestla/ut/
bestla_prologue_b.cpp — quant/dequant round-trip against kernel_ref.h).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_tpu.core import (
    PRESETS, QuantConfig, quantize, dequantize, matmul_ref,
    pack_codes, unpack_codes, pack_plane, unpack_plane, bit_planes,
)

KEY = jax.random.PRNGKey(0)


def rand(k, shape, scale=1.0):
    return jax.random.normal(jax.random.PRNGKey(k), shape, jnp.float32) * scale


@pytest.mark.parametrize("p", [1, 2, 4, 8])
@pytest.mark.parametrize("chunk", [16, 32, 64])
def test_pack_plane_roundtrip(p, chunk):
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 1 << p, size=(64, 16), dtype=np.uint8)
    packed = pack_plane(jnp.asarray(vals), p, chunk)
    assert packed.shape == (64 * p // 8, 16)
    assert packed.dtype == jnp.uint8
    out = np.asarray(unpack_plane(packed, p, chunk))
    np.testing.assert_array_equal(out, vals)


@pytest.mark.parametrize("bits", list(range(1, 9)))
def test_pack_codes_roundtrip(bits):
    rng = np.random.default_rng(bits)
    codes = rng.integers(0, 1 << bits, size=(64, 24), dtype=np.uint8)
    planes = pack_codes(jnp.asarray(codes), bits, 32)
    assert len(planes) == len(bit_planes(bits))
    out = np.asarray(unpack_codes(planes, bits, 32))
    np.testing.assert_array_equal(out, codes)


@pytest.mark.parametrize("bits", [2, 3, 4, 5, 6, 7, 8])
@pytest.mark.parametrize("sym", [True, False])
def test_int_quant_error_bounded(bits, sym):
    w = rand(1, (128, 64))
    cfg = QuantConfig(bits=bits, sym=sym, group_size=32)
    qt = quantize(w, cfg)
    wd = dequantize(qt)
    assert wd.shape == w.shape
    # RTN error bounded by one scale step per element (sym clamps +absmax to
    # (half-1)*scale, so worst case is a full step; asym zp rounding adds
    # up to scale/2 on top of the scale/2 rounding error).
    g = 32
    wg = np.asarray(w).reshape(-1, g, 64)
    scales = np.asarray(qt.scales, np.float32)
    err = np.abs(np.asarray(wd).reshape(-1, g, 64) - wg)
    assert np.all(err <= scales[:, None, :] * 1.0001 + 1e-6)


def test_int8_exactish():
    w = rand(2, (64, 32))
    qt = quantize(w, QuantConfig(bits=8, group_size=-1))
    wd = np.asarray(dequantize(qt))
    assert np.abs(wd - np.asarray(w)).max() < np.abs(np.asarray(w)).max() / 100


@pytest.mark.parametrize("kind", ["nf4", "fp4"])
def test_lut_quant(kind):
    w = rand(3, (64, 32))
    qt = quantize(w, QuantConfig(kind=kind, group_size=32))
    wd = np.asarray(dequantize(qt))
    # nf4/fp4 nearest-LUT must be within the largest LUT gap * scale
    scales = np.repeat(np.asarray(qt.scales, np.float32), 32, axis=0)
    lut = np.sort(np.asarray(qt.cfg.lut))
    max_gap = np.max(np.diff(lut)) / 2
    assert np.all(np.abs(wd - np.asarray(w)) <= scales * max_gap + 1e-6)


@pytest.mark.parametrize("kind", ["fp8_e4m3", "fp8_e5m2"])
def test_fp8_quant(kind):
    w = rand(4, (64, 32))
    qt = quantize(w, QuantConfig(kind=kind, group_size=32))
    wd = np.asarray(dequantize(qt))
    rel = np.abs(wd - np.asarray(w)) / (np.abs(np.asarray(w)) + 1e-3)
    # e4m3 has ~2 decimal digits
    assert np.median(rel) < 0.05


def test_one_bit():
    w = rand(5, (64, 16))
    qt = quantize(w, QuantConfig(bits=1, group_size=32))
    wd = np.asarray(dequantize(qt))
    assert np.all(np.sign(wd) == np.where(np.asarray(w) >= 0, 1, -1))


@pytest.mark.parametrize("preset", ["q4_0", "q4_j_g128", "q8_0", "nf4", "int3"])
def test_matmul_ref(preset):
    cfg = PRESETS[preset]
    w = rand(6, (256, 128), 0.1)
    x = rand(7, (4, 256))
    qt = quantize(w, cfg)
    out = matmul_ref(x, qt)
    ref = np.asarray(x) @ np.asarray(dequantize(qt))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
    # and close to the unquantized product
    full = np.asarray(x) @ np.asarray(w)
    rel = np.abs(np.asarray(out) - full) / (np.abs(full).mean() + 1e-6)
    assert np.median(rel) < (0.35 if preset == "int3" else 0.1)


def test_act_order_perm_roundtrip():
    """perm semantics: stored rows are W[perm]; dequantize undoes it."""
    from neural_tpu.core.qtensor import QTensor
    w = rand(8, (64, 32))
    perm = jnp.asarray(np.random.default_rng(0).permutation(64))
    qt = quantize(w[perm], QuantConfig(bits=8, group_size=32))
    qt2 = QTensor(qt.planes, qt.scales, qt.zeros, perm, qt.cfg)
    wd = np.asarray(dequantize(qt2))
    wref = np.asarray(dequantize(qt))[np.argsort(np.asarray(perm))]
    np.testing.assert_allclose(wd, wref, rtol=1e-5)


def test_qtensor_is_pytree():
    w = rand(9, (64, 32))
    qt = quantize(w, PRESETS["q4_0"])
    leaves = jax.tree_util.tree_leaves(qt)
    assert all(isinstance(l, jax.Array) for l in leaves)
    # jit through a QTensor argument
    f = jax.jit(lambda x, q: matmul_ref(x, q))
    out = f(rand(10, (2, 64)), qt)
    assert out.shape == (2, 32)


def test_group_size_clamps_to_k():
    """A g128 preset on a small-K projection (test-sized models) degrades
    to one group over K instead of producing a malformed layout (round-4
    verify catch: the native codec silently built a broken QTensor)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from neural_tpu.core import PRESETS
    from neural_tpu.core.qtensor import quantize, dequantize, to_native

    w = np.random.RandomState(0).randn(64, 128).astype(np.float32) * 0.1
    qt = quantize(jnp.asarray(w), PRESETS["q4_j"])   # g=128 > K=64
    assert qt.cfg.group_size == 64
    assert qt.scales.shape[-2] == 1
    wd = np.asarray(dequantize(qt, jnp.float32))
    assert np.abs(wd - w).max() < 0.05
    wn = np.asarray(dequantize(to_native(qt), jnp.float32))
    assert np.allclose(wn, wd, rtol=1e-2, atol=1e-3)

    from neural_tpu import native
    if native.available():
        qn = native.quantize_qtensor(w, PRESETS["q4_j"])
        assert qn.cfg.group_size == 64
        wd2 = np.asarray(dequantize(qn, jnp.float32))
        assert np.abs(wd2 - w).max() < 0.05
