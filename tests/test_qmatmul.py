"""Pallas fused dequant-matmul vs the jnp oracle.

Models the reference's GEMM UT strategy (bestla/bestla/ut/bestla_gemm.cpp:
every Launcher config vs the scalar reference). Runs the kernel in
interpreter mode on CPU; the same kernel compiles for TPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_tpu.core import PRESETS, QuantConfig, quantize, matmul_ref
from neural_tpu.core.qtensor import dequantize
from neural_tpu.ops import qmatmul


def mk(k, shape, scale=0.1):
    return jax.random.normal(jax.random.PRNGKey(k), shape, jnp.float32) * scale


def check(preset_or_cfg, M=32, K=256, N=128, atol=2e-2):
    cfg = PRESETS[preset_or_cfg] if isinstance(preset_or_cfg, str) else preset_or_cfg
    w = mk(0, (K, N))
    x = mk(1, (M, K), 1.0)
    qt = quantize(w, cfg)
    ref = np.asarray(matmul_ref(x, qt, jnp.float32))
    out = np.asarray(qmatmul(x, qt, out_dtype=jnp.float32, interpret=True))
    assert out.shape == ref.shape
    # bf16 x/w rounding inside the kernel vs f32 oracle
    np.testing.assert_allclose(out, ref, atol=atol + 0.02 * np.abs(ref).max(), rtol=0.05)


@pytest.mark.parametrize("preset", [
    "q4_0", "q4_1", "q8_0", "int8", "int5", "int3", "int2", "int1",
    "nf4", "fp4", "fp8", "fp8_e5m2", "q4_j_g128",
])
def test_presets_match_oracle(preset):
    check(preset)


@pytest.mark.parametrize("bits", [6, 7])
def test_odd_bits(bits):
    check(QuantConfig(bits=bits, group_size=64))


def test_per_channel_groups():
    check(QuantConfig(bits=8, group_size=-1))


def test_decode_m1():
    """M=1 GEMV decode path (padded to tile internally)."""
    check("q4_0", M=1)


def test_odd_m():
    check("q4_0", M=5)


def test_big_n_tile():
    check("q4_0", K=512, N=512)


def test_leading_dims():
    cfg = PRESETS["q4_0"]
    w = mk(0, (256, 128))
    x = mk(1, (2, 3, 256), 1.0)
    qt = quantize(w, cfg)
    out = qmatmul(x, qt, interpret=True)
    assert out.shape == (2, 3, 128)
    ref = matmul_ref(x.reshape(6, 256), qt)
    np.testing.assert_allclose(
        np.asarray(out).reshape(6, 128), np.asarray(ref), atol=0.05, rtol=0.05)


def test_act_order_perm():
    from neural_tpu.core.qtensor import QTensor
    w = mk(0, (256, 128))
    x = mk(1, (4, 256), 1.0)
    perm = jnp.asarray(np.random.default_rng(3).permutation(256))
    qt = quantize(w[perm], PRESETS["q4_0"])
    qt = QTensor(qt.planes, qt.scales, qt.zeros, perm, qt.cfg)
    out = np.asarray(qmatmul(x, qt, out_dtype=jnp.float32, interpret=True))
    ref = np.asarray(matmul_ref(x, qt, jnp.float32))
    np.testing.assert_allclose(out, ref, atol=0.05, rtol=0.05)


def test_xla_fallback_matches():
    cfg = PRESETS["q4_0"]
    w = mk(0, (256, 128))
    x = mk(1, (8, 256), 1.0)
    qt = quantize(w, cfg)
    a = np.asarray(qmatmul(x, qt, out_dtype=jnp.float32, force="xla"))
    b = np.asarray(qmatmul(x, qt, out_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(a, b, atol=0.05, rtol=0.05)


@pytest.mark.parametrize("sym", [True, False])
def test_native_int4_pallas_matches_oracle(sym):
    from neural_tpu.core import to_native
    cfg = QuantConfig(bits=4, sym=sym, group_size=32)
    w = mk(0, (256, 128))
    x = mk(1, (4, 256), 1.0)
    qt = quantize(w, cfg)
    qtn = to_native(qt)
    assert qtn.planes[0].dtype == jnp.int4
    ref = np.asarray(matmul_ref(x, qt, jnp.float32))
    out = np.asarray(qmatmul(x, qtn, out_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(out, ref, atol=0.05, rtol=0.05)


def test_native_int4_stacked_lidx():
    from neural_tpu.core import to_native
    import jax
    cfg = QuantConfig(bits=4, sym=True, group_size=32)
    ws = [mk(i, (256, 128)) for i in range(3)]
    x = mk(9, (4, 256), 1.0)
    qts = [to_native(quantize(w, cfg)) for w in ws]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *qts)
    for l in range(3):
        ref = np.asarray(matmul_ref(x, quantize(ws[l], cfg), jnp.float32))
        out = np.asarray(qmatmul(x, stacked, out_dtype=jnp.float32,
                                 interpret=True, lidx=jnp.int32(l)))
        np.testing.assert_allclose(out, ref, atol=0.05, rtol=0.05)


def test_multiblock_grid_stacked_lidx():
    """Multi-block N and K grids (j,k > 1) with a stacked packed QTensor.

    Regression test: the stacked path's output BlockSpec once reused the
    x-operand index map (i, k) instead of (i, j) — invisible on (1,1,1)
    grids, garbage on real models (wrong/never-written output tiles).
    """
    cfg = PRESETS["q4_0"]
    K, N, L = 1536, 512, 3          # tk=512 -> k-grid 3, tn=256 -> j-grid 2
    ws = [mk(i, (K, N)) for i in range(L)]
    x = mk(9, (4, K), 1.0)
    qts = [quantize(w, cfg) for w in ws]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *qts)
    for l in range(L):
        ref = np.asarray(matmul_ref(x, qts[l], jnp.float32))
        out = np.asarray(qmatmul(x, stacked, out_dtype=jnp.float32,
                                 interpret=True, lidx=jnp.int32(l)))
        np.testing.assert_allclose(out, ref, atol=0.05 + 0.02 * np.abs(ref).max(),
                                   rtol=0.05)


def test_multiblock_grid_native_stacked_lidx():
    """Same multi-block regression check for the native-int4 stacked path."""
    from neural_tpu.core import to_native
    cfg = QuantConfig(bits=4, sym=True, group_size=32)
    K, N, L = 1536, 512, 3
    ws = [mk(i, (K, N)) for i in range(L)]
    x = mk(9, (4, K), 1.0)
    qts = [quantize(w, cfg) for w in ws]
    native = [to_native(q) for q in qts]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *native)
    for l in range(L):
        ref = np.asarray(matmul_ref(x, qts[l], jnp.float32))
        out = np.asarray(qmatmul(x, stacked, out_dtype=jnp.float32,
                                 interpret=True, lidx=jnp.int32(l)))
        np.testing.assert_allclose(out, ref, atol=0.05 + 0.02 * np.abs(ref).max(),
                                   rtol=0.05)


def test_multiblock_grid_unstacked():
    check("q4_0", M=32, K=1536, N=512)


# ---- native-int4 decode kernel (_qmatmul4_pallas) ----

def _check_decode4(cfg, M=1, K=512, N=512, stacked=False, L=3, float_zeros=False):
    from neural_tpu.core import to_native
    ws = [mk(i, (K, N)) for i in range(L if stacked else 1)]
    x = mk(9, (M, K), 1.0)
    qts = [quantize(w, cfg) for w in ws]
    if float_zeros:
        from neural_tpu.core.qtensor import QTensor
        qts = [QTensor(q.planes, q.scales,
                       (q.zeros.astype(jnp.float32) + 0.25), q.perm, q.cfg)
               for q in qts]
    native = [to_native(q) for q in qts]
    if stacked:
        st = jax.tree.map(lambda *xs: jnp.stack(xs), *native)
        for l in range(L):
            ref = np.asarray(matmul_ref(x, qts[l], jnp.float32))
            out = np.asarray(qmatmul(x, st, out_dtype=jnp.float32,
                                     interpret=True, lidx=jnp.int32(l)))
            np.testing.assert_allclose(
                out, ref, atol=0.05 + 0.02 * np.abs(ref).max(), rtol=0.05)
    else:
        ref = np.asarray(matmul_ref(x, qts[0], jnp.float32))
        out = np.asarray(qmatmul(x, native[0], out_dtype=jnp.float32,
                                 interpret=True))
        np.testing.assert_allclose(
            out, ref, atol=0.05 + 0.02 * np.abs(ref).max(), rtol=0.05)


def test_decode4_sym():
    _check_decode4(QuantConfig(bits=4, sym=True, group_size=32))


def test_decode4_asym_zero_comp():
    """uint8 zero-points folded into the xs @ (z*s) compensation matmul."""
    _check_decode4(QuantConfig(bits=4, sym=False, group_size=32))


def test_decode4_float_zeros():
    """GGUF Q4_1-style float zero-points through the compensation path."""
    _check_decode4(QuantConfig(bits=4, sym=False, group_size=32),
                   float_zeros=True)


def test_decode4_stacked():
    _check_decode4(QuantConfig(bits=4, sym=True, group_size=32), stacked=True)


def test_decode4_stacked_asym():
    _check_decode4(QuantConfig(bits=4, sym=False, group_size=32), stacked=True)


def test_decode4_odd_group_count():
    """K=352, g=32 -> G=11 rows: not sublane-aligned, Mosaic must pad."""
    _check_decode4(QuantConfig(bits=4, sym=False, group_size=32), K=352)


def test_decode4_m_up_to_16():
    _check_decode4(QuantConfig(bits=4, sym=True, group_size=32), M=13)


def test_decode4_g128():
    _check_decode4(QuantConfig(bits=4, sym=False, group_size=128), K=1024)


def test_decode8_sym_native():
    """q8_0-style: centered int8 native codes through the decode kernel."""
    from neural_tpu.core import to_native
    cfg = QuantConfig(bits=8, sym=True, group_size=32)
    w = mk(0, (512, 512))
    x = mk(9, (1, 512), 1.0)
    qt = quantize(w, cfg)
    nat = to_native(qt)
    assert nat.planes[0].dtype == jnp.int8
    ref = np.asarray(matmul_ref(x, qt, jnp.float32))
    out = np.asarray(qmatmul(x, nat, out_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(out, ref, atol=0.05 + 0.02 * np.abs(ref).max(),
                               rtol=0.05)


# ---------------------------------------------------------------------------
# int8-compute (w4a8 / w8a8) path
# ---------------------------------------------------------------------------


def check_a8(cfg, M=256, K=512, N=256, stacked=False):
    """Kernel (interpret) vs the a8 oracle must agree to f32-accumulation
    noise; the a8 oracle vs the float oracle bounds the act-quant error."""
    from neural_tpu.ops.qmatmul import matmul_a8_ref, _pick_a8

    picked = _pick_a8(M, K, N, cfg)
    assert picked is not None, "a8 path not selected"
    gd = picked[3]
    w = mk(0, (K, N))
    x = mk(1, (M, K), 1.0)
    qt = quantize(w, cfg)
    if stacked:
        qt = jax.tree.map(lambda a: jnp.stack([a, a * 0 + a]), qt)
        out = np.asarray(qmatmul(x, qt, out_dtype=jnp.float32,
                                 interpret=True, lidx=1))
        qt = jax.tree.map(lambda a: a[1], qt)
    else:
        out = np.asarray(qmatmul(x, qt, out_dtype=jnp.float32,
                                 interpret=True))
    ref = np.asarray(matmul_a8_ref(x, qt, gd, jnp.float32))
    np.testing.assert_allclose(out, ref, atol=1e-3 + 1e-4 * np.abs(ref).max(),
                               rtol=1e-4)
    fref = np.asarray(matmul_ref(x, qt, jnp.float32))
    np.testing.assert_allclose(out, fref, atol=0.05 * np.abs(fref).max(),
                               rtol=0.1)


def test_a8_w4_sym_g128():
    check_a8(QuantConfig(bits=4, group_size=128, sym=True, act_bits=8))


def test_a8_w4_asym_g128():
    """q4_j_i8_g128: asym weights exercise zero-point compensation."""
    check_a8(PRESETS["q4_j_i8_g128"])


def test_a8_w8_per_channel():
    check_a8(QuantConfig(bits=8, group_size=-1, sym=True, act_bits=8))


def test_a8_w8_g256():
    check_a8(QuantConfig(bits=8, group_size=256, sym=True, act_bits=8))


def test_a8_stacked_lidx():
    check_a8(QuantConfig(bits=4, group_size=128, sym=True, act_bits=8),
             stacked=True)


def test_a8_scratch_mode_kernel_flavor():
    """The VMEM code-scratch a8 flavor (mode="scratch": codes quantized
    once at the first N-tile into scratch, x DMA elided for j > 0) is a
    KEPT LAB PATH — dispatch never selects it (measured slower than the
    external-quantize path on hardware, see qmatmul.py dispatch note) —
    so drive it explicitly and pin it to the quantize_act_i8 oracle over
    a multi-N-tile, multi-K-tile grid."""
    from neural_tpu.ops.qmatmul import (_pick_a8, _qmatmul_a8_pallas,
                                        matmul_a8_ref, quantize_act_i8)
    cfg = QuantConfig(bits=4, group_size=128, sym=True, act_bits=8)
    M, K, N = 256, 512, 1280
    tm, tn, tk, gd = _pick_a8(M, K, N, cfg)
    assert N // tn > 4, "shape no longer has multiple N-tiles"
    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    qt = quantize(w, cfg)
    _, sa = quantize_act_i8(x, gd)          # scales still come from XLA
    out = _qmatmul_a8_pallas(x, sa, qt, tm, tn, tk, gd,
                             out_dtype=jnp.float32, interpret=True,
                             mode="scratch")
    ref = np.asarray(matmul_a8_ref(x, qt, gd, jnp.float32))
    np.testing.assert_allclose(np.asarray(out), ref,
                               atol=1e-3 + 1e-4 * np.abs(ref).max(),
                               rtol=1e-4)


def test_a8_many_n_tiles_external_dispatch():
    """N/tn > 4 dispatches the external-quantize flavor (the measured
    fastest there); numerics must match the a8 oracle."""
    check_a8(QuantConfig(bits=4, group_size=128, sym=True, act_bits=8),
             M=256, K=512, N=1280)


def test_a8_multiblock():
    check_a8(QuantConfig(bits=4, group_size=128, sym=False, act_bits=8),
             M=512, K=1024, N=512)


def test_a8_not_picked_small_m_or_g32():
    from neural_tpu.ops.qmatmul import _pick_a8

    assert _pick_a8(16, 512, 256, PRESETS["q4_j_i8_g128"]) is None
    assert _pick_a8(256, 512, 256, PRESETS["q4_j_i8_g32"]) is None
    assert _pick_a8(256, 512, 256, PRESETS["q4_0"]) is None


def test_quantize_act_i8_roundtrip():
    from neural_tpu.ops.qmatmul import quantize_act_i8

    x = mk(2, (8, 256), 3.0)
    q, sa = quantize_act_i8(x, 128)
    assert q.dtype == jnp.int8 and sa.shape == (8, 2)
    xr = np.asarray(q, np.float32).reshape(8, 2, 128) * np.asarray(sa)[:, :, None]
    np.testing.assert_allclose(xr.reshape(8, 256), np.asarray(x),
                               atol=float(np.abs(x).max()) / 127 * 0.51)


@pytest.mark.parametrize("bits,sym", [(2, True), (3, True), (3, False),
                                      (5, True), (6, False), (7, True),
                                      (8, False)])
def test_native_oddbit_remap(bits, sym):
    """Odd widths remap losslessly into int4/int8 hardware-convert codes
    (decode streams at native rate instead of VPU bit-plane unpack)."""
    from neural_tpu.core import to_native
    cfg = QuantConfig(bits=bits, sym=sym, group_size=32)
    w = mk(0, (256, 128))
    x = mk(1, (4, 256), 1.0)
    qt = quantize(w, cfg)
    qtn = to_native(qt)
    if bits == 2:
        # int2 converts to its own native-pack byte layout (4 codes/byte,
        # pltpu.bitcast path) — HALF the streamed bytes of an int4
        # container, jit-boundary safe
        assert qtn.cfg.native_pack and qtn.planes[0].dtype == jnp.uint8
        assert qtn.planes[0].shape[0] == qt.K // 4
    else:
        assert qtn.planes[0].dtype == (jnp.int4 if bits <= 4 else jnp.int8)
    # exact code remap: only the documented bf16 scale downcast may differ
    np.testing.assert_allclose(
        np.asarray(dequantize(qt)), np.asarray(dequantize(qtn)),
        rtol=5e-3, atol=5e-4)
    ref = np.asarray(matmul_ref(x, qt, jnp.float32))
    out = np.asarray(qmatmul(x, qtn, out_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(out, ref, atol=0.05, rtol=0.05)


def test_decode4_per_tensor_scale():
    """group_size=-1 (one group spans K): grouped-partial loop of 1."""
    _check_decode4(QuantConfig(bits=4, sym=True, group_size=-1), K=256)


def test_decode4_many_groups_fallback():
    """G > 256 takes the scale-the-weights branch (unroll guard)."""
    _check_decode4(QuantConfig(bits=4, sym=True, group_size=32), K=16384,
                   N=256)


@pytest.mark.parametrize("bits,sym", [(4, True), (4, False), (3, True),
                                      (2, False), (2, True)])
def test_native_pack_matmul_matches_oracle(bits, sym):
    """At-rest uint8 native-pack storage (in-kernel uint8→int4 bitcast):
    the decode and prefill kernels must match the dequant oracle built
    from the SAME storage."""
    from neural_tpu.core.qtensor import to_native_packed, matmul_ref

    rng = np.random.default_rng(bits * 7 + sym)
    K, N = 256, 256
    w = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32))
    qt = quantize(w, QuantConfig(bits=bits, sym=sym, group_size=32))
    npk = to_native_packed(qt)
    assert npk.cfg.native_pack and npk.planes[0].dtype == jnp.uint8
    assert npk.K == K and npk.N == N

    # decode shape (small M → _qmm4_kernel full-K stripe)
    x = jnp.asarray(rng.standard_normal((2, K)).astype(np.float32))
    ref = matmul_ref(x, npk)
    out = qmatmul(x, npk, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)

    # prefill shape (large M → _qmm_kernel K-tiled path)
    xb = jnp.asarray(rng.standard_normal((256, K)).astype(np.float32))
    refb = matmul_ref(xb, npk)
    outb = qmatmul(xb, npk, interpret=True)
    np.testing.assert_allclose(np.asarray(outb), np.asarray(refb),
                               atol=5e-1, rtol=5e-2)


def test_native_pack_a8_matches_oracle():
    """int8-compute prefill path over native-pack storage."""
    from neural_tpu.core.qtensor import to_native_packed
    from neural_tpu.ops.qmatmul import matmul_a8_ref

    rng = np.random.default_rng(11)
    K, N = 512, 256
    w = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32))
    qt = quantize(w, QuantConfig(bits=4, sym=False, group_size=128,
                                 act_bits=8))
    npk = to_native_packed(qt)
    x = jnp.asarray(rng.standard_normal((256, K)).astype(np.float32))
    ref = matmul_a8_ref(x, npk, gd=128)
    out = qmatmul(x, npk, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-1, rtol=5e-2)


def test_native_pack_stacked_lidx():
    """[L, ...]-stacked native-pack planes stream per layer via the
    prefetched index (the decode-loop fast path)."""
    from neural_tpu.core.qtensor import to_native_packed, matmul_ref
    import jax

    rng = np.random.default_rng(3)
    K, N, L = 256, 128, 3
    qts = [quantize(jnp.asarray(
        rng.standard_normal((K, N)).astype(np.float32)),
        QuantConfig(bits=4, sym=True, group_size=32)) for _ in range(L)]
    npks = [to_native_packed(q) for q in qts]
    stack = jax.tree.map(lambda *xs: jnp.stack(xs), *npks)
    x = jnp.asarray(rng.standard_normal((2, K)).astype(np.float32))
    for l in range(L):
        ref = matmul_ref(x, npks[l])
        out = qmatmul(x, stack, interpret=True, lidx=l)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-2, rtol=5e-2)


def test_params_to_native_end_to_end():
    """Native-at-rest params (the TPU load-time conversion, forced here on
    CPU) must generate the same tokens as the packed originals through the
    full decode pipeline — prepare_params becomes a no-op and forward
    unrolls over the stacked planes."""
    import jax
    from neural_tpu.convert import init_random
    from neural_tpu.models.config import ModelConfig
    from neural_tpu.runtime.generate import (batched_generate,
                                             params_to_native,
                                             prepare_params)
    from neural_tpu.runtime.sampling import SamplingParams

    cfg = ModelConfig(arch="llama", vocab_size=256, hidden_size=128,
                      n_layers=2, n_heads=8, n_kv_heads=4, head_dim=16,
                      intermediate_size=256, max_seq_len=64)
    params = init_random(cfg, quant="q4_0", dtype=jnp.float32)
    rows = [[3, 14, 15], [9, 2, 6, 5]]
    sp = SamplingParams(greedy=True, repeat_last_n=0)
    ref = batched_generate(params, cfg, rows, sp, max_new_tokens=6,
                           stop_at_eos=False)

    nat = params_to_native(params, donate=False, force=True,
                           min_elems=0)
    from neural_tpu.core.qtensor import is_native
    qts = [l for l in jax.tree.leaves(
        nat, is_leaf=lambda x: hasattr(x, "planes"))
        if hasattr(l, "planes")]
    assert qts and all(is_native(q) for q in qts)
    assert isinstance(nat["layers"], tuple)   # per-layer at rest
    assert prepare_params(nat) is nat          # no-op at rest

    # bf16 scale storage in the native form rounds logits slightly —
    # compare against the same-storage oracle instead of exact ids:
    out = batched_generate(nat, cfg, rows, sp, max_new_tokens=6,
                           stop_at_eos=False)
    # tokens may diverge only at near-ties; require first tokens equal
    # and full agreement against a re-run (determinism)
    out2 = batched_generate(nat, cfg, rows, sp, max_new_tokens=6,
                            stop_at_eos=False)
    assert out == out2
    for o, r, prompt in zip(out, ref, rows):
        # prompt plus the first generated token must agree exactly: the
        # first-step logit margins are far above bf16 scale rounding
        assert o[:len(prompt) + 1] == r[:len(prompt) + 1]
        assert len(o) == len(r)

    # int8 KV also works over native-at-rest params
    out_i8 = batched_generate(nat, cfg, rows, sp, max_new_tokens=4,
                              stop_at_eos=False, kv_dtype="int8")
    assert [len(o) for o in out_i8] == [len(r) + 4 for r in rows]


def test_decode_m1_win8_matches_oracle():
    """The M=1 windowed-sublane-groups decode path (8 groups per 8
    sublanes, scripts/exp_dec4b.py win8 — 1017 vs 828 GB/s on v5e) must
    match the oracle for sym, asym (rank-G zp compensation) and
    native-pack storage."""
    import jax
    from neural_tpu.core import QuantConfig, quantize
    from neural_tpu.core.qtensor import matmul_ref, to_native, \
        to_native_packed
    rng = np.random.default_rng(21)
    K, N = 512, 256
    x = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))
    for cfgq, conv in [
            (QuantConfig(bits=4, group_size=32, sym=True), to_native),
            (QuantConfig(bits=4, group_size=32, sym=False), to_native),
            (QuantConfig(bits=4, group_size=32, sym=True),
             to_native_packed),
            (QuantConfig(bits=8, group_size=64, sym=True), to_native),
            (QuantConfig(bits=3, group_size=32, sym=False), to_native)]:
        w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
        qt = conv(quantize(jnp.asarray(w), cfgq))
        ref = matmul_ref(x, qt, jnp.float32)
        out = qmatmul(x, qt, out_dtype=jnp.float32, force="pallas",
                      interpret=True)
        assert out.shape == (1, N)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-2, rtol=2e-2), (cfgq, conv)


def test_native_pack_int2_cpu_fallback():
    """qmatmul_native (the non-Pallas consumer of at-rest native-pack
    planes) must unpack int2's 4-fields-per-byte layout — round-5 verify
    caught it reshaping 2 nibbles per byte and crashing."""
    from neural_tpu.core.qtensor import to_native_packed, matmul_ref
    rng = np.random.default_rng(3)
    K, N = 128, 128
    w = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32))
    qt = to_native_packed(quantize(w, QuantConfig(bits=2, sym=True,
                                                  group_size=32)))
    x = jnp.asarray(rng.standard_normal((2, K)).astype(np.float32))
    ref = matmul_ref(x, qt)
    out = qmatmul(x, qt, force="xla")          # CPU fallback path
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)
