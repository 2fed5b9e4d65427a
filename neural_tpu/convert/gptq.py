"""GPTQ / AWQ quantized-checkpoint import.

Reference: neural_speed/convert/convert_quantized_llama.py:31-101 — unpack
qweight/qzeros/scales, undo g_idx act-order, repack (np_bestla_qpack).
Here the unpacked weights repack losslessly into QTensor: act-order becomes
the QTensor ``perm`` (activations are gathered at matmul time), zeros
become per-group uint8 zero-points.

Conventions implemented:
- GPTQ (AutoGPTQ v1): qweight int32 [K/8, N], 8 nibbles per word along K
  (LSB-first); qzeros int32 [G, N/8], nibbles along N, stored as z-1
  (``zero_plus_one``); scales [G, N] f16; optional g_idx [K] for
  act-order.
- AWQ (GEMM kernels): qweight int32 [K, N/8], nibbles along N in the
  interleaved order (0,2,4,6,1,3,5,7); qzeros [G, N/8] same packing, no
  +1; scales [G, N].
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dtypes import QuantConfig
from ..core.qtensor import QTensor, pack_codes

AWQ_ORDER = np.array([0, 2, 4, 6, 1, 3, 5, 7])


def unpack_int32_nibbles(x: np.ndarray, axis: int,
                         order: Optional[np.ndarray] = None) -> np.ndarray:
    """int32 array → uint8 nibbles expanded 8x along ``axis`` (LSB first,
    optionally permuted by ``order``)."""
    x = x.astype(np.uint32)
    shifts = np.arange(8, dtype=np.uint32) * 4
    if order is not None:
        shifts = shifts[np.argsort(order)]  # logical position j ← nibble
    nib = (x[..., None] >> shifts) & 0xF    # [..., 8]
    nib = np.moveaxis(nib, -1, axis + 1 if axis >= 0 else axis)
    shape = list(x.shape)
    shape[axis] *= 8
    return nib.reshape(shape).astype(np.uint8)


def unpack_int32_fields(x: np.ndarray, bits: int, axis: int,
                        fmt3: str = "straddle",
                        out_len: Optional[int] = None) -> np.ndarray:
    """GPTQ word unpack for bits ∈ {2, 3, 4, 8}: int32 array → uint8
    codes expanded along ``axis``, LSB-first. 2/4/8-bit pack 32//bits
    values per word (all ecosystems agree).

    3-bit has TWO circulating layouts:
    - ``fmt3="straddle"`` — AutoGPTQ's qlinear ``pack()``: 32 values per
      3 words, two values split across word boundaries (value 10: 2 low
      bits at word0[30:32] + 1 high bit at word1[0]; value 21: 1 low bit
      at word1[31] + 2 high bits at word2[0:2]).
    - ``fmt3="tenper"`` — the layout the reference's importer consumes
      (convert/common.py unpack_gptq_weight_3bits: offsets 0,3,...,27):
      10 values per word, top 2 bits unused; the unpacked run truncates
      to ``out_len`` real values.
    """
    if bits in (2, 4, 8):
        per = 32 // bits
        x = x.astype(np.uint32)
        shifts = np.arange(per, dtype=np.uint32) * bits
        v = (x[..., None] >> shifts) & ((1 << bits) - 1)
        v = np.moveaxis(v, -1, axis + 1 if axis >= 0 else axis)
        shape = list(x.shape)
        shape[axis] *= per
        return v.reshape(shape).astype(np.uint8)
    assert bits == 3, bits
    x = np.moveaxis(x, axis, 0).astype(np.uint32)
    if fmt3 == "tenper":
        out = np.empty((x.shape[0], 10, *x.shape[1:]), np.uint8)
        for j in range(10):
            out[:, j] = (x >> (3 * j)) & 7
        out = out.reshape(x.shape[0] * 10, *x.shape[1:])
        if out_len is not None:
            out = out[:out_len]
        return np.moveaxis(out, 0, axis)
    assert x.shape[0] % 3 == 0, x.shape
    w = x.reshape(x.shape[0] // 3, 3, *x.shape[1:])
    w0, w1, w2 = w[:, 0], w[:, 1], w[:, 2]
    out = np.empty((w.shape[0], 32, *x.shape[1:]), np.uint8)
    for j in range(10):
        out[:, j] = (w0 >> (3 * j)) & 7
    out[:, 10] = ((w0 >> 30) & 3) | ((w1 & 1) << 2).astype(np.uint32)
    for j in range(10):
        out[:, 11 + j] = (w1 >> (3 * j + 1)) & 7
    out[:, 21] = ((w1 >> 31) & 1) | ((w2 & 3) << 1).astype(np.uint32)
    for j in range(10):
        out[:, 22 + j] = (w2 >> (3 * j + 2)) & 7
    out = out.reshape(w.shape[0] * 32, *x.shape[1:])
    return np.moveaxis(out, 0, axis)


def _sniff_fmt3(qzeros: np.ndarray, N: int) -> str:
    """Detect the 3-bit layout from the zeros' packed width along N
    (N is known from scales): 10-per-word → ceil(N/10) words; straddled
    → N*3/32 words."""
    width = qzeros.shape[1]
    if width == -(-N // 10):
        return "tenper"
    if width * 32 == N * 3:
        return "straddle"
    raise ValueError(
        f"unrecognized 3-bit qzeros width {width} for N={N} "
        f"(expected {-(-N // 10)} ten-per-word or {N * 3 // 32} straddled)")


def gptq_layer_to_qtensor(qweight: np.ndarray, qzeros: np.ndarray,
                          scales: np.ndarray, g_idx: Optional[np.ndarray],
                          bits: int = 4, zero_plus_one: bool = True,
                          fmt: str = "gptq",
                          group_size: Optional[int] = None) -> QTensor:
    """One quantized linear → QTensor ([K, N], groups along K).

    GPTQ supports bits ∈ {2, 3, 4, 8} (the reference quant framework's
    widths, quant_config.h:21-143); AWQ GEMM checkpoints are 4-bit."""
    if fmt == "gptq":
        assert bits in (2, 3, 4, 8), bits
        G_, N_ = scales.shape
        fmt3 = _sniff_fmt3(qzeros, N_) if bits == 3 else "straddle"
        if bits == 3 and fmt3 == "tenper":
            # the real K strips the word-pad rows: from g_idx when
            # present, else group_size * n_groups
            if g_idx is not None:
                K_ = len(g_idx)
            elif group_size is not None and group_size > 0:
                K_ = G_ * group_size
            else:
                # group_size -1/None (HF quantize_config uses -1 for "one
                # group over all of K") leaves K underdetermined here —
                # G_*-1 would silently truncate the unpack to garbage.
                raise ValueError(
                    "ten-per-word 3-bit import needs g_idx or a positive "
                    "group_size to determine K (the packed rows carry pad "
                    f"values; got group_size={group_size!r})")
            codes = unpack_int32_fields(qweight, 3, axis=0, fmt3=fmt3,
                                        out_len=K_)
            zeros = unpack_int32_fields(qzeros, 3, axis=1, fmt3=fmt3,
                                        out_len=N_)
        else:
            codes = unpack_int32_fields(qweight, bits, axis=0)  # [K, N]
            zeros = unpack_int32_fields(qzeros, bits, axis=1)   # [G, N]
    elif fmt == "awq":
        assert bits == 4, "AWQ GEMM checkpoints are 4-bit"
        codes = unpack_int32_nibbles(qweight, axis=1, order=AWQ_ORDER)
        zeros = unpack_int32_nibbles(qzeros, axis=1, order=AWQ_ORDER)
    else:
        raise ValueError(fmt)
    if zero_plus_one:
        zeros = (zeros.astype(np.int32) + 1).astype(np.uint8)
    K, N = codes.shape
    G = scales.shape[0]
    g = K // G
    scales = scales.astype(np.float32)

    perm = None
    if g_idx is not None:
        g_idx = np.asarray(g_idx, np.int64)
        if not np.array_equal(g_idx, np.arange(K) // g):
            # act-order: sort rows so groups are contiguous; record the
            # permutation (stored rows = W[perm]; x gathered at matmul)
            perm = np.argsort(g_idx, kind="stable").astype(np.int32)
            codes = codes[perm]
            assert np.array_equal(g_idx[perm], np.arange(K) // g), \
                "g_idx groups are not uniformly sized"

    cfg = QuantConfig(bits=bits, kind="int", group_size=g, sym=False)
    planes = pack_codes(jnp.asarray(codes), bits, g)
    return QTensor(planes, jnp.asarray(scales), jnp.asarray(zeros),
                   None if perm is None else jnp.asarray(perm), cfg)


def gptq_reference_dequant(qweight, qzeros, scales, g_idx=None, bits=4,
                           zero_plus_one=True, fmt="gptq") -> np.ndarray:
    """Independent numpy dequantization (the published GPTQ formula:
    w[k, n] = (q[k, n] - z[g(k), n]) * s[g(k), n]) — test oracle."""
    if fmt == "gptq":
        codes = unpack_int32_fields(qweight, bits, axis=0)
        zeros = unpack_int32_fields(qzeros, bits, axis=1)
    else:
        codes = unpack_int32_nibbles(qweight, axis=1, order=AWQ_ORDER)
        zeros = unpack_int32_nibbles(qzeros, axis=1, order=AWQ_ORDER)
    if zero_plus_one:
        zeros = zeros.astype(np.int32) + 1
    K, N = codes.shape
    G = scales.shape[0]
    g = K // G
    gk = g_idx if g_idx is not None else np.arange(K) // g
    return ((codes.astype(np.float32) - zeros[gk].astype(np.float32))
            * scales[gk].astype(np.float32))


def permute_cols(qt: QTensor, p: np.ndarray) -> QTensor:
    """Reorder a QTensor's OUTPUT columns (N dim): planes are packed along
    K only, so a column take on planes/scales/zeros is exact."""
    planes = tuple(pl[..., p] for pl in qt.planes)
    zeros = None if qt.zeros is None else qt.zeros[..., p]
    return QTensor(planes, qt.scales[..., p], zeros, qt.perm, qt.cfg)


def qtensor_state_dict(sd: Dict[str, np.ndarray], fmt: str = "gptq",
                       bits: int = 4,
                       zero_plus_one: Optional[bool] = None,
                       group_size: Optional[int] = None
                       ) -> Dict[str, Any]:
    """Rewrite a GPTQ/AWQ state dict into fp-map form: every quantized
    linear's ``<base>.qweight``/``qzeros``/``scales``/``g_idx`` quartet
    collapses to ONE :class:`QTensor` at ``<base>.weight`` (our [K, N]
    orientation — GPTQ packs along in-features); everything else (norms,
    biases, embeddings, fp lm_head) passes through as numpy. The result
    feeds the ordinary family tensor maps (convert.hf.build_params), which
    is what makes the importer arch-generic — the reference ships one
    convert_quantized_<family>.py per model family instead
    (convert/convert_quantized_{llama,qwen,phi,falcon,gptj,baichuan,
    mistral,mixtral}.py)."""
    if zero_plus_one is None:
        zero_plus_one = fmt == "gptq"
    bases = {k[: -len(".qweight")] for k in sd if k.endswith(".qweight")}
    out: Dict[str, Any] = {}
    for k, v in sd.items():
        base, _, leaf = k.rpartition(".")
        if leaf == "qweight":
            out[base + ".weight"] = gptq_layer_to_qtensor(
                np.asarray(sd[base + ".qweight"]),
                np.asarray(sd[base + ".qzeros"]),
                np.asarray(sd[base + ".scales"]),
                np.asarray(sd[base + ".g_idx"]) if base + ".g_idx" in sd
                else None,
                bits=bits, zero_plus_one=zero_plus_one, fmt=fmt,
                group_size=group_size)
        elif base in bases and leaf in ("qzeros", "scales", "g_idx"):
            continue
        else:
            out[k] = np.asarray(v)
    return out


def _fold_act_order_sd(qsd: Dict[str, Any], cfg, mod) -> None:
    """sd-level act-order fold: per layer,
    fold w_down's stored-row permutation into the producing gate/up OUTPUT
    columns (and their bias vectors) — exact, because the elementwise
    act⊗up block between them commutes with any column permutation."""
    for i in range(cfg.n_layers):
        m = mod.hf_layer_map(i, cfg)
        groups = [("w_down", "w_gate", "w_up", "b_gate", "b_up")]
        if cfg.is_moe:
            groups = [(f"experts.{e}.w_down", f"experts.{e}.w_gate",
                       f"experts.{e}.w_up", None, None)
                      for e in range(cfg.n_experts)]
        for nd, ng, nu, nbg, nbu in groups:
            ed, eg, eu = m.get(nd), m.get(ng), m.get(nu)
            if not (ed and eg and eu):
                continue
            wd, wg, wu = (qsd.get(e[0]) for e in (ed, eg, eu))
            if not all(isinstance(w, QTensor) for w in (wd, wg, wu)) \
                    or wd.perm is None:
                continue
            p = np.asarray(wd.perm)
            qsd[eg[0]] = permute_cols(wg, p)
            qsd[eu[0]] = permute_cols(wu, p)
            qsd[ed[0]] = QTensor(wd.planes, wd.scales, wd.zeros, None,
                                 wd.cfg)
            for nb in (nbg, nbu):
                eb = m.get(nb) if nb else None
                if eb and eb[0] in qsd:
                    qsd[eb[0]] = np.asarray(qsd[eb[0]])[p]


def params_from_gptq_state_dict(sd: Dict[str, np.ndarray], cfg,
                                fmt: str = "gptq", bits: int = 4,
                                zero_plus_one: Optional[bool] = None,
                                dtype=jnp.bfloat16,
                                group_size: Optional[int] = None,
                                arch_mod=None) -> Dict[str, Any]:
    """A GPTQ/AWQ HF state dict → params pytree, for ANY registered
    family (reference: the convert_quantized_* converter set) — including
    quantized-MoE Mixtral experts. ``sd`` values are numpy (caller
    converts torch tensors). Non-quantized tensors (norms, embeddings,
    lm_head) pass through as in the fp path; fused layouts (qwen c_attn,
    phi-3 qkv/gate_up, falcon query_key_value, ...) are split by the same
    family preprocess hooks as fp imports, QTensor-aware."""
    from .hf import ARCH_MODULES, build_params
    from ..models import llama as llama_mod
    mod = arch_mod or ARCH_MODULES.get(cfg.arch, llama_mod)

    qsd = qtensor_state_dict(sd, fmt, bits, zero_plus_one, group_size)
    if hasattr(mod, "preprocess_state_dict"):
        # split fused quartets BEFORE the act-order fold so gate/up exist
        # under their mapped names (idempotent: build_params re-runs it)
        qsd = mod.preprocess_state_dict(dict(qsd), cfg)
    _fold_act_order_sd(qsd, cfg, mod)
    params = build_params(qsd, cfg, mod, quant=None, dtype=dtype)

    if any(isinstance(v, QTensor) and v.perm is not None
           for v in jax.tree.leaves(
               params["layers"],
               is_leaf=lambda x: isinstance(x, QTensor))
           if isinstance(v, QTensor)):
        # act-order: fuse qkv / gate-up so each fused GEMM pays ONE shared
        # activation gather (same-Hessian projections share g_idx) — 3
        # gathers/layer instead of 6 on the decode path.
        from ..runtime.generate import fuse_layer_weights
        params = fuse_layer_weights(params, cfg)
    return params
