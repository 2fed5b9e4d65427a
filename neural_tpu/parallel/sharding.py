"""Mesh + per-tensor partition rules (GSPMD tensor parallelism).

TPU-native replacement for the reference's socket-level 1-D TP
(neural_speed/models/model_utils/model_files.h:82-190 ``calc_split_type``:
row-split for QKV/w1/w3, column-split for wo/w2, master-only for norms;
core/parallel_context.cpp MPI/oneCCL allreduce). Here the same split table
becomes PartitionSpecs on a named mesh; XLA GSPMD inserts the all-reduces
over ICI (the analog of the one-allreduce-after-attn + one-after-FFN
pattern at llama.cpp:592,693).

Mesh axes:
- "dp": data/batch parallel (independent sequences)
- "tp": tensor parallel (heads / ffn sharded)
Future axes ("pp", "sp", "ep") reserve names here so specs stay stable.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.qtensor import QTensor
from ..models.config import ModelConfig


def make_mesh(dp: int = 1, tp: int = 1, devices=None, **axes) -> Mesh:
    """Named device mesh. Default axes (dp, tp); extra axes may be given
    by keyword in mesh-major order, e.g. make_mesh(dp=2, pp=2, tp=2)
    builds ("dp", "pp", "tp"). Axis order fixes ICI locality: the LAST
    axis varies fastest, so keep the chattiest axis (tp) last."""
    devices = devices if devices is not None else jax.devices()
    named = {"dp": dp, **axes}
    named.setdefault("tp", tp)
    n = int(np.prod(list(named.values())))
    assert len(devices) >= n, (len(devices), n)
    arr = np.asarray(devices[:n]).reshape(*named.values())
    return Mesh(arr, tuple(named))


# Split type per layer-param name. "col" = shard output dim (N) → no comm;
# "row" = shard input dim (K) → psum after (GSPMD inserts it); "rep" =
# replicated. Mirrors model_files.h TP_1D_ROW/COLUMN/ONLY_MASTER semantics
# (note: the reference calls the N-split "row" because its weights are
# stored transposed; ours are [K, N]).
_LAYER_SPLITS: Dict[str, str] = {
    "wq": "col", "wk": "col", "wv": "col",
    "bq": "col_b", "bk": "col_b", "bv": "col_b",
    "wo": "row", "bo": "rep",
    "w_gate": "col", "w_up": "col", "b_gate": "col_b", "b_up": "col_b",
    "w_down": "row", "b_down": "rep",
    "router": "rep",
    "attn_norm_w": "rep", "attn_norm_b": "rep",
    "ffn_norm_w": "rep", "ffn_norm_b": "rep",
    "post_attn_norm_w": "rep", "post_attn_norm_b": "rep",
    "q_norm_w": "rep", "k_norm_w": "rep",
}


def _qtensor_spec(qt_leafpath: str, split: str, extra_lead: int) -> Dict[str, P]:
    """PartitionSpecs for QTensor fields given split type.

    planes: [*lead, Kp, N]; scales/zeros: [*lead, G, N]; K-split shards the
    packed-K/group rows (both divisible: pack keeps K-chunks contiguous).
    """
    lead = (None,) * extra_lead
    if split == "col":
        return {"planes": P(*lead, None, "tp"), "scales": P(*lead, None, "tp"),
                "zeros": P(*lead, None, "tp"), "perm": P(*lead, None)}
    if split == "row":
        return {"planes": P(*lead, "tp", None), "scales": P(*lead, "tp", None),
                "zeros": P(*lead, "tp", None), "perm": P(*lead, None)}
    return {"planes": P(), "scales": P(), "zeros": P(), "perm": P()}


def _leaf_spec(name: str, leaf, extra_lead: int) -> Any:
    """Spec for one layer-level entry (leaf may be QTensor or array).

    extra_lead counts stacking dims before the tensor's own dims
    (1 for the L stack; 2 for L+E expert stacks)."""
    split = _LAYER_SPLITS.get(name, "rep")
    lead = (None,) * extra_lead
    if isinstance(leaf, QTensor):
        specs = _qtensor_spec(name, split, extra_lead)
        return QTensor(
            planes=tuple(specs["planes"] for _ in leaf.planes),
            scales=specs["scales"],
            zeros=None if leaf.zeros is None else specs["zeros"],
            perm=None if leaf.perm is None else specs["perm"],
            cfg=leaf.cfg)
    ndim = leaf.ndim - extra_lead
    if split == "col" and ndim == 2:
        return P(*lead, None, "tp")
    if split == "row" and ndim == 2:
        return P(*lead, "tp", None)
    if split == "col_b" and ndim == 1:
        return P(*lead, "tp")
    return P()


def param_specs(params: Dict[str, Any], cfg: ModelConfig) -> Dict[str, Any]:
    """PartitionSpec pytree matching the param pytree."""
    out: Dict[str, Any] = {}
    layers = {}
    for name, leaf in params["layers"].items():
        if name == "experts":
            layers["experts"] = {
                sub: _leaf_spec(sub, sl, extra_lead=2)
                for sub, sl in leaf.items()}
        else:
            layers[name] = _leaf_spec(name, leaf, extra_lead=1)
    out["layers"] = layers
    for name in params:
        if name == "layers":
            continue
        if name == "lm_head":
            out[name] = _leaf_spec("w_up", params[name], extra_lead=0) \
                if isinstance(params[name], QTensor) else P(None, "tp")
        elif name == "embed":
            out[name] = P(None, None)  # replicated (gathered per token)
        else:
            out[name] = P()
    return out


def cache_specs():
    """KVCache spec tree: k/v [L, B, Hkv, S, Dh] and flat int8-KV scales
    [L, B, Hkv, S] — batch over dp, kv-heads over tp (reference analog:
    kv_cache heads_kv /= world_size, model_utils.cpp:70)."""
    from ..runtime.kvcache import KVCache
    kv = P(None, "dp", "tp", None, None)
    sc = P(None, "dp", "tp", None)
    return KVCache(kv, kv, sc, sc)


def _to_sharding(mesh: Mesh, spec_tree):
    def conv(s):
        return NamedSharding(mesh, s) if isinstance(s, P) else s
    return jax.tree.map(conv, spec_tree,
                        is_leaf=lambda x: isinstance(x, P))


def shard_params(params, cfg: ModelConfig, mesh: Mesh):
    """device_put the param pytree with the TP split table."""
    specs = param_specs(params, cfg)
    shardings = _to_sharding(mesh, specs)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s) if isinstance(s, NamedSharding) else x,
        params, shardings)


def shard_cache(cache, mesh: Mesh):
    specs = cache_specs()
    return type(cache)(*(
        None if c is None else jax.device_put(c, NamedSharding(mesh, s))
        for c, s in zip(cache, specs)))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp", None))
