"""Serving: post-training quantization export + packed inference engine.

Re-design of the reference's `--inference-only` PTQ path
(dlrm_s_pytorch.py:1446-1471 + `quantize_embedding` :457-474 + the
quantized `apply_emb` dispatch :422-442):

- `ptq_export` converts trained fp32/QAT params into a `ServingModel`:
  embedding tables bit-packed to INT4/INT8 (symmetric per-table for
  QAT-trained models — the scales ARE the QAT scales; row-wise asymmetric
  ATen-style for fp32 models), MLP weights INT8 per-channel;
- `make_serving_fn` builds the jitted inference step over packed state:
  fused gather+dequant+pool lookups, int8 dequant matmuls, dot interaction,
  sigmoid;
- `ServingEngine` adds host-side micro-batching: requests are padded to the
  nearest compiled bucket size (static shapes; no recompiles in steady
  state) — the TPU replacement for the reference's fixed test-batch loop.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from deep_quantized_recommendation_model_dqrm_tpu.config import DLRMConfig
from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm
from deep_quantized_recommendation_model_dqrm_tpu.ops.interaction import (
    cat_interaction,
    dot_interaction,
)
from deep_quantized_recommendation_model_dqrm_tpu.ops.pallas.packed_embedding import (
    PackedTable,
    pack_table,
    packed_pooled_lookup,
    packed_pooled_lookup_pallas,
    unpack_table,
)
from deep_quantized_recommendation_model_dqrm_tpu.ops.pallas.onehot_update import (
    pooled_lookup_onehot_auto,
)
from deep_quantized_recommendation_model_dqrm_tpu.ops.pallas.quant_matmul import (
    QuantLinearWeights,
    int8_linear,
    int8_linear_dynamic,
    int8_linear_xla,
    quantize_linear_weights,
)


class ServingModel(NamedTuple):
    config: DLRMConfig
    # Per-table entry: PackedTable (dense) or a dict for the compositional
    # tricks — {"q": PackedTable, "r": PackedTable} (QR; collisions/operation
    # come from config) or {"table": PackedTable[, "proj": fp32 [D, d_k]]}
    # (mixed-dimension; the tiny projection stays fp32).
    emb: List
    bot: List  # QuantLinearWeights or fp32 {"w","b"} dicts
    top: List
    mlp_bits: int  # 32 = fp32 MLP
    # Per-row pooling weights (config.weighted_pooling), kept fp32: [n_k]
    # per table. None when the model has no weighted pooling.
    vw: Optional[List] = None


def ptq_export(
    config: DLRMConfig,
    params: dlrm.Params,
    emb_bits: int = 4,
    mlp_bits: int = 8,
    rowwise: bool = False,
) -> ServingModel:
    """Pack a trained model for serving.

    emb_bits in {4, 8, 32}; 32 keeps fp32 tables (packed as int8? no —
    kept raw, lookup falls back to dense). mlp_bits in {8, 32}.
    Mirrors quantize_dynamic + quantize_embedding (dlrm_s_pytorch.py:
    1446-1471). QR/MD compositional tables (beyond the reference, whose
    PTQ path only handles plain emb_l weights) pack each component table
    at emb_bits; the MD projection matrix stays fp32 (it is a tiny dense
    matmul). Weighted-pooling v_W rides along fp32 and is applied as
    per-sample weights at lookup (apply_emb, dlrm_s_pytorch.py:407-411).
    """
    if emb_bits not in (4, 8):
        raise ValueError("emb_bits must be 4 or 8 for packed serving")

    emb = [_pack_entry(t, emb_bits, rowwise) for t in params["emb"]]
    if mlp_bits == 8:
        bot = [quantize_linear_weights(l["w"], l["b"], 8) for l in params["bot"]]
        top = [quantize_linear_weights(l["w"], l["b"], 8) for l in params["top"]]
    else:
        bot, top = params["bot"], params["top"]
    vw = list(params["v_W"]) if config.weighted_pooling is not None else None
    return ServingModel(
        config=config, emb=emb, bot=bot, top=top, mlp_bits=mlp_bits, vw=vw
    )


def _pack_entry(t, emb_bits: int, rowwise: bool, row_chunk: int = 0):
    if isinstance(t, dict):
        if "q" in t:
            return {
                "q": pack_table(t["q"], bits=emb_bits, rowwise=rowwise,
                                row_chunk=row_chunk),
                "r": pack_table(t["r"], bits=emb_bits, rowwise=rowwise,
                                row_chunk=row_chunk),
            }
        out = {"table": pack_table(t["table"], bits=emb_bits,
                                   rowwise=rowwise, row_chunk=row_chunk)}
        if "proj" in t:
            out["proj"] = t["proj"]
        return out
    return pack_table(t, bits=emb_bits, rowwise=rowwise, row_chunk=row_chunk)


def ptq_export_streaming(
    config: DLRMConfig,
    get_table,  # k -> fp table array or QR/MD dict (a fresh slice/copy)
    bot,
    top,
    vw: Optional[List] = None,
    emb_bits: int = 4,
    mlp_bits: int = 8,
    rowwise: bool = False,
    free_source: bool = True,
    row_chunk: int = 2_000_000,
) -> ServingModel:
    """ptq_export, one table at a time with a device sync per table and
    the SOURCE slice freed immediately after packing.

    The materialized form (ptq_export(params)) enqueues every table's
    quantize/pack asynchronously, so the execution-schedule peak holds
    all fp sources + packing temporaries + packed outputs at once — at
    Terabyte scale (6.3 GB bf16 sources) that OOMs a 16 GB chip even
    when the caller deletes sources afterwards (host-order deletes do
    not bound the device schedule). Streaming bounds the peak to
    one source table + its temporaries + the packed model."""
    emb = []
    for k in range(config.num_tables):
        t = get_table(k)
        e = _pack_entry(t, emb_bits, rowwise, row_chunk)
        for leaf in jax.tree_util.tree_leaves(e):
            if hasattr(leaf, "block_until_ready"):
                leaf.block_until_ready()
        if free_source:
            kept = e.get("proj") if isinstance(e, dict) else None
            src = t.values() if isinstance(t, dict) else [t]
            for leaf in src:
                # the MD "proj" rides into the packed entry by REFERENCE
                if (
                    leaf is not None
                    and leaf is not kept
                    and hasattr(leaf, "delete")
                ):
                    leaf.delete()
        emb.append(e)
    if mlp_bits == 8:
        bot = [quantize_linear_weights(l["w"], l["b"], 8) for l in bot]
        top = [quantize_linear_weights(l["w"], l["b"], 8) for l in top]
    return ServingModel(
        config=config, emb=emb, bot=bot, top=top, mlp_bits=mlp_bits,
        vw=list(vw) if vw is not None else None,
    )


def serving_model_bytes(sm: ServingModel) -> int:
    """Model size in bytes (the paper's 8x compression measurement,
    Table 3)."""
    n = 0
    for e in sm.emb:
        if isinstance(e, dict):
            for v in e.values():
                n += v.nbytes() if isinstance(v, PackedTable) else v.size * 4
        else:
            n += e.nbytes()
    if sm.vw is not None:
        n += sum(v.size * 4 for v in sm.vw)
    for layers in (sm.bot, sm.top):
        for l in layers:
            if isinstance(l, QuantLinearWeights):
                n += l.w_int.size + l.scale.size * 4 + l.bias.size * 4
            else:
                n += (l["w"].size + l["b"].size) * 4
    return n


def _apply_mlp_serving(layers, x, mlp_bits: int, last_linear: bool, mlp_impl: str):
    nl = len(layers)
    for i, l in enumerate(layers):
        if mlp_bits == 8:
            if mlp_impl == "pallas":
                x = int8_linear(x, l)
            elif mlp_impl == "int8":
                # true INT8 MXU GEMM with dynamic activation quant (the
                # torch quantize_dynamic execution model)
                x = int8_linear_dynamic(x, l)
            else:
                x = int8_linear_xla(x, l)
        else:
            x = x @ l["w"].T + l["b"]
        if not (last_linear and i == nl - 1):
            x = jax.nn.relu(x)
    return x


def _serving_arrays(sm: ServingModel):
    """Split the ServingModel into (traced array pytree, static metadata).

    The arrays MUST travel as jit arguments: closed-over concrete arrays
    become inlined HLO constants, which for a 270 MB packed model bloats the
    program beyond compiler limits (observed: remote-compile HTTP 413) and
    destroys compile time.
    """
    def pt_arrays(pt: PackedTable):
        return {"data": pt.data, "scale": pt.scale} | (
            {"bias": pt.bias} if pt.bias is not None else {}
        )

    def pt_meta(pt: PackedTable):
        return (pt.bits, pt.dim, pt.bias is not None)

    emb_arrays, emb_meta = [], []
    for e in sm.emb:
        if isinstance(e, dict):
            emb_arrays.append(
                {
                    k: pt_arrays(v) if isinstance(v, PackedTable) else v
                    for k, v in e.items()
                }
            )
            emb_meta.append(
                {
                    k: pt_meta(v)
                    for k, v in e.items()
                    if isinstance(v, PackedTable)
                }
            )
        else:
            emb_arrays.append(pt_arrays(e))
            emb_meta.append(pt_meta(e))
    arrays = {
        "emb": emb_arrays,
        "bot": [l._asdict() if isinstance(l, QuantLinearWeights) else l for l in sm.bot],
        "top": [l._asdict() if isinstance(l, QuantLinearWeights) else l for l in sm.top],
    }
    if sm.vw is not None:
        arrays["vw"] = list(sm.vw)
    # drop the static 'bits' ints from the quantized-linear dicts
    for part in ("bot", "top"):
        for l in arrays[part]:
            l.pop("bits", None)
    meta = {
        "emb": emb_meta,
        "mlp_bits": sm.mlp_bits,
        "config": sm.config,
    }
    return arrays, meta


def _rebuild_serving_model(arrays, meta) -> ServingModel:
    def pt_from(a, m):
        bits, dim, _ = m
        return PackedTable(
            data=a["data"], scale=a["scale"], bias=a.get("bias"), bits=bits, dim=dim
        )

    emb = []
    for a, m in zip(arrays["emb"], meta["emb"]):
        if not a:
            emb.append(None)  # fused-gather placeholder (make_serving_fn)
        elif isinstance(m, dict):
            emb.append(
                {k: (pt_from(v, m[k]) if k in m else v) for k, v in a.items()}
            )
        else:
            emb.append(pt_from(a, m))
    if meta["mlp_bits"] == 8:
        bot = [QuantLinearWeights(bits=8, **l) for l in arrays["bot"]]
        top = [QuantLinearWeights(bits=8, **l) for l in arrays["top"]]
    else:
        bot, top = arrays["bot"], arrays["top"]
    return ServingModel(
        config=meta["config"],
        emb=emb,
        bot=bot,
        top=top,
        mlp_bits=meta["mlp_bits"],
        vw=arrays.get("vw"),
    )


def _fuse_packed_tables(arrays, meta):
    """Concatenate all eligible packed tables into ONE uint8 mega-array so
    the per-batch lookup is a single `take` instead of one gather op per
    table (round 5: the serving-side cousin of the training fused
    mega-table — serving has no scatter side, so only the gather-op count
    changes). Eligible: plain dense PackedTable entries with per-table
    symmetric scales (bias None — the QAT export path) and uniform
    bits/dim. Returns (arrays', fused_meta) where fused tables' per-table
    data entries are REPLACED by one arrays["fused"] = {"data", "scale"}
    and fused_meta carries static (ks, base_rows)."""
    ks = [
        k
        for k, (a, m) in enumerate(zip(arrays["emb"], meta["emb"]))
        if not isinstance(m, dict) and "bias" not in a
    ]
    if len(ks) < 2:
        return arrays, None
    bits_dims = {(meta["emb"][k][0], meta["emb"][k][1]) for k in ks}
    if len(bits_dims) != 1:
        return arrays, None
    base = np.zeros(len(ks), np.int64)
    rows = np.zeros(len(ks), np.int64)
    off = 0
    for i, k in enumerate(ks):
        base[i] = off
        rows[i] = arrays["emb"][k]["data"].shape[0]
        off += rows[i]
    fused = {
        "data": jnp.concatenate([arrays["emb"][k]["data"] for k in ks], axis=0),
        "scale": jnp.stack([arrays["emb"][k]["scale"] for k in ks]),
    }
    arrays = dict(arrays)
    arrays["emb"] = [
        ({} if k in set(ks) else a) for k, a in enumerate(arrays["emb"])
    ]
    arrays["fused"] = fused
    bits, dim = next(iter(bits_dims))
    return arrays, {"ks": tuple(ks), "base": base, "rows": rows,
                    "bits": bits, "dim": dim}


def make_serving_fn(sm: ServingModel, use_pallas_lookup: bool = False,
                    use_pallas_mlp: bool = False, mlp_impl: str = None,
                    onehot_lookup_max_rows: int = 0,
                    fused_gather: bool = False):
    """Jitted inference: Batch -> click probabilities [B]. Weights are jit
    ARGUMENTS (device-resident), not inlined constants.

    mlp_impl: "xla" (dequant fused by XLA, default) | "pallas" (VMEM fused
    dequant kernel) | "int8" (dynamic activation quant + INT8 MXU GEMM,
    torch quantize_dynamic semantics — fastest on v5e, small extra
    activation-quant error).

    onehot_lookup_max_rows: packed tables with at most this many rows are
    unpacked (tiny, recomputed per dispatch) and looked up via the MXU
    one-hot matmul kernel instead of the ~5.5 ns/row serial gather — the
    serving analogue of the training-side onehot_lookup_max_rows. The
    gather is the dominant serving cost at large batch (VERDICT round-2
    #6); measured sweep: tools/bench_serving.py.

    fused_gather: concatenate all symmetric same-shape packed tables into
    one mega-array and look them up with ONE gather (global ids = local +
    per-table base) instead of one gather op per table; equivalence:
    tests/test_serving.py::test_fused_gather_matches."""
    cfg = sm.config
    if mlp_impl is None:
        mlp_impl = "pallas" if use_pallas_mlp else "xla"
    arrays, meta = _serving_arrays(sm)
    fused_meta = None
    if fused_gather and onehot_lookup_max_rows == 0 and not use_pallas_lookup:
        arrays, fused_meta = _fuse_packed_tables(arrays, meta)

    def lookup(pt: PackedTable, ids, msk):
        if 0 < pt.rows <= onehot_lookup_max_rows:
            return pooled_lookup_onehot_auto(unpack_table(pt), ids, msk)
        if use_pallas_lookup and pt.bias is None and msk is None:
            return packed_pooled_lookup_pallas(pt, ids)
        return packed_pooled_lookup(pt, ids, msk)

    def fused_lookup(arrs, batch):
        """One gather for all fused tables: {k: pooled [B, D]}."""
        from deep_quantized_recommendation_model_dqrm_tpu.ops.pallas.packed_embedding import (
            _unpack_rows,
        )

        ks = fused_meta["ks"]
        sel = jnp.asarray(np.asarray(ks, np.int32))
        base = jnp.asarray(fused_meta["base"])
        rows_pt = jnp.asarray(fused_meta["rows"])
        ids = jnp.take(batch.indices, sel, axis=0)  # [Tf, B, P]
        # clip PER TABLE (jnp.take's clip semantics in the per-table
        # path): an out-of-range id must clamp to its OWN table's last
        # row, not walk into the next table's region of the fused array
        ids = jnp.clip(ids, 0, rows_pt[:, None, None] - 1)
        gids = ids + base[:, None, None]
        Tf, B, P = ids.shape
        raw = jnp.take(
            arrs["fused"]["data"], gids.reshape(-1), axis=0
        )  # [Tf*B*P, Dp]
        pt_like = PackedTable(
            data=arrs["fused"]["data"], scale=None, bias=None,
            bits=fused_meta["bits"], dim=fused_meta["dim"],
        )
        vals = _unpack_rows(pt_like, raw).reshape(Tf, B, P, -1)
        w = arrs["fused"]["scale"][:, None, None, None]  # per-table scale
        if batch.mask is not None:
            m = jnp.take(batch.mask, sel, axis=0).astype(jnp.float32)
            w = w * m[..., None]
        if arrs.get("vw") is not None:
            wv = jnp.stack(
                [jnp.take(arrs["vw"][k], ids[i], axis=0) for i, k in enumerate(ks)]
            ).astype(jnp.float32)
            w = w * wv[..., None]
        pooled = jnp.sum(vals * w, axis=2)  # [Tf, B, D]
        return {k: pooled[i] for i, k in enumerate(ks)}

    def fn(arrs, batch: dlrm.Batch) -> jax.Array:
        fused_pooled = fused_lookup(arrs, batch) if fused_meta else {}
        m_ = _rebuild_serving_model(
            {k2: v for k2, v in arrs.items() if k2 != "fused"}, meta
        )
        ly = []
        for k, e in enumerate(m_.emb):
            if k in fused_pooled:
                # vw/mask were already composed inside the fused gather
                ly.append(fused_pooled[k])
                continue
            ids = batch.indices[k]
            msk = batch.mask[k] if batch.mask is not None else None
            if m_.vw is not None:
                # per_sample_weights = v_W[row] composed with the bag mask
                # (lookup_all semantics; apply_emb dlrm_s_pytorch.py:407-411)
                w = jnp.take(m_.vw[k], ids, axis=0).astype(jnp.float32)
                msk = w if msk is None else msk.astype(jnp.float32) * w
            if isinstance(e, dict) and "q" in e:
                # QR: pool each component bag, then compose — the upstream
                # order (qr_pooled_lookup, tricks/qr_embedding_bag.py:160-176)
                c = cfg.qr_collisions
                pq = lookup(e["q"], ids // c, msk)
                pr = lookup(e["r"], ids % c, msk)
                if cfg.qr_operation == "mult":
                    ly.append(pq * pr)
                elif cfg.qr_operation == "add":
                    ly.append(pq + pr)
                else:
                    ly.append(jnp.concatenate([pq, pr], axis=-1))
            elif isinstance(e, dict):
                pooled = lookup(e["table"], ids, msk)
                if "proj" in e:
                    pooled = pooled @ e["proj"].T
                ly.append(pooled)
            else:
                ly.append(lookup(e, ids, msk))
        ly = jnp.stack(ly)
        x = _apply_mlp_serving(m_.bot, batch.dense, m_.mlp_bits, False, mlp_impl)
        z = (
            dot_interaction(x, ly, cfg.interact_itself)
            if cfg.interaction == "dot"
            else cat_interaction(x, ly)
        )
        logits = _apply_mlp_serving(m_.top, z, m_.mlp_bits, True, mlp_impl)
        p = jax.nn.sigmoid(logits.reshape(-1))
        if 0.0 < cfg.loss_threshold < 1.0:
            p = jnp.clip(p, cfg.loss_threshold, 1.0 - cfg.loss_threshold)
        return p

    jitted = jax.jit(fn)
    return lambda batch: jitted(arrays, batch)


def export_stablehlo(sm: ServingModel, batch_size: int, path: str) -> str:
    """Serialize the packed inference function as portable StableHLO.

    The TPU-native analogue of the reference's `--save-onnx` export
    (dlrm_s_pytorch.py:1813-1893): a self-contained, runtime-loadable
    artifact of the quantized model (weights baked in as constants), loadable
    with jax.export on any XLA backend.
    """
    from jax import export as jexport

    cfg = sm.config
    serving_fn = make_serving_fn(sm)
    T, P = cfg.num_tables, cfg.pooling_size

    # Flat-argument wrapper: the export serializer only handles registered
    # pytree types, so the Batch NamedTuple is rebuilt inside.
    def fn(dense, indices):
        return serving_fn(
            dlrm.Batch(
                dense=dense,
                indices=indices,
                labels=jnp.zeros((dense.shape[0],), jnp.float32),
                mask=None,
            )
        )

    exported = jexport.export(jax.jit(fn))(
        jax.ShapeDtypeStruct((batch_size, cfg.num_dense), jnp.float32),
        jax.ShapeDtypeStruct((T, batch_size, P), jnp.int32),
    )
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_stablehlo(path: str):
    """Load a serialized export back into a callable."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call


class ServingEngine:
    """Bucketed-batch inference host loop.

    Pads request batches up to the nearest bucket so every shape is
    compiled exactly once, then slices the padding off — continuous
    batching without dynamic shapes.
    """

    def __init__(
        self,
        sm: ServingModel,
        buckets: Sequence[int] = (128, 1024, 4096, 16384),
        use_pallas_lookup: bool = False,
        mlp_impl: str = None,
        onehot_lookup_max_rows: int = 0,
    ):
        self.sm = sm
        self.buckets = sorted(buckets)
        self.fn = make_serving_fn(
            sm, use_pallas_lookup=use_pallas_lookup, mlp_impl=mlp_impl,
            onehot_lookup_max_rows=onehot_lookup_max_rows,
        )

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def predict(self, dense: np.ndarray, indices: np.ndarray) -> np.ndarray:
        """dense [B,13] f32 (already log1p), indices [T,B,P] int32."""
        B = dense.shape[0]
        out = np.empty(B, np.float32)
        pos = 0
        while pos < B:
            chunk = min(B - pos, self.buckets[-1])
            nb = self._bucket(chunk)
            d = np.zeros((nb, dense.shape[1]), np.float32)
            d[:chunk] = dense[pos : pos + chunk]
            ix = np.zeros((indices.shape[0], nb, indices.shape[2]), np.int32)
            ix[:, :chunk] = indices[:, pos : pos + chunk]
            batch = dlrm.Batch(
                dense=jnp.asarray(d),
                indices=jnp.asarray(ix),
                labels=jnp.zeros((nb,), jnp.float32),
                mask=None,
            )
            out[pos : pos + chunk] = np.asarray(self.fn(batch))[:chunk]
            pos += chunk
        return out


class MicroBatcher:
    """Continuous-batching front end over a ServingEngine.

    Concurrent `predict` calls (individual requests or small batches from
    many client threads) are aggregated by a background worker into one
    device batch per dispatch — up to `max_batch` rows or `max_wait_ms`
    after the first queued request, whichever comes first — then split back
    to the callers. This is the production serving shape the reference's
    fixed test-batch inference loop (dlrm_s_pytorch.py:762-902) never had:
    device utilization stays high under many small concurrent requests
    because every dispatch is a large, bucket-padded, compile-cached batch.
    """

    def __init__(self, engine: ServingEngine, max_batch: int = 16384,
                 max_wait_ms: float = 1.0):
        import queue
        import threading

        self.engine = engine
        self.max_batch = min(max_batch, engine.buckets[-1])
        self.max_wait_s = max_wait_ms / 1e3
        self._q: "queue.Queue" = queue.Queue()
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def predict(self, dense: np.ndarray, indices: np.ndarray) -> np.ndarray:
        """Thread-safe; blocks until this request's slice is ready.

        dense [B,13] f32 (already log1p), indices [T,B,P] int32.
        """
        import threading

        if self._closed:
            raise RuntimeError("MicroBatcher is closed")
        done = threading.Event()
        item = {"dense": dense, "indices": indices, "done": done}
        self._q.put(item)
        done.wait()
        if "error" in item:
            raise item["error"]
        return item["result"]

    def close(self) -> None:
        self._closed = True
        self._q.put(None)
        self._worker.join()

    # -- worker ------------------------------------------------------------

    def _run(self) -> None:
        import queue
        import time as _time

        while True:
            first = self._q.get()
            if first is None:
                return
            group = [first]
            rows = first["dense"].shape[0]
            deadline = _time.monotonic() + self.max_wait_s
            while rows < self.max_batch:
                timeout = deadline - _time.monotonic()
                if timeout <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is None:
                    self._flush(group)
                    return
                group.append(nxt)
                rows += nxt["dense"].shape[0]
            self._flush(group)

    def _flush(self, group) -> None:
        try:
            dense = np.concatenate([g["dense"] for g in group], axis=0)
            indices = np.concatenate([g["indices"] for g in group], axis=1)
            probs = self.engine.predict(dense, indices)
            pos = 0
            for g in group:
                n = g["dense"].shape[0]
                g["result"] = probs[pos : pos + n]
                pos += n
        except Exception as e:  # surface errors to every blocked caller
            for g in group:
                g["error"] = e
        finally:
            for g in group:
                g["done"].set()
