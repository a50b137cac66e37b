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

from typing import List, NamedTuple, Sequence

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
    emb: List[PackedTable]
    bot: List  # QuantLinearWeights or fp32 {"w","b"} dicts
    top: List
    mlp_bits: int  # 32 = fp32 MLP


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
    1446-1471).
    """
    if any(isinstance(t, dict) for t in params["emb"]):
        raise NotImplementedError(
            "PTQ packing expects dense tables; QR/MD models are already "
            "compressed structurally (reference PTQ packs emb_l weights too, "
            "dlrm_s_pytorch.py:457-474)"
        )
    if emb_bits in (4, 8):
        emb = [pack_table(t, bits=emb_bits, rowwise=rowwise) for t in params["emb"]]
    else:
        raise ValueError("emb_bits must be 4 or 8 for packed serving")
    if mlp_bits == 8:
        bot = [quantize_linear_weights(l["w"], l["b"], 8) for l in params["bot"]]
        top = [quantize_linear_weights(l["w"], l["b"], 8) for l in params["top"]]
    else:
        bot, top = params["bot"], params["top"]
    return ServingModel(config=config, emb=emb, bot=bot, top=top, mlp_bits=mlp_bits)


def serving_model_bytes(sm: ServingModel) -> int:
    """Model size in bytes (the paper's 8x compression measurement,
    Table 3)."""
    n = sum(pt.nbytes() for pt in sm.emb)
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
    arrays = {
        "emb": [
            {"data": pt.data, "scale": pt.scale}
            | ({"bias": pt.bias} if pt.bias is not None else {})
            for pt in sm.emb
        ],
        "bot": [l._asdict() if isinstance(l, QuantLinearWeights) else l for l in sm.bot],
        "top": [l._asdict() if isinstance(l, QuantLinearWeights) else l for l in sm.top],
    }
    # drop the static 'bits' ints from the quantized-linear dicts
    for part in ("bot", "top"):
        for l in arrays[part]:
            l.pop("bits", None)
    meta = {
        "emb": [(pt.bits, pt.dim, pt.bias is not None) for pt in sm.emb],
        "mlp_bits": sm.mlp_bits,
        "config": sm.config,
    }
    return arrays, meta


def _rebuild_serving_model(arrays, meta) -> ServingModel:
    emb = [
        PackedTable(
            data=a["data"],
            scale=a["scale"],
            bias=a.get("bias"),
            bits=bits,
            dim=dim,
        )
        for a, (bits, dim, _) in zip(arrays["emb"], meta["emb"])
    ]
    if meta["mlp_bits"] == 8:
        bot = [QuantLinearWeights(bits=8, **l) for l in arrays["bot"]]
        top = [QuantLinearWeights(bits=8, **l) for l in arrays["top"]]
    else:
        bot, top = arrays["bot"], arrays["top"]
    return ServingModel(
        config=meta["config"], emb=emb, bot=bot, top=top, mlp_bits=meta["mlp_bits"]
    )


def make_serving_fn(sm: ServingModel, use_pallas_lookup: bool = False,
                    use_pallas_mlp: bool = False, mlp_impl: str = None):
    """Jitted inference: Batch -> click probabilities [B]. Weights are jit
    ARGUMENTS (device-resident), not inlined constants.

    mlp_impl: "xla" (dequant fused by XLA, default) | "pallas" (VMEM fused
    dequant kernel) | "int8" (dynamic activation quant + INT8 MXU GEMM,
    torch quantize_dynamic semantics — fastest on v5e, small extra
    activation-quant error)."""
    cfg = sm.config
    if mlp_impl is None:
        mlp_impl = "pallas" if use_pallas_mlp else "xla"
    arrays, meta = _serving_arrays(sm)

    def fn(arrs, batch: dlrm.Batch) -> jax.Array:
        m_ = _rebuild_serving_model(arrs, meta)
        ly = []
        for k, pt in enumerate(m_.emb):
            msk = batch.mask[k] if batch.mask is not None else None
            if use_pallas_lookup and pt.bias is None and msk is None:
                ly.append(packed_pooled_lookup_pallas(pt, batch.indices[k]))
            else:
                ly.append(packed_pooled_lookup(pt, batch.indices[k], msk))
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
    ):
        self.sm = sm
        self.buckets = sorted(buckets)
        self.fn = make_serving_fn(sm, use_pallas_lookup=use_pallas_lookup)

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
