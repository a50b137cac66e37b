"""Fused dequantize + matmul for INT8/INT4-quantized MLP weights.

Serving-path replacement for `torch.quantization.quantize_dynamic` INT8
Linear (reference PTQ, dlrm_s_pytorch.py:1461-1468): weights are stored as
int8 with per-output-channel symmetric scales; the Pallas kernel streams
weight tiles HBM->VMEM, dequantizes them in VMEM, and feeds the MXU —
the dequantized weights never touch HBM.

DLRM MLP shapes are small (<=512x512), so one kernel invocation per layer
with the whole weight resident in VMEM is optimal; the grid tiles the batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deep_quantized_recommendation_model_dqrm_tpu.ops import quant as q


class QuantLinearWeights(NamedTuple):
    w_int: jax.Array  # int8 [out, in]
    scale: jax.Array  # f32 [out] per-channel symmetric
    bias: jax.Array  # f32 [out] (kept fp32, like torch dynamic quant)
    bits: int


def quantize_linear_weights(
    w: jax.Array, b: jax.Array, bits: int = 8
) -> QuantLinearWeights:
    """Per-out-channel symmetric quantization of a Linear layer
    (the prepack step of dynamic quantization)."""
    scale = q.symmetric_quantization_params(
        bits, jnp.min(w, axis=1), jnp.max(w, axis=1)
    )
    w_int = q.quantize(w, scale, bits)
    return QuantLinearWeights(w_int=w_int, scale=scale, bias=b, bits=bits)


def int8_linear_xla(x: jax.Array, qw: QuantLinearWeights) -> jax.Array:
    """XLA reference path: x @ (w_int * s).T + b, with the dequant fused by
    XLA into the matmul's operand read."""
    w = qw.w_int.astype(jnp.float32) * qw.scale[:, None]
    return x @ w.T + qw.bias


def _int8_linear_kernel(x_ref, w_ref, s_ref, b_ref, out_ref):
    """out = x @ dequant(w).T + b for one batch tile.

    w is int8 [out, in] in VMEM; dequant to f32 in-register and hit the MXU
    with preferred_element_type=f32."""
    w = w_ref[...].astype(jnp.float32) * s_ref[...].T  # [out, in] * [out,1]
    out_ref[...] = (
        jax.lax.dot_general(
            x_ref[...],
            w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b_ref[...]
    )


def int8_linear(
    x: jax.Array,  # [B, in] f32
    qw: QuantLinearWeights,
    tb: int = 512,
    interpret: bool = False,
) -> jax.Array:  # [B, out] f32
    """Pallas fused dequant-matmul. Batch tiled; weights fully VMEM-resident
    (DLRM layers are at most 512x512 int8 = 256 KB)."""
    B, n_in = x.shape
    n_out = qw.w_int.shape[0]
    tb = min(tb, B)
    pad = (-B) % tb
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, n_in), x.dtype)], axis=0)
    Bp = B + pad
    out = pl.pallas_call(
        _int8_linear_kernel,
        grid=(Bp // tb,),
        in_specs=[
            pl.BlockSpec((tb, n_in), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_out, n_in), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tb, n_out), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, n_out), jnp.float32),
        interpret=interpret,
    )(x, qw.w_int, qw.scale.reshape(1, -1), qw.bias.reshape(1, -1))
    return out[:B]


def int8_linear_dynamic(x: jax.Array, qw: QuantLinearWeights) -> jax.Array:
    """True INT8xINT8->INT32 MXU execution with dynamic activation
    quantization — what torch `quantize_dynamic` actually runs (fbgemm
    dynamic-quantized Linear, dlrm_s_pytorch.py:1461-1468): per-row
    activation scale s_x = max|x|/127, integer GEMM on the int8 MXU path
    (4x the bf16 MACs on v5e), rescale by s_x*s_w and add the fp32 bias.

    ~2-bit relative activation error (per-row symmetric INT8) — same
    accuracy class as the reference's dynamic quantization.
    """
    s_x = jnp.maximum(jnp.max(jnp.abs(x), axis=1), 1e-8) / 127.0  # [B]
    x_int = jnp.clip(jnp.round(x / s_x[:, None]), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_int,
        qw.w_int,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [B, out] int32
    return acc.astype(jnp.float32) * (s_x[:, None] * qw.scale[None, :]) + qw.bias
