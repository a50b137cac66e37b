"""Core quantization math: scales, quantize/dequantize, STE autograd.

TPU-native re-design of the reference's quantization_supp/quant_utils.py.
Numerics are matched exactly so QAT trajectories are comparable:

- symmetric scale   = clamp(max(|min|,|max|), 1e-8) / (2^(b-1) - 1)
  (quant_utils.py:196-221 `symmetric_linear_quantization_params`)
- table-wide scale via double min/max reduction with no table copy
  (quant_utils.py:141-194 `symmetric_linear_quantization_param_two`)
- quantize          = clamp(round(x / scale), -n-1, n), n = 2^(b-1)-1
  (quant_utils.py:337-365 `SymmetricQuantFunction` => INT4 range [-8, 7])
- STE backward      = grad / scale for quantize; identity for `ste_round`
  (quant_utils.py:284-300, :346-363)
- asymmetric scale  = clamp(max - min, 1e-8) / (2^b - 1), integer zero point
  (quant_utils.py:223-254; used post-ReLU only)

Everything is pure jnp and differentiable-by-construction; scales are always
treated as constants w.r.t. autodiff (the reference computes them under
`torch.no_grad()`).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

# Matches torch.clamp(scale, min=1e-8) in quant_utils.py:155,216,241.
SCALE_EPS = 1e-8


def intmax(bits: int) -> int:
    """n = 2^(b-1) - 1, the symmetric positive clip bound."""
    return 2 ** (bits - 1) - 1


# ---------------------------------------------------------------------------
# Scale computation
# ---------------------------------------------------------------------------


def symmetric_quantization_params(
    bits: int,
    sat_min: jax.Array,
    sat_max: jax.Array,
) -> jax.Array:
    """Symmetric scale from a saturation range.

    Works per-tensor (scalar min/max) or per-channel (vector min/max);
    reference: quant_utils.py:196-221.
    """
    n = intmax(bits)
    scale = jnp.maximum(jnp.abs(sat_min), jnp.abs(sat_max))
    scale = jnp.maximum(scale, SCALE_EPS) / n
    return jax.lax.stop_gradient(scale)


def table_scale(bits: int, table: jax.Array) -> jax.Array:
    """Whole-table symmetric scale (scalar) from the table's global extrema.

    Reference: quant_utils.py:141-194 (`symmetric_linear_quantization_param_two`)
    — a double min/max reduction that never materializes a copy; under XLA a
    full-array reduce is a single fused pass over HBM.
    """
    # reduce in the table's own dtype (exact for min/max), convert only the
    # scalar extrema — casting the whole table first would materialize a
    # full-size fp32 temporary (see models/dlrm.compute_emb_scales)
    w_min = jnp.min(table).astype(jnp.float32)
    w_max = jnp.max(table).astype(jnp.float32)
    return symmetric_quantization_params(bits, w_min, w_max)


def asymmetric_quantization_params(
    bits: int,
    sat_min: jax.Array,
    sat_max: jax.Array,
    integral_zero_point: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Asymmetric scale + zero point (post-ReLU activations).

    Reference: quant_utils.py:223-254.
    """
    n = 2**bits - 1
    scale = jnp.maximum(sat_max - sat_min, SCALE_EPS) / n
    zero_point = -sat_min / scale
    if integral_zero_point:
        zero_point = jnp.round(zero_point)
    return jax.lax.stop_gradient(scale), jax.lax.stop_gradient(zero_point)


def get_percentile_min_max(
    x: jax.Array, lower_percentile: float, upper_percentile: float
) -> Tuple[jax.Array, jax.Array]:
    """Percentile-clipped activation range (quant_utils.py:23-73).

    The reference uses kthvalue on the flattened tensor; jnp.percentile is the
    XLA-friendly equivalent (sort-based, fully on-device).
    """
    flat = x.reshape(-1)
    upper = jnp.percentile(flat, upper_percentile)
    if lower_percentile == 0:
        lower = jnp.zeros_like(upper)
    else:
        lower = jnp.percentile(flat, lower_percentile)
    return lower, upper


# ---------------------------------------------------------------------------
# Quantize / dequantize with straight-through estimators
# ---------------------------------------------------------------------------


def _broadcast_scale(scale: jax.Array, x: jax.Array) -> jax.Array:
    """Reshape a per-channel scale for row-major broadcasting against x.

    Mirrors the view() reshapes in quant_utils.py:85-96: for 2-D weights a
    length-C scale broadcasts along dim 0 (out-channels).
    """
    scale = jnp.asarray(scale)
    if scale.ndim == 0 or scale.size == 1:
        return scale.reshape(())
    if scale.ndim == x.ndim:
        return scale  # caller already shaped it for broadcasting
    if x.ndim == 2:
        return scale.reshape(-1, 1)
    return scale.reshape(-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def quantize_ste(x: jax.Array, scale: jax.Array, bits: int) -> jax.Array:
    """clamp(round(x / scale), -n-1, n) with STE backward grad/scale.

    Float-typed integer output (like the reference, which keeps the integers
    in an fp tensor). Reference: quant_utils.py:337-365.
    """
    n = intmax(bits)
    s = _broadcast_scale(scale, x)
    return jnp.clip(jnp.round(x / s), -n - 1, n)


def _quantize_ste_fwd(x, scale, bits):
    return quantize_ste(x, scale, bits), scale


def _quantize_ste_bwd(bits, scale, g):
    s = _broadcast_scale(scale, g)
    return g / s, None


quantize_ste.defvjp(_quantize_ste_fwd, _quantize_ste_bwd)


def quantize(x: jax.Array, scale: jax.Array, bits: int) -> jax.Array:
    """Non-differentiable quantize to a true integer dtype (int8/int32)."""
    n = intmax(bits)
    s = _broadcast_scale(scale, x)
    q = jnp.clip(jnp.round(x / s), -n - 1, n)
    dtype = jnp.int8 if bits <= 8 else jnp.int32
    return q.astype(dtype)


def dequantize(q: jax.Array, scale: jax.Array, dtype=jnp.float32) -> jax.Array:
    """q * scale (quant_utils.py:103-129 with zero_point = 0)."""
    s = _broadcast_scale(jnp.asarray(scale), q)
    return q.astype(dtype) * s.astype(dtype)


def fake_quant(x: jax.Array, scale: jax.Array, bits: int) -> jax.Array:
    """Quantize-dequantize with straight-through gradient.

    Composition of SymmetricQuantFunction (bwd grad/scale) and the `* scale`
    dequant in the reference forward (quant_modules.py:128-131, :188;
    quant_modules_not_quantize_grad.py:376-395): the net gradient w.r.t. x is
    exactly identity, with scale held constant.
    """
    s = jax.lax.stop_gradient(_broadcast_scale(scale, x))
    return quantize_ste(x, s, bits) * s


@jax.custom_vjp
def ste_round(x: jax.Array) -> jax.Array:
    """round(x) with identity gradient (quant_utils.py:284-300)."""
    return jnp.round(x)


def _ste_round_fwd(x):
    return jnp.round(x), None


def _ste_round_bwd(_, g):
    return (g,)


ste_round.defvjp(_ste_round_fwd, _ste_round_bwd)


# ---------------------------------------------------------------------------
# Alternate QAT schemes (paper Table 3 baselines)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fake_quant_pact(x: jax.Array, bits: int) -> jax.Array:
    """DoReFa/PACT-style weight fake-quant (quant_pact_dorefa.py:15-40).

    w_n = tanh(x) / (2 max|tanh(x)|) + 0.5 in [0,1]; uniform-quantize to
    2^b-1 levels; map back to [-1, 1]. The backward is IDENTITY over the
    WHOLE transform — the reference's DoReFaQuant.backward returns dLdr_o
    unchanged (quant_pact_dorefa.py:25-28, "formula (5)"), i.e. the STE
    spans the tanh normalization too, not just the round.
    """
    t = jnp.tanh(x)
    w_n = t / (2.0 * jnp.max(jnp.abs(t))) + 0.5
    n = 2**bits - 1
    w_q = jnp.round(w_n * n) / n
    return 2.0 * w_q - 1.0


def _fake_quant_pact_fwd(x, bits):
    return fake_quant_pact(x, bits), None


def _fake_quant_pact_bwd(bits, _, g):
    return (g,)


fake_quant_pact.defvjp(_fake_quant_pact_fwd, _fake_quant_pact_bwd)


def fake_quant_pact_segmented(
    block: jax.Array,  # [rows, D] (a mega-table device block)
    bits: int,
    seg_ids: jax.Array,  # [rows] int32 table id per row (>= n_segments = pad)
    n_segments: int,
) -> jax.Array:
    """Per-TABLE DoReFa fake-quant over a row-concatenated mega block.

    Numerically identical to applying `fake_quant_pact` to each table
    slice (the normalization max|tanh| is a per-table segment max), which
    is how the mega-table engines support quant_scheme='pact': the
    reference quantizes each table's weights before the gather
    (quant_pact_dorefa.py:97-105 lookup_all); here ONE tanh pass + a
    segment max reproduce that per-table normalization without slicing
    the block (per-device table boundaries are traced under shard_map).
    Rows with seg_ids >= n_segments (pad / foreign-alias rows) normalize
    by 1 — their outputs are never selected downstream. Backward is the
    same identity STE as fake_quant_pact (callers stop-grad the block and
    scatter g_pooled manually, which the identity STE makes exact)."""
    t = jnp.tanh(block)
    seg_max = pact_segment_absmax(t, seg_ids, n_segments)
    return pact_apply_segmented(t, bits, seg_ids, n_segments, seg_max)


def pact_segment_absmax(
    tanh_block: jax.Array, seg_ids: jax.Array, n_segments: int
) -> jax.Array:  # [n_segments + 1]
    """Per-segment max|tanh(w)| of a mega block — the DoReFa normalizer.
    When a table SPANS device shards (the row-sharded engine), callers
    must cross-reduce this with `jax.lax.pmax` before applying."""
    row_absmax = jnp.max(jnp.abs(tanh_block), axis=1)
    safe_seg = jnp.minimum(seg_ids, n_segments)
    return (
        jnp.zeros((n_segments + 1,), tanh_block.dtype)
        .at[safe_seg]
        .max(row_absmax)
    )


def pact_apply_segmented(
    tanh_block: jax.Array,
    bits: int,
    seg_ids: jax.Array,
    n_segments: int,
    seg_max: jax.Array,  # [n_segments + 1] (possibly cross-device pmax'd)
) -> jax.Array:
    safe_seg = jnp.minimum(seg_ids, n_segments)
    denom = 2.0 * jnp.take(seg_max, safe_seg)[:, None]
    denom = jnp.where(denom == 0, 1.0, denom)
    w_n = tanh_block / denom + 0.5
    n = 2**bits - 1
    w_q = jnp.round(w_n * n) / n
    return 2.0 * w_q - 1.0


def _grad_scale(x: jax.Array, scale: jax.Array) -> jax.Array:
    """LSQ gradient scaling: value of x, gradient scaled by `scale`
    (quantizer/lsq.py:5-9)."""
    y = x * scale
    return y + jax.lax.stop_gradient(x - y)


def fake_quant_lsq(
    x: jax.Array,
    step_size: jax.Array,
    bits: int,
    per_channel: bool = False,
    numel_scale: float = 1.0,
) -> jax.Array:
    """LSQ learned-step-size fake-quant (quantizer/lsq.py:18-58).

    `step_size` is a trainable parameter; its gradient is scaled by
    1/sqrt(numel * Qp) and the round uses STE. `numel_scale` multiplies the
    numel inside the grad scale: data-parallel engines pass the device
    count so the scale reflects the GLOBAL batch (each shard sees only
    x.size = numel/N elements) — combined with a psum of the step grads
    this makes distributed LSQ exactly batch-size-invariant (the torch-DDP
    baseline instead uses the local numel and pmean, which only TRACKS the
    single-process trajectory)."""
    qn = 2 ** (bits - 1)
    qp = 2 ** (bits - 1) - 1
    g = 1.0 / jnp.sqrt(jnp.asarray(x.size * numel_scale, x.dtype) * qp)
    s = _grad_scale(step_size, g)
    s = _broadcast_scale(s, x) if per_channel else s
    xq = jnp.clip(x / s, -qn, qp)
    return ste_round(xq) * s


# ---------------------------------------------------------------------------
# Dyadic / fixed-point helpers (integer-only serving path)
# ---------------------------------------------------------------------------


def batch_frexp(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Decompose scales into (int32 mantissa, exponent): x ~= m / 2^e * 2^-31.

    TVM-style dyadic decomposition (quant_utils.py:256-281). The reference
    round-trips through numpy + Decimal on host; here it is pure jnp so it can
    live inside jit: m in [0.5, 1) scaled by 2^31 with round-half-up.
    """
    x = jnp.asarray(x)
    ax = jnp.abs(x)
    # frexp: x = m * 2^e with m in [0.5, 1)
    e = jnp.where(ax > 0, jnp.floor(jnp.log2(ax)) + 1.0, 0.0)
    m = jnp.where(ax > 0, ax / jnp.exp2(e), 0.0)
    m_shifted = jnp.floor(m * (2.0**31) + 0.5)  # round-half-up like Decimal
    m_shifted = jnp.sign(x) * m_shifted
    # 31-bit mantissas exceed int32; keep them in f32 (exact for our use —
    # consumers multiply in floating point) unless x64 is enabled.
    m_dtype = jnp.int64 if jax.config.jax_enable_x64 else jnp.float32
    return m_shifted.astype(m_dtype), (31.0 - e).astype(jnp.float32)


def fixedpoint_requantize(
    x_int: jax.Array,
    bits: int,
    act_scale: jax.Array,
    pre_act_scale: jax.Array,
    pre_weight_scale: jax.Array,
) -> jax.Array:
    """Integer-exact requantization x_int * (s_in / s_out) via dyadic multiply.

    Reference: quant_utils.py:435-551 (`fixedpoint_fn`, symmetric branch):
    new_scale = pre_act_scale * pre_weight_scale / act_scale, decomposed with
    batch_frexp, applied as (x * m) >> e, clamped to the symmetric range.
    """
    n = intmax(bits)
    new_scale = pre_act_scale * pre_weight_scale / act_scale
    m, e = batch_frexp(new_scale)
    # new_scale == m * 2^-e with m a 31-bit integer mantissa, so
    # x * new_scale == (x * m) >> e in exact integer arithmetic. f64 is used
    # when x64 is enabled (exact); f32 otherwise (sufficient for the INT<=8
    # activation grids this requantizes onto).
    wide = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    out = x_int.astype(wide) * m.astype(wide)
    out = jnp.round(out / jnp.exp2(e.astype(wide)))
    return jnp.clip(out, -n - 1, n).astype(jnp.float32)
