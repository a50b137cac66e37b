"""Ranking-range mixed-bit-width gradient quantization policy.

Re-design of `grad_precision_and_scale`
(sgd_quantized_gradients_parallel_comm.py:158-255) + its consumers
(:276-315, :610-624): every iteration,

1. each embedding table's gradient range (max |values|) is all-reduced and
   normalized by the table's weight scale — tables whose gradients are large
   relative to their weights matter most this step;
2. a permutation WEIGHTED by normalized range is sampled (reference: rank 0
   `torch.multinomial` without replacement + broadcast; here: Gumbel top-k
   with a key derived from the step counter — identical on every replica, so
   no broadcast is needed and the policy stays inside jit);
3. bit widths are assigned by rank position: top `frac_fp32` of tables get
   high precision, next `frac_int8` get INT8, the rest are SKIPPED entirely
   this iteration (0-bit: their updates simply don't happen — they catch up
   on later draws).

Transport deviation (documented): XLA's static shapes can't switch a
gather's dtype per table per iteration, so the exchange always ships TWO
int8 channels (the hi/lo bytes of an int16 quantization). INT8-assigned
tables use the hi byte only; high-precision tables use both (int16 —
recommendation-gradient ranges don't benefit from more); skipped tables are
masked. Fixed 2 B/value, between the reference's 1 B (INT8) and 4 B (FP32).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from deep_quantized_recommendation_model_dqrm_tpu.ops import quant as q

SKIP, INT8, HI = 0, 1, 2


class RankingRangeAssignment(NamedTuple):
    modes: jax.Array  # [T] int32 in {SKIP, INT8, HI}
    scales: jax.Array  # [T] f32 per-table gradient scales (int16 grid)


def assign_bit_widths(
    grad_ranges: jax.Array,  # [T] per-table max|grad| (already all-reduced)
    weight_scales: jax.Array,  # [T] per-table weight quant scales
    step: jax.Array,  # int32 — drives the shared sampling key
    frac_hi: float = 0.2,
    frac_int8: float = 0.3,
) -> jax.Array:
    """Sample the range-weighted table ordering and assign modes.

    Weighted sampling without replacement == Gumbel top-k on log-weights
    (equivalent in distribution to sequential torch.multinomial draws).
    Deterministic given `step`, hence identical across replicas.
    """
    T = grad_ranges.shape[0]
    norm = grad_ranges / jnp.maximum(weight_scales, 1e-12)
    logw = jnp.log(jnp.maximum(norm, 1e-30))
    key = jax.random.fold_in(jax.random.PRNGKey(0x5EED), step)
    gumbel = jax.random.gumbel(key, (T,))
    order = jnp.argsort(-(logw + gumbel))  # descending perturbed weight
    ranks = jnp.zeros((T,), jnp.int32).at[order].set(
        jnp.arange(T, dtype=jnp.int32)
    )
    n_hi = max(int(round(frac_hi * T)), 0)
    n_int8 = max(int(round(frac_int8 * T)), 0)
    modes = jnp.where(
        ranks < n_hi, HI, jnp.where(ranks < n_hi + n_int8, INT8, SKIP)
    ).astype(jnp.int32)
    return modes


def encode_two_channel(
    vals: jax.Array,  # [K, D] f32 gradient rows
    scale: jax.Array,  # scalar int16-grid scale (range/32767)
    mode: jax.Array,  # scalar int32 mode
) -> jax.Array:  # [K, 2D] int8 (hi channel || lo channel)
    """Quantize rows onto the int16 grid and split into hi/lo int8 bytes.

    INT8 mode zeroes the lo byte (== plain int8 on a 256x coarser grid);
    SKIP zeroes both.
    """
    q16 = jnp.clip(jnp.round(vals / scale), -32767, 32767).astype(jnp.int32)
    hi = (q16 >> 8).astype(jnp.int8)
    lo = (q16 & 0xFF).astype(jnp.uint8).astype(jnp.int8)
    lo = jnp.where(mode == HI, lo, 0)
    hi = jnp.where(mode == SKIP, 0, hi)
    return jnp.concatenate([hi, lo], axis=1)


def decode_two_channel(
    enc: jax.Array,  # [K, 2D] int8
    scale: jax.Array,
    mode: jax.Array,
) -> jax.Array:  # [K, D] f32
    D = enc.shape[1] // 2
    hi = enc[:, :D].astype(jnp.int32)
    lo = enc[:, D:].astype(jnp.int32) & 0xFF
    q16 = (hi << 8) | lo
    out = q16.astype(jnp.float32) * scale
    return jnp.where(mode == SKIP, 0.0, out)


def grad_scale_int16(grad_range: jax.Array) -> jax.Array:
    """Scale putting the (all-reduced) range onto the int16 grid."""
    return jax.lax.stop_gradient(jnp.maximum(grad_range, q.SCALE_EPS) / 32767.0)
