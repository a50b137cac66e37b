"""MXU one-hot dense-grad kernel — the scatter-add replacement for small
embedding tables.

The sparse train step applies embedding updates as `table.at[ids].add(rows)`.
On TPU that scatter is LATENCY-bound: XLA lowers it to a serial per-row
read-modify-write loop measured at ~34 ns/row (2026-08-19 on-chip
characterization, see README "benchmark methodology") — independent of row
width, and by far the dominant cost of the training step at large batch
(7.16 ms of a 9.6 ms step at B=8192 on the Kaggle model).

For a table with n rows the mathematically identical dense gradient is a
matmul against a one-hot matrix:

    dense[n, d] = onehot(ids)[R, n]^T @ vals[R, d]

which runs on the MXU at compute speed instead of scatter latency. A pure-XLA
formulation loses because the [R, n] one-hot materializes in HBM (measured:
7.8 vs 8.5 ms at B=8192 — the round-2 `scripts/bench_onehot_lookup.py`
rejection). This kernel builds each one-hot TILE in VMEM, consumes it
immediately in an MXU pass, and never spills it:

  * grid (n_tiles, r_chunks), r innermost; the [d, n_tile] output block stays
    resident in VMEM and accumulates across r chunks.
  * the matmul is oriented `out[d, n_tile] = vals^T[d, r] @ mask^T[n_tile, r]`
    so the tiny embedding dim d (16/64) rides the M axis, which STREAMS
    through the 128x128 systolic array — K = r_chunk and N = n_tile are the
    axes that must be 128-aligned, so no MXU padding waste at DLRM dims.
  * mask build is d-independent VPU work (R*n compares total); together with
    the matmul the cost is ~n*R*1e-12 s, beating the 34 ns/row scatter for
    n up to ~20k rows at any R (measured crossover: scripts/
    bench_onehot_scatter.py).

Numerics: the mask is exact {0, 1} (bf16) and the f32 vals operand is
split hi/mid/lo into three bf16-exact MXU passes (see _kernel — at the
MXU's DEFAULT precision f32 operands silently truncate to bf16, and
Precision.HIGHEST costs twice the passes), so every product is exact and
the result equals the coalesced scatter-add up to f32 summation ORDER of
duplicate ids only. Out-of-range ids (including the -1 padding this
wrapper adds) match no one-hot column — the same semantics as
`.at[].add(mode="drop")`.

Replaces: the serial scatter in the reference's manual sparse SGD
(sgd_quantized_gradients_parallel_comm.py:601-685 iterates sparse COO rows);
torch's EmbeddingBag(sparse=True) backward emits the same per-occurrence
(ids, rows) pairs this kernel consumes.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _force_interpret() -> bool:
    """Test hook: DQRM_ONEHOT_INTERPRET=1 makes the *_auto wrappers run the
    Pallas kernels in interpreter mode on non-TPU backends instead of taking
    the XLA fallback — so CPU CI genuinely exercises the kernel wiring."""
    return os.environ.get("DQRM_ONEHOT_INTERPRET", "") == "1"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(ids_ref, vt_ref, out_ref):
    j = pl.program_id(1)
    n_tile = out_ref.shape[1]
    r_chunk = ids_ref.shape[1]
    base = pl.program_id(0) * n_tile
    # maskT[c, r] = 1.0 iff ids[r] == base + c. ids arrive lane-oriented
    # [1, r_chunk] and broadcast over the sublane (row-id) axis for free.
    rowids = jax.lax.broadcasted_iota(jnp.int32, (n_tile, r_chunk), 0) + base
    mask_t = (rowids == ids_ref[:]).astype(jnp.bfloat16)
    # Exact-f32 matmul in THREE native bf16 MXU passes: at DEFAULT
    # precision the MXU truncates the f32 vals operand to bf16, quantizing
    # every gradient to ~3 decimal digits before accumulation (measured
    # 1e-2 absolute error on chip); Precision.HIGHEST fixes that but runs
    # the generic 6-pass f32 emulation on BOTH operands — measured
    # +1.4 ms/it at B=8192. The {0,1} mask side is exactly bf16, so only
    # the vals need splitting: vals = hi + mid + lo with each term
    # bf16-representable, each pass exact, f32 accumulation; the
    # decomposition residual (~2^-27 relative) sits below f32 resolution —
    # the "exact up to summation order" contract at half HIGHEST's cost.
    vt = vt_ref[:]
    hi = vt.astype(jnp.bfloat16)
    mid = (vt - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    lo = (
        vt - hi.astype(jnp.float32) - mid.astype(jnp.float32)
    ).astype(jnp.bfloat16)
    dims = (((1,), (1,)), ((), ()))

    def _pass(a):
        return jax.lax.dot_general(
            a, mask_t, dims, preferred_element_type=jnp.float32
        )

    contrib = _pass(hi) + _pass(mid) + _pass(lo)  # [d, n_tile]

    @pl.when(j == 0)
    def _():
        out_ref[:] = contrib

    @pl.when(j > 0)
    def _():
        out_ref[:] += contrib


@functools.partial(
    jax.jit, static_argnames=("num_rows", "n_tile", "r_chunk", "interpret")
)
def onehot_dense_grad(
    ids: jax.Array,
    vals: jax.Array,
    num_rows: int,
    *,
    n_tile: int = 512,
    r_chunk: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """`jnp.zeros((num_rows, d)).at[ids].add(vals, mode="drop")` on the MXU.

    ids:  [R] int32 row ids (out-of-range entries are dropped)
    vals: [R, d] float32 rows to accumulate
    Returns [num_rows, d] float32.
    """
    if ids.ndim != 1 or vals.ndim != 2 or vals.shape[0] != ids.shape[0]:
        raise ValueError(f"bad shapes ids={ids.shape} vals={vals.shape}")
    R, d = vals.shape
    r_chunk = min(r_chunk, _round_up(max(R, 1), 128))
    rp = _round_up(max(R, 1), r_chunk)
    np_ = _round_up(num_rows, n_tile)
    dp = _round_up(d, 8)

    ids_p = jnp.full((1, rp), -1, jnp.int32).at[0, :R].set(ids.astype(jnp.int32))
    vt = jnp.zeros((dp, rp), jnp.float32).at[:d, :R].set(
        vals.astype(jnp.float32).T
    )

    out = pl.pallas_call(
        _kernel,
        grid=(np_ // n_tile, rp // r_chunk),
        in_specs=[
            pl.BlockSpec((1, r_chunk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, r_chunk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((dp, n_tile), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((dp, np_), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * dp * rp * np_,
            bytes_accessed=4 * (rp + dp * rp + dp * np_),
            transcendentals=0,
        ),
        interpret=interpret,
    )(ids_p, vt)
    return out[:d, :num_rows].T


def _lookup_kernel(idsT_ref, w_ref, tT_ref, out_ref):
    j = pl.program_id(1)
    n_chunk = tT_ref.shape[1]
    b_tile = idsT_ref.shape[1]
    base = j * n_chunk
    rowids = jax.lax.broadcasted_iota(jnp.int32, (n_chunk, b_tile), 0) + base
    counts = jnp.zeros((n_chunk, b_tile), jnp.float32)
    for p in range(idsT_ref.shape[0]):  # static P unroll
        counts += jnp.where(
            rowids == idsT_ref[p, :], w_ref[p, :], 0.0
        )
    # HIGHEST precision: keeps dequantized f32 table values exact through
    # the MXU (DEFAULT truncates them to bf16 — an extra ~0.4% activation
    # error on top of the quantization noise). The counts-then-matmul
    # formulation still reorders f32 summation vs the sequential
    # gather+pool, so the serving path matches the gather to f32
    # summation order (tests assert 1e-5), not bit-parity.
    contrib = jax.lax.dot_general(
        tT_ref[:].astype(jnp.float32),
        counts,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [d, b_tile]

    @pl.when(j == 0)
    def _():
        out_ref[:] = contrib

    @pl.when(j > 0)
    def _():
        out_ref[:] += contrib


@functools.partial(
    jax.jit, static_argnames=("b_tile", "n_chunk", "interpret")
)
def _onehot_pooled_lookup_fwd(
    table: jax.Array,
    indices: jax.Array,
    weights: jax.Array,
    *,
    b_tile: int = 1024,
    n_chunk: int = 512,
    interpret: bool = False,
) -> jax.Array:
    n, d = table.shape
    B, P = indices.shape
    b_tile = min(b_tile, _round_up(max(B, 1), 128))
    bp = _round_up(max(B, 1), b_tile)
    np_ = _round_up(n, n_chunk)
    dp = _round_up(d, 8)

    idsT = jnp.full((P, bp), -1, jnp.int32).at[:, :B].set(
        indices.astype(jnp.int32).T
    )
    wT = jnp.zeros((P, bp), jnp.float32).at[:, :B].set(
        weights.astype(jnp.float32).T
    )
    tT = jnp.zeros((dp, np_), jnp.float32).at[:d, :n].set(
        table.astype(jnp.float32).T
    )

    out = pl.pallas_call(
        _lookup_kernel,
        grid=(bp // b_tile, np_ // n_chunk),
        in_specs=[
            pl.BlockSpec((P, b_tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, b_tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, n_chunk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((dp, b_tile), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((dp, bp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * dp * bp * np_,
            bytes_accessed=4 * (2 * P * bp + dp * np_ + dp * bp),
            transcendentals=0,
        ),
        interpret=interpret,
    )(idsT, wT, tT)
    return out[:d, :B].T.astype(table.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def onehot_pooled_lookup(
    table: jax.Array,  # [n, d]
    indices: jax.Array,  # [B, P] int32
    weights: jax.Array,  # [B, P] float (bag mask and/or per-sample weights)
    interpret: bool = False,
) -> jax.Array:  # [B, d]
    """Sum-pooled embedding lookup as an MXU one-hot matmul.

    `sum_p weights[b, p] * table[indices[b, p]]` — identical semantics to
    `ops.embedding.pooled_lookup` (out-of-range ids contribute nothing, like
    the gather's clip+mask handling never produces them). For small tables
    the matmul replaces the latency-bound serial row gather (~7.4 ns/row);
    the one-hot counts matrix is built tile-by-tile in VMEM and never hits
    HBM. Backward reuses `onehot_dense_grad` for the table cotangent.
    """
    return _onehot_pooled_lookup_fwd(
        table, indices, weights, interpret=interpret
    )


def _lookup_fwd(table, indices, weights, interpret):
    out = _onehot_pooled_lookup_fwd(table, indices, weights,
                                    interpret=interpret)
    return out, (table, indices, weights)


def _lookup_bwd(interpret, res, g):
    table, indices, weights = res
    B, P = indices.shape
    d = table.shape[1]
    rows_g = (g[:, None, :].astype(jnp.float32)
              * weights[..., None].astype(jnp.float32))
    d_table = dense_grad_auto(
        indices.reshape(B * P),
        rows_g.reshape(B * P, d),
        table.shape[0],
        interpret=interpret,
    ).astype(table.dtype)
    # d weights[b, p] = g[b] . table[indices[b, p]] — only reachable for
    # learned pooling weights; XLA drops it when the cotangent is unused.
    rows = jnp.take(table, indices, axis=0).astype(jnp.float32)  # [B, P, d]
    d_w = jnp.einsum("bd,bpd->bp", g.astype(jnp.float32), rows).astype(
        weights.dtype
    )
    return d_table, None, d_w


onehot_pooled_lookup.defvjp(_lookup_fwd, _lookup_bwd)


def pooled_lookup_onehot_auto(
    table: jax.Array,
    indices: jax.Array,
    mask,
    *,
    interpret: bool = False,
) -> jax.Array:
    """One-hot MXU pooled lookup on TPU; the plain gather elsewhere."""
    from deep_quantized_recommendation_model_dqrm_tpu.ops.embedding import (
        pooled_lookup,
    )

    if jax.default_backend() != "tpu":
        if not (interpret or _force_interpret()):
            return pooled_lookup(table, indices, mask)
        interpret = True
    w = (jnp.ones(indices.shape, jnp.float32) if mask is None
         else mask.astype(jnp.float32))
    return onehot_pooled_lookup(table, indices, w, interpret)


def dense_grad_auto(
    ids: jax.Array,
    vals: jax.Array,
    num_rows: int,
    *,
    interpret: bool = False,
) -> jax.Array:
    """One-hot MXU dense grad on TPU; exact XLA scatter elsewhere (CPU test
    meshes have no Mosaic — and no scatter-latency problem to solve)."""
    if jax.default_backend() == "tpu" or interpret or _force_interpret():
        return onehot_dense_grad(
            ids, vals, num_rows,
            interpret=interpret or jax.default_backend() != "tpu",
        )
    d = vals.shape[1]
    return (
        jnp.zeros((num_rows, d), jnp.float32)
        .at[ids].add(vals.astype(jnp.float32), mode="drop")
    )
