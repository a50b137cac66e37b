"""Tile-streaming scatter-add — the bandwidth-bound replacement for XLA's
latency-bound embedding-table scatter on mid-size tables.

The sparse train step applies `table.at[ids].add(rows)`. XLA lowers that to
a serial per-row read-modify-write loop measured at ~34 ns/row on v5e
(2026-08-19 chain-slope characterization) — at B=8192 the 26 Kaggle
scatters cost 7.16 ms of a 9.6 ms step. The one-hot MXU kernel
(ops/pallas/onehot_update.py) fixes tables <= ~20k rows but its
`n * B` mask-build cost rules out the mid tables (93k-286k rows), and the
multi-M tables are too sparse for any dense formulation.

This kernel attacks the mid range with SEQUENTIAL HBM traffic: stream the
whole table through VMEM tile by tile (Pallas auto-double-buffers the
block DMAs, so the traversal runs at HBM bandwidth, not scatter latency)
and apply the updates belonging to each tile with a small one-hot matmul.
Updates must arrive SORTED BY ROW ID so each tile's updates are one
contiguous segment `[bounds[t], bounds[t+1])` of the update list — the
segment boundaries are a single vectorized `searchsorted` outside the
kernel, passed in via scalar prefetch.

Per tile t (T rows):
    for chunk c covering positions [bounds[t], bounds[t+1]):
        ids_c  = sids[c*W : (c+1)*W]               # W-wide aligned window
        sel    = (iota_T[:, None] == ids_c[None, :] - t*T)   # {0,1} f32
        acc   += sel @ svals[c*W : (c+1)*W]        # [T, W] @ [W, D] MXU
    tile     += acc                                 # aliased in-place

Entries of a window that belong to a neighboring tile (or are padding with
ids >= num_rows) map outside [0, T) and match no row of `sel` — exactly
`.at[].add(mode="drop")` semantics, with no masking code. Duplicate ids are
legal: two window columns select the same tile row and the matmul sums
them (torch `coalesce()` semantics without a separate coalesce pass).

OOB-padding contract: when R % tile_rows != 0, coalesce-style padding ids
(num_rows + slot) fall inside [0, tile_rows) RELATIVE TO the last partial
tile, so they select block-PADDING rows of that tile. Correctness relies on
Pallas masking writes to out-of-bounds rows of a partial block (documented
Pallas blockspec semantics; regression-guarded by test_oob_padding_dropped,
interpret mode). If that masking behavior ever changes, pad R up to a
multiple of tile_rows before the call instead.

MEASURED STATUS (2026-08-21, scripts/bench_stream_update.py + the tile
sweep; full strategy map in PARITY.md "The scatter wall"): the kernel is
exact and works, but the traversal moves ~4.2 ns per TABLE row
independent of tile size — the (T, d=16) fp32 blocks use 16 of 128
lanes at every pipeline stage, capping effective traffic ~30x under the
HBM-bandwidth cost model below, and >= 4096-row tiles exceed VMEM (lane
padding is 8x). It therefore edges the coalesce+hints scatter only in a
narrow ~50-150k-row band at B=8192 (~7%) and is OFF by default
(--stream-update-max-rows). The naive cost model, kept for the record:
full-table traversal reads+writes 128 B/row at ~0.93 TB/s HBM => a
crossover vs the scatter at rows ~= 250 * B*P — a full-lane
formulation would need an rpv-packed table view that XLA's [R, 16]
parameter layout cannot alias without a divisibility-padding copy.

Replaces (for this size class): the serial scatter in the reference's
manual sparse SGD (sgd_quantized_gradients_parallel_comm.py:601-685);
torch's fused ATen EmbeddingBag backward (dlrm_s_pytorch.py:427-441).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _force_interpret() -> bool:
    """Test hook: DQRM_STREAM_INTERPRET=1 runs the kernel in interpreter
    mode on non-TPU backends (CPU CI exercises the real kernel wiring)."""
    return os.environ.get("DQRM_STREAM_INTERPRET", "") == "1"


def _stream_kernel(bounds_ref, idsw_ref, vals_ref, tile_ref, out_ref, *,
                   tile_rows: int, chunk: int):
    t = pl.program_id(0)
    lo = bounds_ref[t]
    hi = bounds_ref[t + 1]
    base = t * tile_rows
    rowids = jax.lax.broadcasted_iota(
        jnp.int32, (tile_rows, chunk), 0
    )  # [T, W] each row's local id, reused across chunks

    acc0 = tile_ref[...].astype(jnp.float32)

    def body(c, acc):
        ids_c = idsw_ref[pl.ds(c, 1), :]  # [1, W] ids in this window
        sel = (rowids == ids_c - base).astype(jnp.float32)  # [T, W]
        vals_c = vals_ref[pl.ds(c * chunk, chunk), :]  # [W, D]
        # HIGHEST precision: the TPU MXU truncates f32 operands to bf16 at
        # DEFAULT precision (measured 1e-2 update error on chip); the
        # multi-pass f32 emulation is noise next to the HBM streaming cost.
        return acc + jax.lax.dot_general(
            sel,
            vals_c,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    c0 = jax.lax.div(lo, chunk)
    c1 = jax.lax.div(hi + chunk - 1, chunk)
    acc = jax.lax.fori_loop(c0, c1, body, acc0)
    out_ref[...] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("tile_rows", "chunk", "interpret")
)
def stream_scatter_add(
    table: jax.Array,  # [R, D] f32/bf16
    sids: jax.Array,  # [U] int32, SORTED ascending (dups ok, pads >= R)
    svals: jax.Array,  # [U, D] f32, permuted to match sids
    *,
    tile_rows: int = 512,
    chunk: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """`table.at[sids].add(svals, mode="drop")` by streaming the table.

    `sids` MUST be sorted ascending (use `sort_sparse_grad` or
    `coalesce_sparse_grad`); out-of-range ids are dropped. Returns the
    updated table (aliased in place under jit donation).
    """
    if sids.ndim != 1 or svals.ndim != 2 or svals.shape[0] != sids.shape[0]:
        raise ValueError(f"bad shapes sids={sids.shape} svals={svals.shape}")
    R, D = table.shape
    U = sids.shape[0]
    n_tiles = -(-R // tile_rows)

    up = _round_up(max(U, 1), chunk)
    # Window padding: ids past U get an id beyond every tile (dropped);
    # vals pad with zeros (never selected anyway).
    sids = sids.astype(jnp.int32)
    ids_p = jnp.full((up,), jnp.int32(R + up), jnp.int32).at[:U].set(sids)
    idsw = ids_p.reshape(up // chunk, chunk)
    vals_p = jnp.zeros((up, D), jnp.float32).at[:U].set(
        svals.astype(jnp.float32)
    )
    # Tile segment boundaries: first update position with id >= t*T.
    starts = (jnp.arange(n_tiles + 1, dtype=jnp.int32) * tile_rows)
    bounds = jnp.searchsorted(sids, starts, side="left").astype(jnp.int32)
    # Clamp away the padding tail so empty tiles loop zero chunks.
    bounds = jnp.minimum(bounds, jnp.int32(U))

    kernel = functools.partial(
        _stream_kernel, tile_rows=tile_rows, chunk=chunk
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # idsw (whole)
                pl.BlockSpec(memory_space=pltpu.VMEM),  # vals (whole)
                pl.BlockSpec(
                    (tile_rows, D), lambda t, b: (t, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (tile_rows, D), lambda t, b: (t, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((R, D), table.dtype),
        input_output_aliases={3: 0},  # table (after 1 scalar + 2 vmem args)
        cost_estimate=pl.CostEstimate(
            flops=2 * tile_rows * up * D,
            bytes_accessed=table.dtype.itemsize * R * D * 2 + 4 * up * (D + 1),
            transcendentals=0,
        ),
        interpret=interpret,
    )(bounds, idsw, vals_p, table)
    return out


def sort_sparse_grad(ids: jax.Array, vals: jax.Array):
    """Sort a sparse gradient by row id (payload rides the sort).

    Unlike `coalesce_sparse_grad` this does NOT deduplicate — the streaming
    kernel sums duplicates itself — so it avoids the coalesce's own
    serial scatter. `jax.lax.sort` with the value rows as payload operands
    moves everything in one fused sort (measured cheaper than
    argsort + take's gather at DLRM dims)."""
    D = vals.shape[1]
    cols = [vals[:, j] for j in range(D)]
    out = jax.lax.sort((ids,) + tuple(cols), dimension=0, num_keys=1)
    sids = out[0]
    svals = jnp.stack(out[1:], axis=1)
    return sids, svals


def stream_update_auto(
    table: jax.Array,
    ids: jax.Array,  # [U] int32, UNSORTED (duplicates fine)
    vals: jax.Array,  # [U, D]
    *,
    presorted: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Streamed `table.at[ids].add(vals, mode='drop')` on TPU; exact XLA
    scatter elsewhere (CPU test meshes have no Mosaic — and no
    scatter-latency problem to solve)."""
    if jax.default_backend() != "tpu":
        if not (interpret or _force_interpret()):
            return table.at[ids].add(
                vals.astype(table.dtype), mode="drop",
                **({"indices_are_sorted": True} if presorted else {}),
            )
        interpret = True
    if presorted:
        sids, svals = ids, vals
    else:
        sids, svals = sort_sparse_grad(ids, vals)
    return stream_scatter_add(table, sids, svals, interpret=interpret)


# ---------------------------------------------------------------------------
# Per-row DMA-pipelined update — the multi-M-table experiment (VERDICT #1)
# ---------------------------------------------------------------------------

_N_SLOT = 8  # in-flight group DMAs


def _dma_row_kernel(nreal_ref, uids_ref, vals_ref, table_hbm, out_hbm,
                    scratch, wgrp, read_sems, write_sems, *,
                    dim: int, rpv: int):
    """Walk sorted UNIQUE row ids with pipelined single-vrow DMAs.

    The table arrives VIEWED as [R/rpv, D*rpv]: one 128-lane-aligned VMEM
    row ("vrow") packs `rpv` consecutive embedding rows, so each DMA is an
    aligned [1, D*rpv] slice (narrow d=16 fp32 rows are 64 B — below
    Mosaic's lane granularity — but their 8-row vrow is exactly 512 B).
    For each id: fetch its vrow HBM->VMEM (issued ahead, _N_SLOT slots in
    flight), add the update row at its lane offset in VMEM, write the vrow
    back. Sorted unique ids make same-vrow ids ADJACENT, so runs are
    merged: accumulation continues in the run's first slot and exactly one
    write-back happens per touched vrow — later vrows never alias earlier
    ones, so read/write DMAs to distinct vrows overlap freely.
    """
    n = nreal_ref[0]
    lanes = dim * rpv

    def grp(pos):
        return jax.lax.div(uids_ref[pos], rpv)

    def is_start(pos):
        # pos 0 is always a run start; uids are sorted unique so same-vrow
        # ids form one contiguous run.
        return jnp.logical_or(
            pos == 0, grp(pos) != grp(jnp.maximum(pos - 1, 0))
        )

    def read_dma(pos, slot):
        return pltpu.make_async_copy(
            table_hbm.at[pl.ds(grp(pos), 1), :], scratch.at[slot],
            read_sems.at[slot],
        )

    def wait_write(slot):
        # DMA semaphores are waited through the copy descriptor; wgrp
        # remembers which vrow the outstanding write targeted.
        @pl.when(wgrp[slot] >= 0)
        def _():
            pltpu.make_async_copy(
                scratch.at[slot], out_hbm.at[pl.ds(wgrp[slot], 1), :],
                write_sems.at[slot],
            ).wait()
            wgrp[slot] = -1

    # Scratch SMEM starts uninitialized.
    for s in range(_N_SLOT):
        wgrp[s] = -1

    # Slot r % _N_SLOT belongs to the r-th RUN (maximal same-vrow span);
    # reads are issued one per run, _N_SLOT positions ahead. Slot reuse is
    # safe: run r+_N_SLOT's read is issued no earlier than run r's consume
    # (positions of distinct runs differ by >= 1), and the slot's previous
    # write-back is drained (wgrp) before the read overwrites the buffer.

    def warm(s, ga):
        issue = jnp.logical_and(s < n, is_start(s))

        @pl.when(issue)
        def _():
            read_dma(s, jax.lax.rem(ga, _N_SLOT)).start()

        return ga + issue.astype(jnp.int32)

    ga0 = jax.lax.fori_loop(0, _N_SLOT, warm, jnp.int32(0))
    lane_block = jax.lax.div(
        jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1), dim
    )

    def body(j, carry):
        gc, ga = carry
        st = is_start(j)

        @pl.when(st)
        def _():
            read_dma(j, jax.lax.rem(gc, _N_SLOT)).wait()

        gc = gc + st.astype(jnp.int32)
        cur = jax.lax.rem(gc - 1, _N_SLOT)  # active run's slot
        rig = jax.lax.rem(uids_ref[j], rpv)
        val = vals_ref[pl.ds(j, 1), :]  # [1, dim]
        tiled = val if rpv == 1 else jnp.concatenate([val] * rpv, axis=1)
        scratch[cur] = scratch[cur] + jnp.where(
            lane_block == rig, tiled, 0.0
        ).astype(scratch.dtype)
        is_end = jnp.logical_or(j + 1 >= n, grp(j + 1) != grp(j))

        @pl.when(is_end)
        def _():
            pltpu.make_async_copy(
                scratch.at[cur], out_hbm.at[pl.ds(grp(j), 1), :],
                write_sems.at[cur],
            ).start()
            wgrp[cur] = grp(j)

        nxt = j + _N_SLOT
        issue = jnp.logical_and(nxt < n, is_start(nxt))

        @pl.when(issue)
        def _():
            s2 = jax.lax.rem(ga, _N_SLOT)
            # Recycle the slot: any outstanding write FROM it must land
            # before the new read overwrites the buffer.
            wait_write(s2)
            read_dma(nxt, s2).start()

        return gc, ga + issue.astype(jnp.int32)

    jax.lax.fori_loop(0, n, body, (jnp.int32(0), ga0))
    for s in range(_N_SLOT):
        wait_write(s)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dma_row_update(
    table: jax.Array,  # [R, D]
    uids: jax.Array,  # [U] int32 sorted UNIQUE (pads >= R at the tail)
    uvals: jax.Array,  # [U, D]
    *,
    interpret: bool = False,
) -> jax.Array:
    """`table.at[uids].add(uvals)` via per-row pipelined vrow DMAs.

    The table never leaves HBM; only touched 128-lane vrows move (each
    packs 128//D embedding rows when D < 128). Aimed at the multi-M
    tables where full-table streaming pays too much traffic. Requires
    coalesced input (`coalesce_sparse_grad`): sorted, unique, distinct
    out-of-range padding. Needs 128 % D == 0 or D % 128 == 0, and
    R % (128//D) == 0 (pad the table rows).
    """
    R, D = table.shape
    U = uids.shape[0]
    if D <= 128:
        if 128 % D:
            raise ValueError(f"dma_row_update needs 128 % D == 0, got D={D}")
        rpv = 128 // D
    else:
        if D % 128:
            raise ValueError(f"dma_row_update needs D % 128 == 0, got D={D}")
        rpv = 1
    if R % rpv:
        raise ValueError(f"dma_row_update needs R % {rpv} == 0 (pad rows)")
    tv = table.reshape(R // rpv, D * rpv)
    n_real = jnp.searchsorted(
        uids.astype(jnp.int32), jnp.int32(R), side="left"
    ).astype(jnp.int32).reshape(1)
    kernel = functools.partial(_dma_row_kernel, dim=D, rpv=rpv)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # n_real, uids
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # uvals
                pl.BlockSpec(memory_space=pl.ANY),  # table stays in HBM
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((_N_SLOT, 1, D * rpv), table.dtype),
                pltpu.SMEM((_N_SLOT,), jnp.int32),
                pltpu.SemaphoreType.DMA((_N_SLOT,)),
                pltpu.SemaphoreType.DMA((_N_SLOT,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(tv.shape, table.dtype),
        input_output_aliases={3: 0},  # table (after 2 scalar + 1 vmem args)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(n_real, uids.astype(jnp.int32), uvals.astype(table.dtype), tv)
    return out.reshape(R, D)


def sort_sparse_grads_batched(ids_list, vals_list):
    """Sort K same-shaped sparse gradients by row id in ONE fused sort.

    The per-table `sort_sparse_grad` calls are separate XLA sorts that each
    pay the sort-network latency; stacking the K tables' [U] ids (plus the
    D payload columns) into [K, U] operands and sorting along dimension 1
    amortizes it across tables. Returns ([K, U] sorted ids, [K, U, D]
    matching values)."""
    ids_all = jnp.stack(ids_list)  # [K, U]
    vals_all = jnp.stack(vals_list)  # [K, U, D]
    D = vals_all.shape[-1]
    cols = [vals_all[:, :, j] for j in range(D)]
    out = jax.lax.sort(
        (ids_all,) + tuple(cols), dimension=1, num_keys=1
    )
    return out[0], jnp.stack(out[1:], axis=2)
