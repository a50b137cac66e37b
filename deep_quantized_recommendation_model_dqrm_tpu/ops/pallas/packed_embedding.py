"""Bit-packed quantized embedding tables + fused gather-dequant-pool lookup.

The serving-path replacement for PyTorch's ATen kernels
`embedding_bag_4bit_prepack` / `embedding_bag_byte_prepack` and
`embedding_bag_{4bit,byte}_rowwise_offsets` (reference PTQ path,
dlrm_s_pytorch.py:427-474): tables live bit-packed in HBM at 4 or 8 bits per
value and the lookup fuses gather + dequantize + sum-pool.

Two pack formats:
- **symmetric per-table** (DQRM scheme): signed ints, one fp32 scale per
  table; dequant = q * scale (quant_utils.py:141-194 numerics);
- **asymmetric row-wise** (ATen prepack scheme): unsigned ints, per-row
  (scale, bias) from row min/max; dequant = q * scale + bias.

INT4 layout: byte j of a packed row holds value j in the LOW nibble and
value j + D/2 in the HIGH nibble — unpacking is a lane-wise concat (no
interleave shuffle, which TPUs hate).

Execution paths:
- `packed_pooled_lookup` — pure-jnp: XLA gather on the uint8 array + fused
  unpack/dequant/pool. Works on any backend; XLA's dynamic-gather streams
  rows from HBM. This is the default.
- `packed_pooled_lookup_pallas` — Pallas kernel for tables that fit VMEM:
  the whole packed table is staged into VMEM once per grid and lookups are
  dynamic row reads at VMEM latency, fused with unpack+pool. Intended for
  the many small-to-medium Criteo tables; big tables dispatch to the XLA
  path (`pooled_lookup_auto`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deep_quantized_recommendation_model_dqrm_tpu.ops import quant as q


class PackedTable(NamedTuple):
    data: jax.Array  # uint8 [rows, D//2] (int4) or [rows, D] (int8)
    scale: jax.Array  # [] per-table or [rows] row-wise
    bias: Optional[jax.Array]  # None (symmetric) or [rows] (asymmetric)
    bits: int
    dim: int  # original embedding dim D

    @property
    def rows(self) -> int:
        return self.data.shape[0]

    def nbytes(self) -> int:
        n = self.data.size
        n += self.scale.size * 4
        if self.bias is not None:
            n += self.bias.size * 4
        return n


def pack_table(
    table: jax.Array, bits: int = 4, rowwise: bool = False,
    row_chunk: int = 0,
) -> PackedTable:
    """Quantize + bit-pack a [rows, D] fp table.

    `row_chunk` > 0 (symmetric path only): quantize/pack in row chunks
    with a device sync per chunk. The whole-table quantize materializes
    ~4x the table in f32 temporaries (round/clip promote bf16 inputs) —
    at Terabyte scale a 2.5 GB table's ~10 GB of temps next to a live
    6.3 GB mega OOMs a 16 GB chip; chunking bounds the transient to one
    chunk's temps. Output is bit-identical (the per-table scale is
    computed once over the full table)."""
    rows, D = table.shape
    if bits == 4:
        assert D % 2 == 0, "int4 packing requires even embedding dim"
    if row_chunk and not rowwise and rows > row_chunk:
        scale = q.table_scale(bits, table)  # one cheap full reduce
        parts = []
        for off in range(0, rows, row_chunk):
            sl = jax.lax.dynamic_slice(
                table, (off, 0), (min(row_chunk, rows - off), D)
            )
            part = _pack_symmetric_rows(sl, scale, bits, D)
            part.block_until_ready()
            parts.append(part)
        data = jnp.concatenate(parts, axis=0)
        data.block_until_ready()
        for part in parts:
            part.delete()
        return PackedTable(data=data, scale=scale, bias=None, bits=bits, dim=D)
    if rowwise:
        # ATen embedding_bag_{4bit,byte}_prepack scheme: per-row asymmetric
        # (dlrm_s_pytorch.py:457-474 -> fbgemm FloatToFusedNBitRowwise-
        # QuantizedSBHalf). Verified BIT-EXACT against the actual torch ops
        # in tests/test_ptq_aten_parity.py:
        #  - 4 bit: bias = fp16(row min); scale = fp16((max - bias)/15),
        #    zero range -> scale 1.0; q = clip(rint((x-bias)/scale), 0, 15)
        #    with the fp16-rounded params.
        #  - 8 bit: fp32 scale = (max-min)/255 (stored even when 0), fp32
        #    bias = min; quantize via the guarded inverse scale.
        lo = jnp.min(table, axis=1)  # [rows]
        hi = jnp.max(table, axis=1)
        n = 2**bits - 1
        if bits == 4:
            bias = lo.astype(jnp.float16).astype(jnp.float32)
            scale = ((hi - bias) / n).astype(jnp.float16).astype(jnp.float32)
            scale = jnp.where(scale == 0, 1.0, scale)
            qv = jnp.clip(jnp.round((table - bias[:, None]) / scale[:, None]), 0, n)
        else:
            bias = lo
            rng = hi - lo
            inv = jnp.where(rng == 0, 1.0, n / rng)
            scale = rng / n
            qv = jnp.clip(jnp.round((table - bias[:, None]) * inv[:, None]), 0, n)
        qv = qv.astype(jnp.uint8)
    else:
        scale = q.table_scale(bits, table)
        return PackedTable(
            data=_pack_symmetric_rows(table, scale, bits, D),
            scale=scale, bias=None, bits=bits, dim=D,
        )
    if bits == 4:
        lo_half = qv[:, : D // 2]
        hi_half = qv[:, D // 2 :]
        data = (lo_half | (hi_half << 4)).astype(jnp.uint8)
    elif bits == 8:
        data = qv
    else:
        raise ValueError(f"unsupported pack bits {bits}")
    return PackedTable(data=data, scale=scale, bias=bias, bits=bits, dim=D)


def _pack_symmetric_rows(
    rows_arr: jax.Array, scale: jax.Array, bits: int, D: int
) -> jax.Array:
    """Symmetric quantize + nibble/byte pack of [rows, D] at a given
    per-table scale (shared by the whole-table and chunked paths)."""
    n = q.intmax(bits)
    qv = jnp.clip(jnp.round(rows_arr / scale), -n - 1, n).astype(jnp.int32)
    # store signed values offset to unsigned nibble/byte range
    qv = (qv + (2 ** (bits - 1))).astype(jnp.uint8)
    if bits == 4:
        return (qv[:, : D // 2] | (qv[:, D // 2 :] << 4)).astype(jnp.uint8)
    if bits == 8:
        return qv
    raise ValueError(f"unsupported pack bits {bits}")


def _unpack_rows(pt: PackedTable, raw: jax.Array) -> jax.Array:
    """uint8 [..., D_packed] -> float32 [..., D] integer values (pre-scale),
    signed-centered for symmetric tables, unsigned for row-wise."""
    v = raw.astype(jnp.int32)
    if pt.bits == 4:
        lo = v & 0xF
        hi = (v >> 4) & 0xF
        vals = jnp.concatenate([lo, hi], axis=-1)
    else:
        vals = v
    if pt.bias is None:
        vals = vals - (2 ** (pt.bits - 1))  # undo unsigned offset
    return vals.astype(jnp.float32)


def unpack_table(pt: PackedTable) -> jax.Array:
    """Full dequantized [rows, D] fp32 table (tests / export)."""
    vals = _unpack_rows(pt, pt.data)
    if pt.bias is None:
        return vals * pt.scale
    return vals * pt.scale[:, None] + pt.bias[:, None]


def packed_pooled_lookup(
    pt: PackedTable,
    indices: jax.Array,  # [B, P] int32
    mask: Optional[jax.Array] = None,  # [B, P]
) -> jax.Array:  # [B, D] float32
    """XLA path: gather packed rows, fused unpack+dequant+pool."""
    raw = jnp.take(pt.data, indices, axis=0)  # [B, P, D_packed] uint8
    vals = _unpack_rows(pt, raw)  # [B, P, D]
    if pt.bias is None:
        vals = vals * pt.scale
    else:
        s = jnp.take(pt.scale, indices, axis=0)[..., None]
        b = jnp.take(pt.bias, indices, axis=0)[..., None]
        vals = vals * s + b
    if mask is not None:
        vals = vals * mask[..., None].astype(vals.dtype)
    return jnp.sum(vals, axis=1)


# ---------------------------------------------------------------------------
# Pallas kernel: HBM-resident packed table, DMA-pipelined fused lookup
# ---------------------------------------------------------------------------

_N_BUF = 8  # DMA slots in flight — hides HBM row-fetch latency


def _hbm_lookup_kernel(
    idx_ref,  # scalar-prefetch [B_padded * P] int32 (flattened lookups)
    table_ref,  # ANY/HBM [rows, D_packed] uint8
    out_ref,  # VMEM [TB, dim] f32 (this tile's pooled integer sums)
    scratch,  # VMEM [N_BUF, 1, D_packed] uint8
    sems,  # DMA semaphores [N_BUF]
    *,
    tb: int,
    pooling: int,
    bits: int,
    dim: int,
):
    i = pl.program_id(0)
    total = tb * pooling  # lookups handled by this tile
    offset = 2 ** (bits - 1)

    # HBM slices must be sublane-aligned (groups of 8 rows): fetch the
    # aligned 8-row group containing the target row and select within VMEM.
    # No extra HBM traffic in practice — the DMA granule covers it anyway.
    def group_dma(slot, j):
        r = idx_ref[i * total + j]
        g = pl.multiple_of((r // 8) * 8, 8)
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(g, 8), :], scratch.at[slot], sems.at[slot]
        )

    # Warm the pipeline.
    for s in range(_N_BUF):

        @pl.when(s < total)
        def _(s=s):
            group_dma(s, s).start()

    out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    def body(j, _):
        slot = jax.lax.rem(j, _N_BUF)
        group_dma(slot, j).wait()
        rig = jax.lax.rem(idx_ref[i * total + j], 8)
        # Dynamic sublane indexing of int8 VMEM is unsupported on TPU; load
        # the 8-row group and select the target row with a mask+reduce.
        grp = scratch[slot].astype(jnp.int32)  # [8, D_packed]
        rowsel = jax.lax.broadcasted_iota(jnp.int32, grp.shape, 0) == rig
        v = jnp.sum(jnp.where(rowsel, grp, 0), axis=0, keepdims=True)  # [1, D_packed]
        if bits == 4:
            v = jnp.concatenate([v & 0xF, (v >> 4) & 0xF], axis=-1)
        vals = (v - offset).astype(jnp.float32)  # [1, dim] integer values
        b = jax.lax.div(j, pooling)
        out_ref[pl.ds(b, 1), :] += vals
        # Refill the slot with lookup j + N_BUF.
        nxt = j + _N_BUF

        @pl.when(nxt < total)
        def _():
            group_dma(slot, nxt).start()

        return 0

    jax.lax.fori_loop(0, total, body, 0)


def packed_pooled_lookup_pallas(
    pt: PackedTable,
    indices: jax.Array,  # [B, P] int32
    tb: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Pallas fused gather+dequant+pool over an HBM-resident packed table.

    The table never leaves HBM (no 16x VMEM lane inflation for narrow uint8
    rows); each lookup's packed row is DMA'd at exact byte granularity into
    one of `_N_BUF` VMEM slots, with the next fetch issued before the current
    row is consumed (double-buffered latency hiding). Unpack + dequant + pool
    happen in VMEM, fused with the copy pipeline — the TPU analogue of
    ATen's `embedding_bag_4bit_rowwise_offsets` fused kernel.
    """
    if pt.bias is not None:
        raise NotImplementedError("pallas path covers symmetric tables")
    dp_bytes = pt.dim // 2 if pt.bits == 4 else pt.dim
    if dp_bytes % 128 != 0 and not interpret:
        # Mosaic DMA slices must be 128-lane aligned: row-granular fetches of
        # narrow packed rows (DLRM: 8-32 B) cannot compile. For those shapes
        # XLA's native gather on the compact uint8 array is already
        # HBM-bound-optimal (verified vs this kernel on wide rows); the
        # kernel applies to wide-row tables (packed row >= 128 B).
        return packed_pooled_lookup(pt, indices)
    B, P = indices.shape
    pad = (-B) % tb
    if pad:
        indices = jnp.concatenate(
            [indices, jnp.zeros((pad, P), indices.dtype)], axis=0
        )
    Bp = B + pad
    dp = pt.dim // 2 if pt.bits == 4 else pt.dim
    data = pt.data
    row_pad = (-data.shape[0]) % 8
    if row_pad:
        # 8-row group fetches must not run off the end of the table.
        data = jnp.concatenate(
            [data, jnp.zeros((row_pad, dp), data.dtype)], axis=0
        )
    kernel = functools.partial(
        _hbm_lookup_kernel, tb=tb, pooling=P, bits=pt.bits, dim=pt.dim
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Bp // tb,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # packed table in HBM
            ],
            out_specs=pl.BlockSpec(
                (tb, pt.dim), lambda i, idx: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((_N_BUF, 8, dp), jnp.uint8),
                pltpu.SemaphoreType.DMA((_N_BUF,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, pt.dim), jnp.float32),
        interpret=interpret,
    )(indices.reshape(-1), data)
    # Per-table scalar dequant commutes with the pooled sum; XLA fuses it.
    return out[:B] * pt.scale


def pooled_lookup_auto(
    pt: PackedTable,
    indices: jax.Array,
    mask: Optional[jax.Array] = None,
    use_pallas: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Dispatch between the Pallas DMA kernel and the XLA gather path
    (mirrors the per-table dispatch at dlrm_s_pytorch.py:422-442). The XLA
    path is the default — benchmarks pick the winner per deployment."""
    if use_pallas and pt.bias is None and mask is None:
        return packed_pooled_lookup_pallas(pt, indices, interpret=interpret)
    return packed_pooled_lookup(pt, indices, mask)
