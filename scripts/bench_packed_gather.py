"""Roofline / latency analysis of the packed-embedding gather at real DLRM
dims — the measurement that closes the "narrow-row Pallas gather kernel"
question (PARITY.md).

Measures, on the attached TPU chip:
  1. packed INT4 d=16 gather+unpack+pool (8-B rows) at B=16384, uniform ids
  2. the same gather from an fp32 table (64-B rows, 8x the bytes)
  3. Zipfian (hot-row) ids, raw and pre-sorted
  4. an in-graph sort+unsort wrapper (the sort/coalesce kernel candidate)
  5. sequential HBM copy (bandwidth ceiling reference)

Findings (TPU v5e-class chip via axon, 2026-08-17):
  uniform 27.6 us, fp32 19.6 us (same despite 8x bytes => LATENCY-bound),
  zipf 13.0 us, zipf pre-sorted 12.8 us (hardware already exploits
  locality), sort-in-graph 28.1 us (the sort costs more than it saves).
A DMA kernel cannot beat the hardware gather issue rate for uncoalescible
8-B random fetches, and a sort/coalesce pre-pass is strictly a loss —
the XLA gather path IS the right engine for narrow packed rows. The Pallas
kernel remains for wide rows (packed >= 128 B), where it is
bandwidth-parity with XLA (round-1: 784 vs 762 us).

TIMING CAVEAT (2026-08-19): the loops below time with
`jax.block_until_ready`, which on the axon tunneled backend returns at
ENQUEUE, not completion — absolute numbers this script printed before
2026-08-19 are host enqueue rates, not device compute. Before trusting a
re-run, port the timing to the chain-slope + forced-scalar-readback
pattern (see bench.py / .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from deep_quantized_recommendation_model_dqrm_tpu.ops.pallas.packed_embedding import (
    PackedTable,
    pack_table,
    packed_pooled_lookup,
)


def bench(f, *args, n=200):
    o = f(*args)
    jax.block_until_ready(o)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            o = f(*args)
        jax.block_until_ready(o)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    B, rows, D = 16384, 10_000_000, 16
    tbl = jax.random.uniform(jax.random.PRNGKey(0), (rows, D), jnp.float32, -0.01, 0.01)
    pt = pack_table(tbl, bits=4)

    rng = np.random.RandomState(0)
    z = rng.zipf(1.2, size=B * 3)
    z = z[z <= rows][:B] - 1
    idx_zipf = jnp.asarray(z.astype(np.int32)).reshape(B, 1)
    idx_uni = jax.random.randint(jax.random.PRNGKey(1), (B, 1), 0, rows, jnp.int32)

    f = jax.jit(
        lambda data, scale, i: packed_pooled_lookup(
            PackedTable(data, scale, None, 4, D), i
        )
    )
    f_fp32 = jax.jit(lambda t, i: jnp.take(t, i[:, 0], axis=0))

    def presort(data, scale, i):
        order = jnp.argsort(i[:, 0])
        out = packed_pooled_lookup(
            PackedTable(data, scale, None, 4, D), i[order]
        )
        return out[jnp.argsort(order)]

    f_s = jax.jit(presort)

    t = bench(f, pt.data, pt.scale, idx_uni)
    print(f"packed int4 gather+pool uniform: {t*1e6:.1f} us "
          f"({B*8/t/1e9:.1f} GB/s useful)")
    t = bench(f_fp32, tbl, idx_uni)
    print(f"fp32 gather uniform (8x bytes):  {t*1e6:.1f} us "
          f"({B*64/t/1e9:.1f} GB/s useful)")
    t = bench(f, pt.data, pt.scale, idx_zipf)
    print(f"packed gather zipf (hot rows):   {t*1e6:.1f} us")
    t = bench(f, pt.data, pt.scale, jnp.sort(idx_zipf, axis=0))
    print(f"packed gather zipf pre-sorted:   {t*1e6:.1f} us")
    t = bench(f_s, pt.data, pt.scale, idx_zipf)
    print(f"packed gather + in-graph sort:   {t*1e6:.1f} us")
    f_copy = jax.jit(lambda x: x + jnp.uint8(1))
    t = bench(f_copy, pt.data, n=20)
    print(f"sequential 80MB r+w reference:   {t*1e3:.2f} ms "
          f"({2*pt.data.size/t/1e9:.0f} GB/s)")


if __name__ == "__main__":
    main()
