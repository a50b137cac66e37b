"""PTQ A/B vs the ACTUAL ATen quantized embedding kernels.

The reference's inference path packs tables with
torch.ops.quantized.embedding_bag_{4bit,byte}_prepack and looks them up
with embedding_bag_{4bit,byte}_rowwise_offsets (dlrm_s_pytorch.py:427-441,
:457-474 — C++/fbgemm kernels). Our `pack_table(rowwise=True)` +
`packed_pooled_lookup` reimplement that scheme for TPU; these tests assert
the quantized integers and qparams are BIT-IDENTICAL to fbgemm's and the
pooled lookup outputs match to float tolerance.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from deep_quantized_recommendation_model_dqrm_tpu.ops.pallas.packed_embedding import (  # noqa: E402
    pack_table,
    packed_pooled_lookup,
    unpack_table,
)

ROWS, D = 120, 16
B, P = 32, 4


def _table(seed=0):
    rng = np.random.RandomState(seed)
    # varied per-row ranges + a constant row (zero-range guard)
    t = (rng.uniform(-1, 1, size=(ROWS, D)) * rng.uniform(0.01, 0.5, size=(ROWS, 1))).astype(np.float32)
    t[7] = 0.25
    return t


def _aten_ints(packed, bits):
    raw = packed.numpy()
    if bits == 4:
        data = raw[:, :-4]
        q = np.empty((raw.shape[0], data.shape[1] * 2), np.int32)
        q[:, 0::2] = data & 0xF
        q[:, 1::2] = (data >> 4) & 0xF
        sb = np.frombuffer(raw[:, -4:].tobytes(), np.float16).reshape(-1, 2)
    else:
        q = raw[:, :-8].astype(np.int32)
        sb = np.frombuffer(raw[:, -8:].tobytes(), np.float32).reshape(-1, 2)
    return q, sb[:, 0].astype(np.float32), sb[:, 1].astype(np.float32)


def _ours_ints(pt):
    data = np.asarray(pt.data)
    if pt.bits == 4:
        lo = data & 0xF
        hi = (data >> 4) & 0xF
        return np.concatenate([lo, hi], axis=1).astype(np.int32)
    return data.astype(np.int32)


class TestPrepackBitExact:
    @pytest.mark.parametrize("bits", [4, 8])
    def test_quantized_ints_and_qparams_match_fbgemm(self, bits):
        t = _table()
        w = torch.tensor(t)
        if bits == 4:
            packed = torch.ops.quantized.embedding_bag_4bit_prepack(w)
        else:
            packed = torch.ops.quantized.embedding_bag_byte_prepack(w)
        q_ref, sc_ref, bi_ref = _aten_ints(packed, bits)

        pt = pack_table(t, bits=bits, rowwise=True)
        q_ours = _ours_ints(pt)
        # ours stores halves-concatenated; ATen interleaves — compare by
        # element position after undoing each layout
        half = D // 2
        q_ours_elem = np.empty_like(q_ours)
        if bits == 4:
            q_ours_elem[:, 0::1] = 0  # overwritten below
            q_ours_elem = np.concatenate(
                [q_ours[:, :half], q_ours[:, half:]], axis=1
            )
            # ours: element j lives at column j (lo half = cols 0..D/2-1
            # packs elements 0..D/2-1). ATen q_ref is already element-ordered.
            np.testing.assert_array_equal(q_ours_elem, q_ref)
        else:
            np.testing.assert_array_equal(q_ours, q_ref)
        np.testing.assert_allclose(np.asarray(pt.scale), sc_ref, rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(pt.bias), bi_ref, rtol=0, atol=0)

    @pytest.mark.parametrize("bits", [4, 8])
    def test_dequant_table_matches_aten(self, bits):
        t = _table(1)
        pt = pack_table(t, bits=bits, rowwise=True)
        deq = np.asarray(unpack_table(pt))
        # ATen dequant = q * scale + bias with the stored params
        w = torch.tensor(t)
        packed = (
            torch.ops.quantized.embedding_bag_4bit_prepack(w)
            if bits == 4
            else torch.ops.quantized.embedding_bag_byte_prepack(w)
        )
        q_ref, sc, bi = _aten_ints(packed, bits)
        ref = q_ref * sc[:, None] + bi[:, None]
        np.testing.assert_allclose(deq, ref, rtol=1e-6, atol=1e-7)


class TestRowwiseOffsetsLookup:
    @pytest.mark.parametrize("bits", [4, 8])
    def test_pooled_lookup_matches_aten_kernel(self, bits):
        t = _table(2)
        rng = np.random.RandomState(3)
        idx = rng.randint(0, ROWS, size=(B, P)).astype(np.int64)

        w = torch.tensor(t)
        if bits == 4:
            packed = torch.ops.quantized.embedding_bag_4bit_prepack(w)
            out_ref = torch.ops.quantized.embedding_bag_4bit_rowwise_offsets(
                packed,
                torch.tensor(idx.reshape(-1)),
                torch.arange(0, B * P, P),
            ).numpy()
        else:
            packed = torch.ops.quantized.embedding_bag_byte_prepack(w)
            out_ref = torch.ops.quantized.embedding_bag_byte_rowwise_offsets(
                packed,
                torch.tensor(idx.reshape(-1)),
                torch.arange(0, B * P, P),
            ).numpy()

        pt = pack_table(t, bits=bits, rowwise=True)
        ours = np.asarray(packed_pooled_lookup(pt, idx.astype(np.int32)))
        np.testing.assert_allclose(ours, out_ref, rtol=1e-5, atol=1e-6)
