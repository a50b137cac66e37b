"""Kernel tests: packed tables and fused lookups vs dense jnp references.

Pallas kernels run in interpreter mode on the CPU test mesh (compiled on
real TPU; same code path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_quantized_recommendation_model_dqrm_tpu.ops import quant as q
from deep_quantized_recommendation_model_dqrm_tpu.ops.pallas.packed_embedding import (
    pack_table,
    packed_pooled_lookup,
    packed_pooled_lookup_pallas,
    unpack_table,
)
from deep_quantized_recommendation_model_dqrm_tpu.ops.pallas.quant_matmul import (
    int8_linear,
    int8_linear_xla,
    quantize_linear_weights,
)


def make_table(rows=1000, d=16, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.uniform(-0.1, 0.1, size=(rows, d)).astype(np.float32))


class TestPackTable:
    @pytest.mark.parametrize("bits", [4, 8])
    def test_pack_unpack_symmetric(self, bits):
        t = make_table()
        pt = pack_table(t, bits=bits)
        back = unpack_table(pt)
        # max error is half a quantization step
        step = float(pt.scale)
        assert float(jnp.max(jnp.abs(back - t))) <= step / 2 + 1e-7

    @pytest.mark.parametrize("bits", [4, 8])
    def test_pack_unpack_rowwise(self, bits):
        t = make_table()
        pt = pack_table(t, bits=bits, rowwise=True)
        back = unpack_table(pt)
        steps = np.asarray(pt.scale)
        err = np.abs(np.asarray(back - t))
        assert np.all(err <= steps[:, None] / 2 + 1e-6)

    def test_compression_ratio(self):
        # INT4 packed table is ~8x smaller than fp32 (the paper's 8x claim)
        t = make_table(rows=4096, d=16)
        pt = pack_table(t, bits=4)
        ratio = (t.size * 4) / pt.nbytes()
        assert ratio > 7.9

    def test_symmetric_matches_reference_quant(self):
        # packed values must equal SymmetricQuantFunction outputs
        t = make_table(rows=64, d=4)
        pt = pack_table(t, bits=4)
        expect = np.asarray(q.quantize_ste(t, pt.scale, 4))
        v = np.asarray(pt.data, np.int32)
        lo = (v & 0xF) - 8
        hi = ((v >> 4) & 0xF) - 8
        got = np.concatenate([lo, hi], axis=-1)
        np.testing.assert_array_equal(got, expect)


class TestPackedLookup:
    @pytest.mark.parametrize("bits", [4, 8])
    @pytest.mark.parametrize("rowwise", [False, True])
    def test_lookup_matches_dense(self, bits, rowwise):
        t = make_table()
        pt = pack_table(t, bits=bits, rowwise=rowwise)
        rng = np.random.RandomState(1)
        idx = jnp.asarray(rng.randint(0, 1000, size=(32, 3)).astype(np.int32))
        got = packed_pooled_lookup(pt, idx)
        dense = unpack_table(pt)
        expect = jnp.sum(jnp.take(dense, idx, axis=0), axis=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-5, atol=1e-6)

    def test_lookup_with_mask(self):
        t = make_table()
        pt = pack_table(t, bits=4)
        rng = np.random.RandomState(2)
        idx = jnp.asarray(rng.randint(0, 1000, size=(16, 4)).astype(np.int32))
        mask = jnp.asarray((rng.rand(16, 4) > 0.5).astype(np.float32))
        got = packed_pooled_lookup(pt, idx, mask)
        dense = unpack_table(pt)
        expect = jnp.sum(jnp.take(dense, idx, axis=0) * mask[..., None], axis=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("bits", [4, 8])
    def test_pallas_kernel_matches_xla(self, bits):
        t = make_table(rows=500, d=16)
        pt = pack_table(t, bits=bits)
        rng = np.random.RandomState(3)
        idx = jnp.asarray(rng.randint(0, 500, size=(48, 2)).astype(np.int32))
        got = packed_pooled_lookup_pallas(pt, idx, tb=16, interpret=True)
        expect = packed_pooled_lookup(pt, idx)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-5, atol=1e-6)

    def test_pallas_kernel_pads_ragged_batch(self):
        t = make_table(rows=100, d=8)
        pt = pack_table(t, bits=4)
        rng = np.random.RandomState(4)
        idx = jnp.asarray(rng.randint(0, 100, size=(13, 1)).astype(np.int32))
        got = packed_pooled_lookup_pallas(pt, idx, tb=8, interpret=True)
        expect = packed_pooled_lookup(pt, idx)
        assert got.shape == (13, 8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-5, atol=1e-6)


class TestInt8Linear:
    def test_quantize_weights_roundtrip(self):
        rng = np.random.RandomState(0)
        w = jnp.asarray(rng.normal(0, 0.1, size=(64, 32)).astype(np.float32))
        b = jnp.asarray(rng.normal(0, 0.1, size=(64,)).astype(np.float32))
        qw = quantize_linear_weights(w, b, 8)
        back = qw.w_int.astype(jnp.float32) * qw.scale[:, None]
        assert float(jnp.max(jnp.abs(back - w))) <= float(jnp.max(qw.scale)) / 2 + 1e-7

    def test_pallas_matches_xla(self):
        rng = np.random.RandomState(1)
        w = jnp.asarray(rng.normal(0, 0.1, size=(128, 64)).astype(np.float32))
        b = jnp.asarray(rng.normal(0, 0.1, size=(128,)).astype(np.float32))
        x = jnp.asarray(rng.normal(0, 1.0, size=(40, 64)).astype(np.float32))
        qw = quantize_linear_weights(w, b, 8)
        got = int8_linear(x, qw, tb=16, interpret=True)
        expect = int8_linear_xla(x, qw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-4, atol=1e-4)

    def test_int8_accuracy_vs_fp32(self):
        rng = np.random.RandomState(2)
        w = jnp.asarray(rng.normal(0, 0.05, size=(32, 16)).astype(np.float32))
        b = jnp.asarray(rng.normal(0, 0.05, size=(32,)).astype(np.float32))
        x = jnp.asarray(rng.normal(0, 1.0, size=(8, 16)).astype(np.float32))
        qw = quantize_linear_weights(w, b, 8)
        got = int8_linear_xla(x, qw)
        ref = x @ w.T + b
        # int8 per-channel keeps relative error small
        assert float(jnp.max(jnp.abs(got - ref))) < 0.05
