"""Unit tests for ops.quant — numerics matched against the reference formulas
(quantization_supp/quant_utils.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_quantized_recommendation_model_dqrm_tpu.ops import quant as q


class TestScales:
    def test_symmetric_scale_scalar(self):
        # scale = clamp(max(|min|,|max|), 1e-8) / (2^(b-1)-1)
        s = q.symmetric_quantization_params(4, jnp.float32(-0.5), jnp.float32(0.3))
        assert np.isclose(float(s), 0.5 / 7)

    def test_symmetric_scale_clamp(self):
        s = q.symmetric_quantization_params(8, jnp.float32(0.0), jnp.float32(0.0))
        assert np.isclose(float(s), 1e-8 / 127)

    def test_symmetric_scale_per_channel(self):
        mins = jnp.array([-1.0, -0.1])
        maxs = jnp.array([0.5, 0.2])
        s = q.symmetric_quantization_params(8, mins, maxs)
        np.testing.assert_allclose(np.asarray(s), [1.0 / 127, 0.2 / 127], rtol=1e-6)

    def test_table_scale(self):
        table = jnp.array([[-2.0, 1.0], [0.5, 1.5]])
        s = q.table_scale(4, table)
        assert np.isclose(float(s), 2.0 / 7)

    def test_asymmetric_scale(self):
        s, zp = q.asymmetric_quantization_params(8, jnp.float32(0.0), jnp.float32(2.55))
        assert np.isclose(float(s), 0.01)
        assert float(zp) == 0.0


class TestQuantizeSTE:
    def test_forward_range_int4(self):
        # INT4 clamps to [-8, 7]: clamp(round(x/s), -n-1, n), n=7
        x = jnp.array([-100.0, -1.0, 0.0, 0.26, 1.0, 100.0])
        s = jnp.float32(0.25)
        out = q.quantize_ste(x, s, 4)
        np.testing.assert_array_equal(np.asarray(out), [-8, -4, 0, 1, 4, 7])

    def test_backward_is_grad_over_scale(self):
        s = jnp.float32(0.1)
        g = jax.grad(lambda x: jnp.sum(q.quantize_ste(x, s, 8)))(jnp.ones((4,)))
        np.testing.assert_allclose(np.asarray(g), np.full(4, 10.0), rtol=1e-6)

    def test_fake_quant_roundtrip(self):
        # values exactly on the grid survive quantize-dequantize
        s = jnp.float32(0.5)
        x = jnp.array([-1.0, -0.5, 0.0, 0.5, 1.0])
        out = q.fake_quant(x, s, 8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-6)

    def test_fake_quant_grad_identity(self):
        s = jnp.float32(0.3)
        x = jnp.array([0.1, -0.2, 0.7])
        g = jax.grad(lambda v: jnp.sum(q.fake_quant(v, s, 4)))(x)
        np.testing.assert_allclose(np.asarray(g), np.ones(3), rtol=1e-6)

    def test_fake_quant_error_bound(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.uniform(-1, 1, size=(128,)).astype(np.float32))
        s = q.symmetric_quantization_params(8, jnp.min(x), jnp.max(x))
        err = jnp.abs(q.fake_quant(x, s, 8) - x)
        assert float(jnp.max(err)) <= float(s) / 2 + 1e-7

    def test_per_channel_2d(self):
        x = jnp.array([[1.0, -2.0], [0.5, 0.25]])
        s = jnp.array([0.5, 0.25])  # per-row (out-channel) scales
        out = q.quantize_ste(x, s, 8)
        np.testing.assert_array_equal(np.asarray(out), [[2, -4], [2, 1]])

    def test_quantize_int_dtype(self):
        x = jnp.array([0.5, -0.5])
        assert q.quantize(x, jnp.float32(0.1), 8).dtype == jnp.int8
        assert q.quantize(x, jnp.float32(0.1), 16).dtype == jnp.int32

    def test_dequantize(self):
        qv = jnp.array([3, -5], dtype=jnp.int8)
        out = q.dequantize(qv, jnp.float32(0.1))
        np.testing.assert_allclose(np.asarray(out), [0.3, -0.5], rtol=1e-6)


class TestSTERound:
    def test_forward(self):
        x = jnp.array([0.4, 0.6, -1.5])
        np.testing.assert_array_equal(np.asarray(q.ste_round(x)), [0.0, 1.0, -2.0])

    def test_grad_identity(self):
        g = jax.grad(lambda x: jnp.sum(q.ste_round(x * 3.0)))(jnp.array([0.7]))
        np.testing.assert_allclose(np.asarray(g), [3.0], rtol=1e-6)


class TestAlternateSchemes:
    def test_pact_range_and_grad(self):
        x = jnp.asarray(np.random.RandomState(1).normal(size=(64,)).astype(np.float32))
        out = q.fake_quant_pact(x, 4)
        assert float(jnp.max(jnp.abs(out))) <= 1.0 + 1e-6
        g = jax.grad(lambda v: jnp.sum(q.fake_quant_pact(v, 4)))(x)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_lsq_quantizes_to_grid(self):
        x = jnp.array([0.31, -0.77, 0.12])
        s = jnp.float32(0.1)
        out = q.fake_quant_lsq(x, s, 8)
        # output values are (approximately) multiples of the step size
        ratio = np.asarray(out) / 0.1
        np.testing.assert_allclose(ratio, np.round(ratio), atol=1e-4)

    def test_lsq_step_gets_gradient(self):
        x = jnp.asarray(np.random.RandomState(2).normal(size=(32,)).astype(np.float32))
        g = jax.grad(lambda s: jnp.sum(q.fake_quant_lsq(x, s, 4) ** 2))(jnp.float32(0.2))
        assert np.isfinite(float(g)) and float(g) != 0.0


class TestFixedPoint:
    def test_batch_frexp_reconstruction(self):
        x = jnp.array([0.003, 1.7, 0.25])
        m, e = q.batch_frexp(x)
        recon = np.asarray(m, np.float64) / 2**31 * 2.0 ** (-np.asarray(e, np.float64) + 31)
        np.testing.assert_allclose(recon / 2**31 * 2**31, np.asarray(x), rtol=1e-6)

    def test_fixedpoint_requantize_matches_float(self):
        # integer requant ~ round(x_int * s_in*s_w/s_out)
        x_int = jnp.asarray(np.arange(-100, 100, dtype=np.float32))
        out = q.fixedpoint_requantize(
            x_int, 8, jnp.float32(0.02), jnp.float32(0.01), jnp.float32(0.5)
        )
        expect = np.clip(np.round(np.asarray(x_int) * 0.01 * 0.5 / 0.02), -128, 127)
        np.testing.assert_allclose(np.asarray(out), expect, atol=1.0)
