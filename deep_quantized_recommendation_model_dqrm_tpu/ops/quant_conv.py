"""Quantized convolution / pooling / dropout ops (HAWQ CNN module family).

Functional equivalents of the reference's CNN quant modules
(quantization_supp/quant_modules.py:640-1068: QuantConv2d, QuantBnConv2d,
QuantMaxPool2d, QuantAveragePool2d, QuantDropout), which back the ImageNet
side-harness (training_imagenet_speedup.py) used to sanity-check quantized-
gradient training outside DLRM. Same HAWQ numerics as the Linear path:
per-output-channel symmetric fake-quant of the kernel recomputed each
forward, STE gradients.

Layout: NHWC (TPU-native); kernels [kh, kw, cin, cout].
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from deep_quantized_recommendation_model_dqrm_tpu.ops import quant as q


def _per_out_channel_scale(w: jax.Array, bits: int) -> jax.Array:
    """Per-cout symmetric scale (quant_modules.py:755-766 per_channel
    branch: min/max over all non-output dims)."""
    flat = w.reshape(-1, w.shape[-1])
    return q.symmetric_quantization_params(
        bits, jnp.min(flat, axis=0), jnp.max(flat, axis=0)
    )


def fake_quant_conv_kernel(w: jax.Array, bits: int, per_channel: bool = True):
    """Fake-quantized conv kernel [kh, kw, cin, cout]."""
    if per_channel:
        s = _per_out_channel_scale(w, bits)  # [cout]
        s_b = jax.lax.stop_gradient(s).reshape(1, 1, 1, -1)
        return q.quantize_ste(w, s_b, bits) * s_b, s
    s = q.table_scale(bits, w)
    return q.fake_quant(w, s, bits), s


def quant_conv2d(
    x: jax.Array,  # [N, H, W, Cin]
    w: jax.Array,  # [kh, kw, Cin, Cout]
    b: Optional[jax.Array],
    bits: int = 8,
    stride: Tuple[int, int] = (1, 1),
    padding: str = "SAME",
    per_channel: bool = True,
) -> jax.Array:
    """QuantConv2d forward (quant_modules.py:700-800): fake-quant kernel (+
    bias on the kernel scale) then convolve — MXU-friendly NHWC conv."""
    w_fq, s = fake_quant_conv_kernel(w, bits, per_channel)
    out = jax.lax.conv_general_dilated(
        x,
        w_fq,
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        b_fq = q.fake_quant(b, s, 32) if per_channel else q.fake_quant(b, s, 32)
        out = out + b_fq
    return out


def quant_bn_conv2d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array],
    bn_scale: jax.Array,  # gamma / sqrt(var + eps), [Cout]
    bn_bias: jax.Array,  # beta - mean * bn_scale, [Cout]
    bits: int = 8,
    stride: Tuple[int, int] = (1, 1),
    padding: str = "SAME",
) -> jax.Array:
    """QuantBnConv2d (quant_modules.py:640-698): BN folded into the kernel
    BEFORE quantization (w' = w * bn_scale, b' = b * bn_scale + bn_bias) so
    the quantized graph has no separate BN."""
    w_folded = w * bn_scale.reshape(1, 1, 1, -1)
    b_folded = (b if b is not None else 0.0) * bn_scale + bn_bias
    return quant_conv2d(x, w_folded, b_folded, bits, stride, padding)


def max_pool2d(x: jax.Array, window: int = 2, stride: int = 2) -> jax.Array:
    """QuantMaxPool2d (quant_modules.py:869-905) — max pooling commutes with
    monotone dequantization, so no requant is needed."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        "VALID",
    )


def avg_pool2d(x: jax.Array, window: int = 2, stride: int = 2) -> jax.Array:
    """QuantAveragePool2d (quant_modules.py:1005-1068)."""
    summed = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        (1, window, window, 1),
        (1, stride, stride, 1),
        "VALID",
    )
    return summed / float(window * window)


def quant_dropout(
    x: jax.Array, rate: float, key: Optional[jax.Array], train: bool
) -> jax.Array:
    """QuantDropout (quant_modules.py:907-935): plain dropout — quantization
    passes through the Bernoulli mask unchanged."""
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
