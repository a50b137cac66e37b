"""Quantized CNN classifier family — the ImageNet side-harness model.

TPU-native analogue of the reference's `training_imagenet_speedup.py`
(torchvision ResNet driven by a row-sparsified gradient all-reduce to
sanity-check compressed-gradient training outside DLRM). Instead of
importing torchvision, the model is a compact VGG-style stack built from the
HAWQ quant-conv op family (`ops/quant_conv.py`, which mirrors
quantization_supp/quant_modules.py:640-1068): per-block

    QuantBnConv2d -> ReLU -> MaxPool2d

followed by global average pooling and a per-channel fake-quantized linear
head (QuantLinear semantics, quant_modules.py:94-188). Everything is NHWC
with bf16/f32 convs on the MXU; the whole forward is one fused XLA graph.

The companion distributed step lives in `parallel/topk_grad.py`
(training_imagenet_speedup.py:120-232 `average_gradients_update`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deep_quantized_recommendation_model_dqrm_tpu.ops import quant as q
from deep_quantized_recommendation_model_dqrm_tpu.ops.quant_conv import (
    max_pool2d,
    quant_bn_conv2d,
    quant_conv2d,
    quant_dropout,
)


@dataclass(frozen=True)
class CNNConfig:
    """Architecture spec (reference `-a/--arch` + dataset geometry,
    training_imagenet_speedup.py:33-40)."""

    image_size: int = 32
    in_channels: int = 3
    channels: Tuple[int, ...] = (32, 64, 128)  # one conv block per entry
    num_classes: int = 10
    kernel: int = 3
    quantize: bool = True
    bits: int = 8
    batch_norm: bool = True
    dropout_rate: float = 0.0

    def __post_init__(self):
        if self.image_size % (2 ** len(self.channels)) != 0:
            raise ValueError(
                "image_size must be divisible by 2^num_blocks "
                f"({self.image_size} vs {len(self.channels)} blocks)"
            )


def init_cnn_params(cfg: CNNConfig, seed: int = 0) -> Dict[str, Any]:
    """He-normal conv kernels, identity BN, Glorot head — matches the
    torchvision ResNet init family the reference trains from scratch
    (training_imagenet_speedup.py:309-350 `--pretrained` off)."""
    rs = np.random.RandomState(seed)
    blocks = []
    cin = cfg.in_channels
    for cout in cfg.channels:
        fan_in = cfg.kernel * cfg.kernel * cin
        # Kernels are STORED output-channel-major [cout, kh, kw, cin] so that
        # dim 0 is the row axis the top-k gradient sync selects on — torch
        # conv weights are [cout, cin, kh, kw] and the reference scores
        # `grad.view(size(0), -1)` rows (training_imagenet_speedup.py:131-135).
        # The forward transposes to HWIO for the MXU conv (free under XLA).
        blk = {
            "w": jnp.asarray(
                rs.normal(0.0, (2.0 / fan_in) ** 0.5, (cout, cfg.kernel, cfg.kernel, cin)),
                jnp.float32,
            ),
            "b": jnp.zeros((cout,), jnp.float32),
        }
        if cfg.batch_norm:
            blk["bn_scale"] = jnp.ones((cout,), jnp.float32)
            blk["bn_bias"] = jnp.zeros((cout,), jnp.float32)
        blocks.append(blk)
        cin = cout
    limit = (6.0 / (cin + cfg.num_classes)) ** 0.5
    head = {
        "w": jnp.asarray(
            rs.uniform(-limit, limit, (cfg.num_classes, cin)), jnp.float32
        ),
        "b": jnp.zeros((cfg.num_classes,), jnp.float32),
    }
    return {"conv": blocks, "head": head}


def _head_linear(cfg: CNNConfig, head: Dict[str, jax.Array], x: jax.Array) -> jax.Array:
    """Per-output-channel fake-quantized linear head (QuantLinear
    per-channel branch, quant_modules.py:94-188)."""
    w = head["w"]  # [classes, feat]
    if cfg.quantize:
        s = q.symmetric_quantization_params(
            cfg.bits, jnp.min(w, axis=1), jnp.max(w, axis=1)
        )
        s_b = jax.lax.stop_gradient(s)[:, None]
        w = q.quantize_ste(w, s_b, cfg.bits) * s_b
    return x @ w.T + head["b"]


def cnn_forward(
    cfg: CNNConfig,
    params: Dict[str, Any],
    images: jax.Array,  # [N, H, W, C] float32 in [0, 1]
    train: bool = False,
    dropout_key: Optional[jax.Array] = None,
) -> jax.Array:
    """Logits [N, num_classes]."""
    x = images
    for blk in params["conv"]:
        w = jnp.transpose(blk["w"], (1, 2, 3, 0))  # [cout,kh,kw,cin] -> HWIO
        if cfg.quantize and cfg.batch_norm:
            x = quant_bn_conv2d(
                x, w, blk["b"], blk["bn_scale"], blk["bn_bias"], cfg.bits
            )
        elif cfg.quantize:
            x = quant_conv2d(x, w, blk["b"], cfg.bits)
        else:
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ) + blk["b"]
            if cfg.batch_norm:
                x = x * blk["bn_scale"] + blk["bn_bias"]
        x = jax.nn.relu(x)
        x = max_pool2d(x, 2, 2)
        if train and cfg.dropout_rate > 0.0 and dropout_key is not None:
            dropout_key, sub = jax.random.split(dropout_key)
            x = quant_dropout(x, cfg.dropout_rate, sub, train)
    x = jnp.mean(x, axis=(1, 2))  # global average pool -> [N, C_last]
    return _head_linear(cfg, params["head"], x)


def cross_entropy_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean softmax cross-entropy with integer labels (the reference's
    nn.CrossEntropyLoss, training_imagenet_speedup.py:535)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def accuracy_topk(logits: jax.Array, labels: jax.Array, k: int = 1) -> jax.Array:
    """Top-k accuracy (training_imagenet_speedup.py:686-700)."""
    topk = jnp.argsort(-logits, axis=-1)[:, :k]
    return jnp.mean(jnp.any(topk == labels[:, None], axis=-1))


def synthetic_image_batch(
    cfg: CNNConfig, batch: int, rs: np.random.RandomState
) -> Tuple[np.ndarray, np.ndarray]:
    """Learnable class-conditional synthetic images (stand-in for the
    ImageNet/CIFAR folders the reference loads at
    training_imagenet_speedup.py:430-470; no image data in this
    environment). Each class has a fixed COARSE random block template
    (image_size/4-resolution, upsampled 4x) plus pixel noise: coarse
    structure survives the conv/pool/global-average-pool stack (iid-pixel
    templates would not — the spatial mean of a convolution carries almost
    no per-pixel information), so a small CNN separates the classes within
    a few hundred steps."""
    templ_rs = np.random.RandomState(1234)
    cs = max(1, cfg.image_size // 4)
    coarse = templ_rs.uniform(
        0.0, 1.0, (cfg.num_classes, cs, cs, cfg.in_channels)
    )
    up = cfg.image_size // cs
    templates = np.kron(coarse, np.ones((1, up, up, 1)))
    labels = rs.randint(0, cfg.num_classes, batch)
    imgs = templates[labels] + rs.normal(0.0, 0.25, (batch, cfg.image_size, cfg.image_size, cfg.in_channels))
    return imgs.astype(np.float32), labels.astype(np.int32)
