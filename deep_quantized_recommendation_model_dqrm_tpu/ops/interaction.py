"""Pairwise feature interaction ops.

Reference: `DLRM_Net.interact_features` (dlrm_s_pytorch.py:476-509) and the
integer variant `modify_feature_interaction` (dlrm_s_pytorch_comm_grad.py:
744-792). The dot interaction concatenates the bottom-MLP output with all
pooled embeddings, computes the pairwise Gram matrix with a batched matmul
(MXU-friendly: one [B, F, D] x [B, D, F] bmm in bf16/f32), and gathers the
strictly-lower triangle with static indices (a constant gather XLA folds into
the surrounding fusion).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deep_quantized_recommendation_model_dqrm_tpu.ops import quant as q


def _tril_indices(num_fea: int, interact_itself: bool) -> Tuple[np.ndarray, np.ndarray]:
    """Static (li, lj) index vectors (dlrm_s_pytorch.py:492-497)."""
    offset = 1 if interact_itself else 0
    li = np.array([i for i in range(num_fea) for _ in range(i + offset)], dtype=np.int32)
    lj = np.array([j for i in range(num_fea) for j in range(i + offset)], dtype=np.int32)
    return li, lj


def dot_interaction(
    x: jax.Array,  # [B, D] bottom MLP output
    ly: jax.Array,  # [T, B, D] pooled embeddings
    interact_itself: bool = False,
    compute_dtype=jnp.float32,
) -> jax.Array:  # [B, D + npairs]
    """Dot-product interaction: Gram matrix lower-triangle + dense passthrough.

    compute_dtype=bfloat16 runs the bmm on bf16 operands with fp32
    accumulation (MXU-native); the dense passthrough stays fp32.
    """
    T_all = jnp.concatenate([x[None], ly], axis=0)  # [F, B, D]
    Tb = jnp.transpose(T_all, (1, 0, 2)).astype(compute_dtype)  # [B, F, D]
    Z = jnp.einsum(
        "bfd,bgd->bfg", Tb, Tb, preferred_element_type=jnp.float32
    )  # [B, F, F] — one bmm on the MXU
    li, lj = _tril_indices(Tb.shape[1], interact_itself)
    Zflat = Z[:, li, lj]  # static gather
    return jnp.concatenate([x, Zflat], axis=1)


def cat_interaction(x: jax.Array, ly: jax.Array) -> jax.Array:
    """Plain concatenation interaction (dlrm_s_pytorch.py:500-503)."""
    Tb = jnp.transpose(jnp.concatenate([x[None], ly], axis=0), (1, 0, 2))
    return Tb.reshape(Tb.shape[0], -1)


def quantized_dot_interaction(
    x: jax.Array,
    ly: jax.Array,
    bits: int = 16,
    interact_itself: bool = False,
) -> jax.Array:
    """Integer dot interaction (`--modify_feature_interaction`).

    Reference (dlrm_s_pytorch_comm_grad.py:744-792): quantize the concatenated
    features to INT16 with a shared symmetric scale, bmm on integers, rescale
    the Gram matrix by scale^2. On TPU the int16 x int16 -> int32 bmm maps to
    the MXU with integer accumulation; fake-quant STE keeps it trainable.
    """
    T_all = jnp.concatenate([x[None], ly], axis=0)
    scale = q.symmetric_quantization_params(bits, jnp.min(T_all), jnp.max(T_all))
    T_int = q.quantize_ste(T_all, scale, bits)  # float-typed integers, STE grad
    Tb = jnp.transpose(T_int, (1, 0, 2))
    Z = jnp.einsum("bfd,bgd->bfg", Tb, Tb, preferred_element_type=jnp.float32)
    Z = Z * jax.lax.stop_gradient(scale * scale)
    li, lj = _tril_indices(Tb.shape[1], interact_itself)
    return jnp.concatenate([x, Z[:, li, lj]], axis=1)
