"""Optimizers: SGD, Adagrad, and Row-Wise Sparse Adagrad (RWSAdagrad).

Functional equivalents of the reference's optimizer choices
(dlrm_s_pytorch.py:1330-1334: {"sgd", "adagrad", "rwsadagrad"}):

- SGD: plain w -= lr * g (torch.optim.SGD, no momentum in the reference).
- Adagrad: state += g^2; w -= lr * g / (sqrt(state) + eps).
- RWSAdagrad (optim/rwsadagrad.py:11-122): embedding tables keep ONE
  accumulator scalar per row — the mean over the embedding dim of g^2 —
  instead of a full [rows, D] accumulator; dense params fall back to classic
  Adagrad. On TPU we apply it densely over the table (XLA fuses the row-mean
  + rsqrt + update into one HBM pass); the sparse-update variant lives in
  `parallel/comm_grad.py` where gradients are (ids, values) pairs.

All update fns are pytree-polymorphic and jit-safe.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

EPS = 1e-10  # reference RWSAdagrad eps default (optim/rwsadagrad.py:37)


def sgd_update(params: Any, grads: Any, lr) -> Any:
    # preserve parameter dtypes (bf16 tables must not silently promote to
    # f32 through the f32 learning-rate scalar)
    return jax.tree_util.tree_map(
        lambda p, g: (p - lr * g).astype(p.dtype), params, grads
    )


def adagrad_init(params: Any) -> Any:
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def adagrad_update(
    params: Any, grads: Any, state: Any, lr, eps: float = EPS
) -> Tuple[Any, Any]:
    new_state = jax.tree_util.tree_map(lambda s, g: s + g * g, state, grads)
    new_params = jax.tree_util.tree_map(
        lambda p, g, s: (p - lr * g / (jnp.sqrt(s) + eps)).astype(p.dtype),
        params, grads, new_state,
    )
    return new_params, new_state


def _rw_table_state(t) -> Any:
    """Row-wise accumulator(s) for one emb entry. QR/MD dict entries mirror
    the reference exactly: their bag weights (q/r/table) carry sparse grads
    so RWSAdagrad gives them one scalar per row (rwsadagrad.py:74-118), while
    the MD projection is a dense Linear -> classic Adagrad state."""
    if isinstance(t, dict):
        return {
            k: (
                jnp.zeros((v.shape[0],), jnp.float32)
                if k in ("q", "r", "table")
                else jnp.zeros_like(v)
            )
            for k, v in t.items()
        }
    return jnp.zeros((t.shape[0],), jnp.float32)


def rwsadagrad_init(params: Any) -> Any:
    """Row-wise state for 'emb' tables ([rows] per table), full state for
    MLP params."""
    state = {}
    for key, val in params.items():
        if key == "emb":
            state[key] = [_rw_table_state(t) for t in val]
        else:
            state[key] = jax.tree_util.tree_map(jnp.zeros_like, val)
    return state


def rwsadagrad_update(
    params: Any, grads: Any, state: Any, lr, eps: float = EPS
) -> Tuple[Any, Any]:
    """Row-wise sparse Adagrad (optim/rwsadagrad.py:74-118): per embedding row
    acc += mean_d(g^2); w -= lr * g / (sqrt(acc) + eps)."""
    new_params = dict(params)
    new_state = dict(state)
    def _rw_one(table, g, acc):
        row_ms = jnp.mean(g * g, axis=1)  # [rows]
        acc2 = acc + row_ms
        std = jnp.sqrt(acc2)[:, None] + eps
        return (table - lr * g / std).astype(table.dtype), acc2

    new_emb, new_emb_state = [], []
    for table, g, acc in zip(params["emb"], grads["emb"], state["emb"]):
        if isinstance(table, dict):
            upd, st = {}, {}
            for k in table:
                if k in ("q", "r", "table"):
                    upd[k], st[k] = _rw_one(table[k], g[k], acc[k])
                else:  # MD projection: dense Linear -> classic Adagrad
                    st[k] = acc[k] + g[k] * g[k]
                    upd[k] = (
                        table[k] - lr * g[k] / (jnp.sqrt(st[k]) + eps)
                    ).astype(table[k].dtype)
            new_emb.append(upd)
            new_emb_state.append(st)
            continue
        upd, acc2 = _rw_one(table, g, acc)
        new_emb.append(upd)
        new_emb_state.append(acc2)
    new_params["emb"] = new_emb
    new_state["emb"] = new_emb_state
    for key in params:
        if key == "emb":
            continue
        sub_p, sub_s = adagrad_update(params[key], grads[key], state[key], lr, eps)
        new_params[key] = sub_p
        new_state[key] = sub_s
    return new_params, new_state
