"""Embedding compression tricks: quotient-remainder and mixed-dimension.

Functional re-designs of the reference's `tricks/` package:

- QR embedding (tricks/qr_embedding_bag.py:25-185, Shi et al. 2019):
  two small tables of sizes (ceil(n/collisions), collisions) composed by
  mult/add/concat on (idx // collisions, idx % collisions).
- Mixed-dimension embedding (tricks/md_embedding_bag.py:20-81, Ginart et
  al.): per-table dim from the alpha-power rule `md_solver`, plus a Linear
  projection back to the base dim.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Quotient-remainder
# ---------------------------------------------------------------------------


def init_qr_table(
    num_embeddings: int,
    embedding_dim: int,
    collisions: int,
    operation: str = "mult",
    seed: int = 0,
    include_meta: bool = True,
) -> Dict[str, jax.Array]:
    """Two tables: q [ceil(n/c), d], r [c, d] (concat splits d in half).

    Init matches qr_embedding_bag.py:118-137: U(-sqrt(1/n), sqrt(1/n)).
    """
    if operation not in ("mult", "add", "concat"):
        raise ValueError(f"unknown QR operation {operation!r}")
    rng = np.random.RandomState(seed)
    num_q = (num_embeddings + collisions - 1) // collisions
    d_q = d_r = embedding_dim
    if operation == "concat":
        d_q = embedding_dim // 2
        d_r = embedding_dim - d_q
    bound = np.sqrt(1.0 / num_embeddings)
    out = {
        "q": jnp.asarray(
            rng.uniform(-bound, bound, size=(num_q, d_q)).astype(np.float32)
        ),
        "r": jnp.asarray(
            rng.uniform(-bound, bound, size=(collisions, d_r)).astype(np.float32)
        ),
    }
    if include_meta:
        out["collisions"] = collisions
        out["operation"] = operation
    return out


def qr_pooled_lookup(
    qr: Dict[str, jax.Array],
    indices: jax.Array,  # [B, P]
    mask: Optional[jax.Array] = None,
    collisions: Optional[int] = None,
    operation: Optional[str] = None,
) -> jax.Array:  # [B, D]
    """Compositional lookup + sum pool (qr_embedding_bag.py:141-185):
    emb = op(Q[idx // c], R[idx % c]). `collisions`/`operation` default to
    the dict's metadata; pass them explicitly for metadata-free pytrees
    (jax tree_map chokes on non-array leaves)."""
    c = collisions if collisions is not None else qr["collisions"]
    op = operation if operation is not None else qr["operation"]
    iq = indices // c
    ir = indices % c
    eq = jnp.take(qr["q"], iq, axis=0)  # [B, P, dq]
    er = jnp.take(qr["r"], ir, axis=0)  # [B, P, dr]
    # The reference POOLS EACH TABLE FIRST, then composes
    # (qr_embedding_bag.py:160-176: two F.embedding_bag calls feed the op).
    # Pool-then-multiply != multiply-then-pool for bags with P > 1, so the
    # order matters; per_sample_weights/mask apply inside each bag.
    if mask is not None:
        m = mask[..., None].astype(eq.dtype)
        eq = eq * m
        er = er * m
    pq = jnp.sum(eq, axis=1)  # [B, dq]
    pr = jnp.sum(er, axis=1)  # [B, dr]
    if op == "mult":
        return pq * pr
    if op == "add":
        return pq + pr
    return jnp.concatenate([pq, pr], axis=-1)  # concat


# ---------------------------------------------------------------------------
# Mixed-dimension
# ---------------------------------------------------------------------------


def md_solver(
    n: np.ndarray, alpha: float, d0: Optional[int] = None, round_dim: bool = True
) -> np.ndarray:
    """Per-table dims by the alpha-power popularity rule, matching the
    reference exactly (md_embedding_bag.py:20-60): d_i = round(d0 *
    (n_i / n_min)^(-alpha)) as integers, clamped to >=1, the SMALLEST table
    pinned to exactly d0 (alpha_power_rule's `d[0] = d0` after the
    ascending sort), THEN optionally pow-2 rounded (pow_2_round operates on
    the already-integer dims — round-then-pow2 differs from pow2-of-raw)."""
    n = np.asarray(n, np.float64)
    if d0 is None:
        raise ValueError("d0 required")
    lam = d0 * np.min(n) ** alpha
    d = np.maximum(np.round(lam * n ** (-alpha)), 1.0)
    d[np.argmin(n)] = d0
    if round_dim:
        d = 2 ** np.round(np.log2(d))
    return d.astype(np.int64)


def init_md_table(
    num_embeddings: int,
    embedding_dim: int,
    base_dim: int,
    seed: int = 0,
) -> Dict[str, jax.Array]:
    """Low-dim table [n, d] + projection [base, d] (PrEmbeddingBag,
    md_embedding_bag.py:20-60). dim == base -> identity projection."""
    rng = np.random.RandomState(seed)
    bound = np.sqrt(1.0 / num_embeddings)
    table = rng.uniform(
        -bound, bound, size=(num_embeddings, embedding_dim)
    ).astype(np.float32)
    out: Dict[str, jax.Array] = {"table": jnp.asarray(table)}
    if embedding_dim < base_dim:
        # Linear(dim->base, bias=False), Xavier-uniform like nn.Linear default
        lim = np.sqrt(6.0 / (embedding_dim + base_dim))
        proj = rng.uniform(
            -lim, lim, size=(base_dim, embedding_dim)
        ).astype(np.float32)
        out["proj"] = jnp.asarray(proj)
    elif embedding_dim > base_dim:
        raise ValueError("embedding dim must be <= base dim")
    return out


def md_pooled_lookup(
    md: Dict[str, jax.Array],
    indices: jax.Array,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    rows = jnp.take(md["table"], indices, axis=0)  # [B, P, d]
    if mask is not None:
        rows = rows * mask[..., None].astype(rows.dtype)
    pooled = jnp.sum(rows, axis=1)
    if "proj" in md:
        pooled = pooled @ md["proj"].T
    return pooled
