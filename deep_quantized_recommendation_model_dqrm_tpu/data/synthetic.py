"""Synthetic data generation — the `--data-generation=random` path.

Mirrors `make_random_data_and_loader` / `RandomDataset`
(dlrm_data_pytorch.py:766-968): uniform dense features, per-table uniform
sparse indices with variable pooling, uniform binary targets. Two flavors:

- host-side numpy batches (`RandomBatchLoader`) matching the reference's
  DataLoader interface for the training drivers;
- on-device generation (`random_batches_on_device`) for benchmarking the pure
  compute path without host-transfer noise.
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from deep_quantized_recommendation_model_dqrm_tpu.config import DLRMConfig
from deep_quantized_recommendation_model_dqrm_tpu.models.dlrm import Batch


def random_batch(
    config: DLRMConfig,
    batch_size: int,
    rng: np.random.RandomState,
    num_indices_per_lookup: Optional[int] = None,
    variable_pooling: bool = False,
    rand_data_dist: str = "uniform",
    rand_data_min: float = 0.0,
    rand_data_max: float = 1.0,
    rand_data_mu: float = -1.0,
    rand_data_sigma: float = 1.0,
    round_targets: bool = True,
) -> Batch:
    """One synthetic batch with static [T, B, P] index layout.

    Reference generator (dlrm_data_pytorch.py:1086-1158): dense ~ U(0,1);
    indices ~ U(0, rows_k) per table, or — `rand_data_dist="gaussian"` —
    N(mu, sigma) clipped to [rand_data_min, rand_data_max] (mu=-1 means
    (min+max)/2), modelling hot-index skew; pooling size drawn per lookup
    when `variable_pooling` (masked here instead of offset-encoded). Each
    bag is DEDUPED like the reference's np.unique
    (dlrm_data_pytorch.py:1140-1148) — duplicate draws get mask 0, so the
    effective bag is the unique set of the drawn indices. Targets: U(0,1)
    rounded to
    {0,1} when `round_targets` (= Bernoulli(0.5)), else left continuous
    (generate_random_output_batch, dlrm_data_pytorch.py:1036-1045 — the
    reference's default, only meaningful with the mse loss).
    """
    T = config.num_tables
    P = num_indices_per_lookup or config.pooling_size
    dense = rng.uniform(0.0, 1.0, size=(batch_size, config.num_dense)).astype(np.float32)
    if rand_data_dist == "gaussian":
        mu = (rand_data_max + rand_data_min) / 2.0 if rand_data_mu == -1 else rand_data_mu
        # the reference np.unique's the clipped FLOATS before the int cast
        # (generate_dist_input_batch, dlrm_data_pytorch.py:1135-1139), so two
        # distinct floats that truncate to the same integer index legally
        # survive as a duplicated row in the bag — dedupe_keys keeps the
        # float identity so our mask-based dedupe matches that exactly
        raw = [
            np.clip(
                rng.normal(mu, rand_data_sigma, size=(batch_size, P)),
                rand_data_min,
                rand_data_max,
            )
            for _ in config.table_sizes
        ]
        indices = np.stack(
            [
                np.clip(r, 0, rows - 1).astype(np.int32)
                for r, rows in zip(raw, config.table_sizes)
            ]
        )
        dedupe_keys = np.stack(raw)
    else:
        indices = np.stack(
            [
                rng.randint(0, rows, size=(batch_size, P)).astype(np.int32)
                for rows in config.table_sizes
            ]
        )
        dedupe_keys = indices
    if round_targets:
        labels = rng.randint(0, 2, size=(batch_size,)).astype(np.float32)
    else:
        labels = rng.rand(batch_size).astype(np.float32)
    mask = None
    if P > 1:
        if variable_pooling:
            lengths = rng.randint(1, P + 1, size=(T, batch_size))
            kept = np.arange(P)[None, None, :] < lengths[:, :, None]  # [T,B,P]
        else:
            kept = np.ones((T, batch_size, P), bool)
        # dedupe within each bag (the reference np.unique's every bag,
        # dlrm_data_pytorch.py:1140-1148): zero the mask of any draw that
        # already appeared earlier among the kept positions (float identity
        # for gaussian — see dedupe_keys above)
        eq = dedupe_keys[:, :, :, None] == dedupe_keys[:, :, None, :]  # [T,B,P,P]
        lower = np.tril(np.ones((P, P), bool), -1)  # j < i
        dup = np.any(eq & lower[None, None] & kept[:, :, None, :], axis=-1)
        mask = (kept & ~dup).astype(np.float32)
    return Batch(
        dense=jnp.asarray(dense),
        indices=jnp.asarray(indices),
        labels=jnp.asarray(labels),
        mask=jnp.asarray(mask) if mask is not None else None,
    )


class RandomBatchLoader:
    """Iterable of synthetic batches (the reference's random-data DataLoader,
    dlrm_data_pytorch.py:897-968)."""

    def __init__(
        self,
        config: DLRMConfig,
        batch_size: int,
        num_batches: int,
        seed: int = 123,
        variable_pooling: bool = False,
        **gen_kwargs,
    ):
        """`gen_kwargs` forward to `random_batch` (rand_data_dist /
        rand_data_min/max/mu/sigma / round_targets)."""
        self.config = config
        self.batch_size = batch_size
        self.num_batches = num_batches
        self.seed = seed
        self.variable_pooling = variable_pooling
        self.gen_kwargs = gen_kwargs

    def __len__(self) -> int:
        return self.num_batches

    def __iter__(self) -> Iterator[Batch]:
        rng = np.random.RandomState(self.seed)
        for _ in range(self.num_batches):
            yield random_batch(
                self.config,
                self.batch_size,
                rng,
                variable_pooling=self.variable_pooling,
                **self.gen_kwargs,
            )


def trace_generate_indices(
    rows: int,
    num_lookups: int,
    rng: np.random.RandomState,
    locality: float = 0.8,
    alpha: float = 1.2,
    stack_size: int = 1024,
) -> np.ndarray:
    """Synthetic index trace with temporal locality (LRU stack-distance
    model) — the reference's trace-driven generator (`trace_generate_lru`,
    dlrm_data_pytorch.py:1235-1320): with probability `locality` the next
    index is drawn from the LRU stack at a power-law stack distance (hot rows
    recur), otherwise a fresh uniform index is pulled and pushed. Vectorized
    over a bounded stack instead of the reference's per-access Python list.
    """
    stack_size = min(stack_size, rows)
    stack = rng.choice(rows, size=stack_size, replace=False).astype(np.int64)
    out = np.empty(num_lookups, np.int64)
    reuse = rng.rand(num_lookups) < locality
    # power-law stack distances in [0, stack_size)
    dist = np.floor(
        stack_size * (rng.rand(num_lookups) ** alpha)
    ).astype(np.int64)
    fresh = rng.randint(0, rows, size=num_lookups)
    for i in range(num_lookups):
        if reuse[i]:
            d = dist[i]
            idx = stack[d]
            # move to front
            stack[1 : d + 1] = stack[:d]
            stack[0] = idx
        else:
            idx = fresh[i]
            stack[1:] = stack[:-1]
            stack[0] = idx
        out[i] = idx
    return out


class TraceSyntheticLoader:
    """Batches whose sparse indices follow the LRU-locality trace model —
    for cache/hotness studies (discovering_rowise_hotness analogue) and
    realistic-skew benchmarking."""

    def __init__(
        self,
        config: DLRMConfig,
        batch_size: int,
        num_batches: int,
        seed: int = 0,
        locality: float = 0.8,
    ):
        self.config = config
        self.batch_size = batch_size
        self.num_batches = num_batches
        self.seed = seed
        self.locality = locality

    def __len__(self):
        return self.num_batches

    def __iter__(self) -> Iterator[Batch]:
        cfg = self.config
        rng = np.random.RandomState(self.seed)
        P = cfg.pooling_size
        traces = [
            trace_generate_indices(
                n, self.num_batches * self.batch_size * P, rng, self.locality
            )
            for n in cfg.table_sizes
        ]
        for bi in range(self.num_batches):
            lo = bi * self.batch_size * P
            hi = lo + self.batch_size * P
            idx = np.stack(
                [t[lo:hi].reshape(self.batch_size, P).astype(np.int32) for t in traces]
            )
            dense = rng.uniform(0, 1, size=(self.batch_size, cfg.num_dense)).astype(
                np.float32
            )
            labels = rng.randint(0, 2, size=self.batch_size).astype(np.float32)
            yield Batch(
                dense=jnp.asarray(dense),
                indices=jnp.asarray(idx),
                labels=jnp.asarray(labels),
                mask=None,
            )


class LearnableSyntheticLoader:
    """Synthetic CTR data WITH signal: labels come from a hidden ground-truth
    factorization model, so a correctly-implemented DLRM can reach high AUC.

    The reference's random generator (uniform labels) can only validate that
    the loss reaches log(2); this loader is the accuracy gate's stand-in when
    the Criteo files aren't available: hidden per-table embeddings u_k[idx]
    and a dense weight vector produce
        logit = sum_k <u_k[i_k], v> + w . x + noise,
    click = sigmoid(logit) > U(0,1). AUC of the true model ~0.8+.
    """

    def __init__(
        self,
        config: DLRMConfig,
        batch_size: int,
        num_batches: int,
        seed: int = 0,
        noise: float = 0.5,
        hidden_dim: int = 8,
        model_seed: int = 777,
    ):
        self.config = config
        self.batch_size = batch_size
        self.num_batches = num_batches
        self.seed = seed
        self.noise = noise
        # `model_seed` fixes the hidden ground-truth model independently of
        # the batch stream seed, so train/test loaders share one concept.
        rng = np.random.RandomState(model_seed)
        self._emb = [
            rng.normal(0, 1.0, size=(n, hidden_dim)).astype(np.float32)
            for n in config.table_sizes
        ]
        self._v = rng.normal(0, 1.0 / np.sqrt(hidden_dim), size=hidden_dim).astype(
            np.float32
        )
        self._w = rng.normal(0, 1.0, size=config.num_dense).astype(np.float32)

    def __len__(self):
        return self.num_batches

    def _make(self, rng: np.random.RandomState) -> Batch:
        cfg = self.config
        B, P = self.batch_size, cfg.pooling_size
        dense = rng.uniform(0, 1, size=(B, cfg.num_dense)).astype(np.float32)
        idx = np.stack(
            [rng.randint(0, n, size=(B, P)).astype(np.int32) for n in cfg.table_sizes]
        )
        logit = dense @ self._w
        for k in range(cfg.num_tables):
            logit = logit + (self._emb[k][idx[k]].sum(axis=1) @ self._v)
        logit = (logit - logit.mean()) / (logit.std() + 1e-6) * 2.0
        p = 1.0 / (1.0 + np.exp(-logit + self.noise * rng.normal(size=B)))
        labels = (rng.uniform(size=B) < p).astype(np.float32)
        return Batch(
            dense=jnp.asarray(dense),
            indices=jnp.asarray(idx),
            labels=jnp.asarray(labels),
            mask=None,
        )

    def __iter__(self) -> Iterator[Batch]:
        rng = np.random.RandomState(self.seed)
        for _ in range(self.num_batches):
            yield self._make(rng)


def random_batches_on_device(
    config: DLRMConfig, batch_size: int, key: jax.Array
) -> Batch:
    """Generate one batch entirely on device (for benchmarks; jit-safe)."""
    kd, ki, kl = jax.random.split(key, 3)
    dense = jax.random.uniform(kd, (batch_size, config.num_dense), jnp.float32)
    P = config.pooling_size
    keys = jax.random.split(ki, config.num_tables)
    indices = jnp.stack(
        [
            jax.random.randint(k, (batch_size, P), 0, rows, jnp.int32)
            for k, rows in zip(keys, config.table_sizes)
        ]
    )
    labels = jax.random.bernoulli(kl, 0.5, (batch_size,)).astype(jnp.float32)
    return Batch(dense=dense, indices=indices, labels=labels, mask=None)
