"""Split the megastep cost: forward-only vs full train step (on chip).

A forward has no state->state dependency, so to chain-serialize it for the
honest slope timing we thread a scalar carry through the dense features
(`dense + 0*carry` — numerically inert, forces sequential execution).

Usage: python scripts/bench_step_split.py [B] [K]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import _fast_device_init  # noqa: E402

from deep_quantized_recommendation_model_dqrm_tpu.config import (  # noqa: E402
    QuantConfig,
    TrainConfig,
    kaggle_config,
)
from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import (  # noqa: E402
    random_batch,
)
from deep_quantized_recommendation_model_dqrm_tpu.models import dlrm  # noqa: E402
from deep_quantized_recommendation_model_dqrm_tpu.train_step import (  # noqa: E402
    TrainState,
    make_multi_train_step,
)


def slope(step, state, arg, k, n1=25, n2=75):
    def run(n, st):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            st, out = step(st, arg)
        float(out)
        return time.perf_counter() - t0, st

    state, out = step(state, arg)
    float(out)
    t1, state = run(n1, state)
    t2, state = run(n2, state)
    return (t2 - t1) / ((n2 - n1) * k) * 1e3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    cfg = kaggle_config(QuantConfig(enabled=True, embedding_bit=4,
                                    weight_bit=4, scale_update_period=200))
    rng = np.random.RandomState(0)
    batches = [jax.device_put(random_batch(cfg, B, rng)) for _ in range(K)]
    params = _fast_device_init(cfg)
    qstate = dlrm.update_emb_scales(cfg, params, dlrm.init_quant_state(cfg))

    @jax.jit
    def fwd_chain(carry, bs):
        for b in bs:
            b = b._replace(dense=b.dense + 0.0 * carry)
            logits, _ = dlrm.forward(cfg, params, b, qstate, train=True)
            carry = jnp.mean(logits)
        return carry, carry

    ms = slope(lambda c, bs: fwd_chain(c, bs), jnp.float32(0.0), batches, K)
    print(f"forward-only       : {ms:.4f} ms/it", flush=True)

    for up in (0, 20000):
        tc = TrainConfig(batch_size=B, learning_rate=0.1,
                         onehot_update_max_rows=up)
        step = make_multi_train_step(cfg, tc, K, sparse_emb_grad=True)
        state = TrainState(params=_fast_device_init(cfg), opt_state=None,
                           qstate=dlrm.init_quant_state(cfg))
        ms = slope(step, state, batches, K)
        print(f"full step (up={up:>5}): {ms:.4f} ms/it", flush=True)


if __name__ == "__main__":
    main()
