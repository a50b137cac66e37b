"""Learning-rate policy: linear warmup -> hold -> quadratic decay -> freeze.

Exact functional port of `LRPolicyScheduler` (dlrm_s_pytorch.py:160-194),
expressed as a pure function of the step count so it lives inside jit. The
reference steps the scheduler once per iteration starting at _step_count=1;
pass `step` as the 1-based iteration count for identical values.
"""

from __future__ import annotations

import jax.numpy as jnp


def lr_policy(
    base_lr: float,
    step,
    num_warmup_steps: int,
    decay_start_step: int,
    num_decay_steps: int,
):
    """Return the LR for `step` (int or traced int32).

    - step < warmup:            base_lr * (1 - (warmup - step)/warmup)
    - decay_start <= step < decay_end:
                                max(1e-7, base_lr * ((decay - d)/decay)^2)
    - step >= decay_end:        frozen at the final decay value
    - between warmup and decay (num_decay_steps > 0): the reference holds
      `last_lr` from the FINAL warmup step, i.e. base_lr*(1 - 1/warmup) —
      it never reaches base_lr. Reproduced exactly when warmup > 0. (With
      warmup == 0 the reference would read an unset `last_lr` and crash;
      we hold base_lr there — documented deviation, PARITY.md.)
    - num_decay_steps == 0:     base_lr after warmup (no adjustment)
    """
    step = jnp.asarray(step, jnp.float32)
    warm = float(max(num_warmup_steps, 0))
    ds = float(decay_start_step)
    nd = float(num_decay_steps)

    warm_lr = base_lr * (1.0 - (warm - step) / warm) if warm > 0 else base_lr

    if nd > 0:
        # Freeze at the last in-decay value (step = decay_end - 1), matching
        # the reference's `last_lr` hold after decay ends.
        decayed = jnp.clip(step - ds, 0.0, nd - 1.0)
        decay_scale = ((nd - decayed) / nd) ** 2
        decay_lr = jnp.maximum(1e-7, base_lr * decay_scale)
        hold_lr = base_lr * (1.0 - 1.0 / warm) if warm > 0 else base_lr
        after = jnp.where(step < ds, hold_lr, decay_lr)
    else:
        after = jnp.asarray(base_lr, jnp.float32)

    if warm > 0:
        return jnp.where(step < warm, warm_lr, after)
    return after
