"""Profiling: step timing and XLA trace capture.

Replaces the reference's profiling stack (SURVEY §5): the legacy autograd
profiler + chrome-trace export (dlrm_s_pytorch.py:1501-1503, :1783-1795),
torch.profiler schedules (comm_grad_profile.py), `record_function` scopes,
and the `time_wrap`/ms-per-it printouts (dlrm_s_pytorch.py:114-117).

TPU equivalents:
- `trace(logdir)`: jax.profiler trace context -> Perfetto/TensorBoard trace
  (the chrome-trace analogue);
- `annotate(name)`: jax.profiler.TraceAnnotation — named scopes like
  record_function("DQRM bot mlp") that show up in the trace;
- `StepTimer`: wall-clock ms/it with correct async semantics (block on a
  representative output only at measurement boundaries — per-step syncs on
  tunneled TPUs cost 40ms+);
- `phase_stats`: mean/std accumulator matching
  `list_profiles_stats_and_clear` (quant_modules_not_quantize_grad.py:
  400-460).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Tuple

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope visible in profiler traces (record_function analogue)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """ms/it between measurement boundaries; call `lap(sync_on)` at
    print-freq boundaries with any device array from the last step."""

    def __init__(self) -> None:
        self._t0 = time.perf_counter()
        self._steps = 0

    def step(self) -> None:
        self._steps += 1

    def lap(self, sync_on=None) -> float:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        now = time.perf_counter()
        ms = (now - self._t0) / max(self._steps, 1) * 1e3
        self._t0 = now
        self._steps = 0
        return ms


class PhaseStats:
    """Accumulate per-phase wall times; report mean/std per phase
    (list_profiles_stats_and_clear semantics)."""

    def __init__(self) -> None:
        self._times: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._times[name].append(time.perf_counter() - t0)

    def stats_and_clear(self) -> Dict[str, Tuple[float, float]]:
        import numpy as np

        out = {}
        for name, ts in self._times.items():
            arr = np.asarray(ts)
            out[name] = (float(arr.mean()), float(arr.std()))
        self._times.clear()
        return out
