"""Phase-level timing instrumentation.

Port of the reference's evaluation/timing.py (TimingStats / Aggregated
TimingStats / TimingContext), with device timing via `block_until_ready`
instead of CUDA events. Phases follow the codec pipeline:
host_to_device / quantize / encode / decode / dequantize.
"""

from __future__ import annotations

import dataclasses
import time
from contextlib import contextmanager
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

PHASES = ("host_to_device", "quantize", "encode", "decode", "dequantize")


@dataclasses.dataclass
class TimingStats:
    """Per-phase wall-clock nanoseconds for one trial."""

    phase_ns: Dict[str, int] = dataclasses.field(
        default_factory=lambda: {p: 0 for p in PHASES}
    )
    values_processed: int = 0

    def add(self, phase: str, ns: int):
        self.phase_ns[phase] = self.phase_ns.get(phase, 0) + ns

    @property
    def total_ns(self) -> int:
        return sum(self.phase_ns.values())

    @property
    def total_ms(self) -> float:
        return self.total_ns / 1e6

    def phase_ms(self, phase: str) -> float:
        return self.phase_ns.get(phase, 0) / 1e6

    @property
    def transfer_overhead_pct(self) -> float:
        total = self.total_ns
        return 100.0 * self.phase_ns.get("host_to_device", 0) / total if total else 0.0

    @property
    def throughput_mvalues_sec(self) -> float:
        compute_ns = self.total_ns - self.phase_ns.get("host_to_device", 0)
        if compute_ns <= 0:
            return 0.0
        return self.values_processed / (compute_ns / 1e9) / 1e6


@dataclasses.dataclass
class AggregatedTimingStats:
    """Mean/std across trials per phase."""

    trials: List[TimingStats] = dataclasses.field(default_factory=list)

    def add(self, stats: TimingStats):
        self.trials.append(stats)

    def _vals(self, fn):
        return [fn(t) for t in self.trials]

    def mean_std(self, fn):
        vals = self._vals(fn)
        if not vals:
            return 0.0, 0.0
        m = sum(vals) / len(vals)
        if len(vals) > 1:
            s = (sum((v - m) ** 2 for v in vals) / (len(vals) - 1)) ** 0.5
        else:
            s = 0.0
        return m, s

    @property
    def total_ms_mean(self):
        return self.mean_std(lambda t: t.total_ms)[0]

    @property
    def total_ms_std(self):
        return self.mean_std(lambda t: t.total_ms)[1]

    @property
    def throughput_mean(self):
        return self.mean_std(lambda t: t.throughput_mvalues_sec)[0]

    @property
    def transfer_overhead_mean(self):
        return self.mean_std(lambda t: t.transfer_overhead_pct)[0]

    def phase_ms_mean(self, phase: str):
        return self.mean_std(lambda t: t.phase_ms(phase))[0]


class TimingContext:
    """Context manager attributing a block to a phase; synchronizes the
    device before and after so the interval is real device time."""

    def __init__(self, stats: TimingStats, phase: str, sync_value=None):
        self.stats = stats
        self.phase = phase
        self.sync_value = sync_value
        self._t0 = 0

    def __enter__(self):
        if self.sync_value is not None:
            jax.block_until_ready(self.sync_value)
        self._t0 = time.perf_counter_ns()
        return self

    def __exit__(self, *exc):
        self.stats.add(self.phase, time.perf_counter_ns() - self._t0)
        return False


@contextmanager
def device_timer():
    """Yields a dict whose 'ns' key holds the synchronized elapsed time."""
    out = {"ns": 0}
    t0 = time.perf_counter_ns()
    yield out
    out["ns"] = time.perf_counter_ns() - t0


def run_warmup(fn, *args, iterations: int = 3):
    """Compile + warm a jitted function (reference timing.py:242)."""
    result = None
    for _ in range(iterations):
        result = fn(*args)
    jax.block_until_ready(result)
    return result


def time_fn(fn, *args, iters: int = 10, warmup: int = 2):
    """Median wall time of a jitted fn with block_until_ready fencing.

    Caveat: on remote/tunneled runtimes block_until_ready can return before
    the device work drains; prefer time_fn_chained there."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def time_fn_chained(fn, x, *args, iters: int = 20, warmup: int = 3,
                    fetch_overhead_s: float = 0.025):
    """Mean wall time of `fn(x, *args)` with a true data-dependence chain.

    Each iteration's first input is combined with a zeroed scalar derived
    from the previous output, forcing sequential device execution even when
    block_until_ready is unreliable (remote runtimes enqueue asynchronously).
    One scalar host fetch at the end, subtracted as fetch_overhead_s."""

    def first_arr(o):
        while isinstance(o, (tuple, list)):
            o = o[0]
        return o

    @jax.jit
    def chain(prev_x, out_scalar):
        # zero the output scalar with an op valid for ITS dtype (an integer
        # input fn may return float output, and vice versa), then fold into
        # prev_x with an op valid for prev_x's dtype
        if jnp.issubdtype(out_scalar.dtype, jnp.floating):
            zero = (out_scalar * 0).astype(prev_x.dtype)
        else:
            zero = (out_scalar & 0).astype(prev_x.dtype)
        if jnp.issubdtype(prev_x.dtype, jnp.floating):
            return prev_x + zero
        return prev_x ^ zero

    r = x
    for _ in range(warmup):
        o = first_arr(fn(r, *args))
        r = chain(r, o.reshape(-1)[0])
    _ = np.asarray(r.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = first_arr(fn(r, *args))
        r = chain(r, o.reshape(-1)[0])
    _ = np.asarray(r.reshape(-1)[0])
    return max(time.perf_counter() - t0 - fetch_overhead_s, 1e-9) / iters
