"""Profiling / tracing utilities.

Parity surface: the reference's manual wall-clock phase accumulators
printed every 100 iterations (`CW/Perturb.py:89-92,160-173`,
`ShapeAttack/HiT_ADV.py:150-153,248-260`) — provided here as
`PhaseTimer`. The TPU-native upgrades (SURVEY.md §5): `trace` wraps
``jax.profiler`` for real XLA traces, and `annotate` emits named
TraceAnnotations so attack phases show up in the profile timeline
instead of host-side timers.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


class PhaseTimer:
    """Accumulate wall-clock per named phase; print/reset like the
    reference's forward/backward/update/clip counters."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self._start: Optional[float] = None

    @contextlib.contextmanager
    def phase(self, name: str, sync: bool = False):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync:
                # force completion so the phase really finished
                jax.effects_barrier()
            self.totals[name] += time.perf_counter() - t0

    def summary(self) -> str:
        total = sum(self.totals.values())
        parts = ", ".join(f"{k}: {v:.2f}" for k, v in self.totals.items())
        return f"total time: {total:.2f}, {parts}"

    def reset(self) -> None:
        self.totals.clear()


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that appears on the device timeline."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def device_timer():
    """Measure on-device time of a block by syncing before/after.

    Yields a dict whose 'ms' key is filled on exit.
    """
    out: Dict[str, float] = {}
    jax.effects_barrier()
    t0 = time.perf_counter()
    try:
        yield out
    finally:
        jax.effects_barrier()
        out["ms"] = (time.perf_counter() - t0) * 1e3


def enable_compile_cache(min_secs: int = 5) -> None:
    """Persistent XLA compilation cache (repo-local ``.jax_cache``).

    The scanned attack programs take minutes to compile through the
    remote-compile tunnel; caching makes repeat runs of the bench /
    verify / probe scripts start in seconds. Safe to call anywhere
    (silently a no-op on jax versions without the config knobs).

    NO-OP when the configured platform is CPU: reloading an XLA:CPU
    AOT cache entry is broken for multi-device collective programs —
    the deserialized executable's collective thunks miss their
    rendezvous (2/8 threads arrive at the all-gather) and XLA
    ``abort()``\\ s the process after the 40 s termination timeout
    ("Exiting to ensure a consistent program state"). Reproduced
    deterministically on jaxlib's 8-virtual-device CPU mesh with the
    sharded fused-DGCNN attack: first process (cache write) passes,
    every later process (cache read) dies with SIGABRT. The cache
    exists to amortize remote-TPU compiles; CPU compiles take seconds,
    so caching them is pure risk."""
    import os

    platform = (jax.config.jax_platforms
                or os.environ.get("JAX_PLATFORMS", "")
                ).split(",")[0].strip().lower()
    if not platform:
        # No explicit platform anywhere: resolve the default backend
        # (initializes it — the caller is about to use jax anyway).
        # Fail CLOSED on error: an unknown platform must not re-enable
        # the CPU abort above.
        try:
            platform = jax.default_backend()
        except Exception:
            platform = "cpu"
    if platform == "cpu":
        return

    cache_dir = os.environ.get("HITADV_COMPILE_CACHE")
    if cache_dir is None and os.environ.get("HITADV_CACHE_DIR"):
        # the eval CLI's historical cache-root knob (still used for the
        # AE fit cache) keeps steering the compile cache too
        cache_dir = os.path.join(os.environ["HITADV_CACHE_DIR"],
                                 "jax_compile")
    if cache_dir is None:
        cache_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_secs)
    except Exception:
        pass
