"""Tracing and per-stage timing.

The reference scatters wall-clock prints through its hot paths
(mapping.py:1125, transform.py:335, astrometry.py:264 — SURVEY.md section
5). Here timing is structured: a :class:`StageTimer` collects named stage
durations, :func:`device_trace` wraps jax.profiler for TensorBoard-readable
device traces, and :func:`benchmark` measures jitted callables with proper
synchronisation.
"""

import contextlib
import time
from collections import defaultdict


class _StageHandle:
    def __init__(self, enabled):
        self.enabled = enabled

    def sync(self, out):
        """Force completion of ``out`` via a one-element host fetch (the
        only sync that blocks on the axon remote runtime)."""
        if not self.enabled:
            return out
        import numpy as np

        import jax

        leaves = jax.tree_util.tree_leaves(out)
        if leaves:
            np.asarray(leaves[0]).ravel()[:1]
        return out


class StageTimer:
    """Collects named wall-clock stage timings.

    Usage::

        timer = StageTimer()
        with timer("georef"):
            out = georeference(...)
        print(timer.report())
    """

    def __init__(self, sync=True):
        self.times = defaultdict(list)
        self.sync = sync

    @contextlib.contextmanager
    def __call__(self, name):
        """Time a stage. For async backends, pass the stage's OUTPUT to
        the yielded handle so the timer can synchronize on it::

            with timer("georef") as stage:
                out = georeference(...)
                stage.sync(out)

        Without a sync target the stage measures DISPATCH time on async
        backends — and on the axon remote TPU even jax.block_until_ready
        does not block (see CLAUDE.md); ``sync()`` does a one-element host
        fetch, the only reliable barrier there."""
        handle = _StageHandle(self.sync)
        t0 = time.perf_counter()
        try:
            yield handle
        finally:
            self.times[name].append(time.perf_counter() - t0)

    def total(self, name):
        return sum(self.times[name])

    def report(self):
        lines = []
        for name, ts in self.times.items():
            total = sum(ts)
            lines.append(
                f"{name}: {total*1e3:.2f} ms total, {len(ts)} calls, "
                f"{total/len(ts)*1e3:.2f} ms avg"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir):
    """Capture a device profile viewable in TensorBoard/XProf.

    TPU equivalent of the reference's cProfile harness
    (auromat/test/profiling.py:16-73).
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark(fn, *args, iters=10, warmup=2):
    """Median wall time of a (jitted) callable with device synchronisation.

    Synchronizes with a one-element HOST FETCH of the first output leaf:
    jax.block_until_ready does not block on axon remote-TPU buffers
    (CLAUDE.md), so a block_until_ready loop would time dispatch only.

    :returns: (median_seconds, all_times)
    """
    import numpy as np

    import jax

    def _fetch(out):
        leaves = jax.tree_util.tree_leaves(out)
        if leaves:
            np.asarray(leaves[0]).ravel()[:1]

    for _ in range(warmup):
        _fetch(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _fetch(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), times


def annotate(name):
    """Named-scope annotation visible in device traces."""
    import jax

    return jax.profiler.TraceAnnotation(name)
