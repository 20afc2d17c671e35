"""Profiling and observability.

The reference's only instrumentation is a per-frame console log
(``program-raymarch.ts:323``) and a triangle-test counter that is never read
out (``intersection-logic.wgsl:18``). Here rays/sec is a first-class counter
(the integrator reports real live-lane ray counts — ops.integrator), plus:

- ``timed``: wall-clock block timer with ``block_until_ready`` semantics;
- ``trace``: context manager around ``jax.profiler`` for device traces
  viewable in TensorBoard/XProf;
- ``RenderStats``: rays/paths/iterations throughput record.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time


@dataclasses.dataclass
class RenderStats:
    wall_s: float
    rays: float
    paths: float
    iterations: int = 0

    @property
    def rays_per_sec(self) -> float:
        return self.rays / self.wall_s if self.wall_s > 0 else 0.0

    @property
    def paths_per_sec(self) -> float:
        return self.paths / self.wall_s if self.wall_s > 0 else 0.0

    def __str__(self) -> str:
        return (
            f"{self.rays_per_sec / 1e6:.2f} Mrays/s "
            f"({self.paths_per_sec / 1e6:.2f} Mpaths/s, "
            f"{self.wall_s:.3f}s wall, {self.iterations} iters)"
        )


@contextlib.contextmanager
def timed(result: dict, key: str = "wall_s"):
    """Time a block, blocking on any jax.Array placed in result['block_on']."""
    import jax

    t0 = time.perf_counter()
    yield result
    if "block_on" in result:
        jax.block_until_ready(result.pop("block_on"))
    result[key] = time.perf_counter() - t0


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace (jax.profiler) around the block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
