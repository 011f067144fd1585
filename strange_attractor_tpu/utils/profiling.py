"""Profiling & observability helpers.

The reference's observability story is a handful of ``println!`` calls gated
by ``Config::silent`` (SURVEY.md §5). Here, in addition to those prints, a
render can be wrapped in :class:`RenderProfile` for phase timings and an
iterations/sec/chip figure (the BASELINE metric), and ``trace()`` captures a
``jax.profiler`` trace for xprof/tensorboard.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class RenderProfile:
    """Collects phase wall-times and derived rates for one render.

    Usage::

        prof = RenderProfile(iterations=executed)
        with prof.phase("render"):
            state = render(config, ...)
            sync(state)
        with prof.phase("colorize"):
            image = fetch(colorize(config, state))
        print(prof.summary())
    """

    iterations: int = 0
    phases: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + time.perf_counter() - t0

    @property
    def total_seconds(self) -> float:
        return sum(self.phases.values())

    @property
    def iters_per_sec(self) -> Optional[float]:
        t = self.phases.get("render", self.total_seconds)
        if not self.iterations or t <= 0:
            return None
        return self.iterations / t

    def summary(self) -> str:
        parts = [f"{k}={v:.3f}s" for k, v in self.phases.items()]
        rate = self.iters_per_sec
        if rate is not None:
            parts.append(f"rate={rate:.3e} iters/s/chip")
        return " ".join(parts)


def force_cpu_if_requested() -> bool:
    """Honor an explicit CPU platform request BEFORE any backend touch.

    ``JAX_PLATFORMS=cpu`` / ``JAX_PLATFORM_NAME=cpu`` only win the platform
    *choice* after jax initializes every registered plugin — and the
    tunneled TPU plugin's init hangs indefinitely during a tunnel outage
    (measured round 3). Forcing through ``jax.config`` skips the TPU plugin
    entirely. Must run before the first ``jax.devices()`` /
    ``default_backend()`` call; returns True when CPU was forced.
    """
    import os

    if "cpu" not in (os.environ.get("JAX_PLATFORMS", ""),
                     os.environ.get("JAX_PLATFORM_NAME", "")):
        return False
    import jax

    jax.config.update("jax_platforms", "cpu")
    return True


def enable_compilation_cache(path: Optional[str] = None) -> None:
    """Point JAX at a persistent on-disk compilation cache.

    First TPU compiles go through a remote compile service and take tens of
    seconds to minutes (docs/KERNEL_NOTES.md); with this enabled a second
    cold process start skips them entirely. Called by the CLI, bench.py and
    doctor; safe to call repeatedly.
    """
    import os

    import jax

    path = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.expanduser("~/.cache/strange_attractor_tpu/xla")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except (OSError, AttributeError):  # pragma: no cover - RO filesystems etc.
        pass


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with xprof/tensorboard)."""
    import jax

    with jax.profiler.trace(log_dir):
        yield


def hard_sync(x) -> None:
    """Block until ``x`` is computed.

    ``jax.block_until_ready`` can return early on tunneled dev platforms;
    fetching one scalar to the host cannot.
    """
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    jax.device_get(leaf.ravel()[0])
