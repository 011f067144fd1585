"""Measure the BinStrategy ladder on the current device.

Renders the reference workload (poisson-saturne, 1920x1080, brightness
-0.25 — README.md:72-73) once per strategy and prints one JSON line per
row, best-of-2 runs. This is the reproducible source of BASELINE.md's
"Strategy ladder" table.

    python tools/bench_strategies.py [iterations]

On TPU the default budget is 1e9 for the kernel strategies and 2e8 for the
XLA scatter fallbacks (which run ~7-16x slower); elsewhere a token budget
keeps it test-scale.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import jax

    from strange_attractor_tpu.config import (
        BinStrategy,
        BrightnessConstants,
        Colors,
        RenderKind,
    )
    from strange_attractor_tpu.models import presets
    from strange_attractor_tpu.render import plan_schedule, precompile, render
    from strange_attractor_tpu.utils.profiling import (
        enable_compilation_cache, force_cpu_if_requested, hard_sync,
    )

    force_cpu_if_requested()
    enable_compilation_cache()
    on_tpu = jax.default_backend() == "tpu"
    if len(sys.argv) > 1:
        fast_budget = slow_budget = int(float(sys.argv[1]))
    elif on_tpu:
        fast_budget, slow_budget = int(1e9), int(2e8)
    else:
        fast_budget = slow_budget = int(2e6)

    rows = [
        (BinStrategy.KERNEL, RenderKind.GAS, fast_budget),
        (BinStrategy.DEPTH_KERNEL, RenderKind.DEPTH, fast_budget),
        (BinStrategy.EXACT_KERNEL, RenderKind.GAS, fast_budget),
        (BinStrategy.EXACT16_KERNEL, RenderKind.GAS, fast_budget),
        (BinStrategy.DEPTH, RenderKind.DEPTH, slow_budget),
        (BinStrategy.PACKED, RenderKind.GAS, slow_budget),
        (BinStrategy.EXACT, RenderKind.GAS, slow_budget),
    ]
    def measure(cfg, **extra):
        lanes, chunk, nchunks = plan_schedule(cfg)
        executed = lanes * chunk * nchunks
        precompile(cfg)
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            state = render(cfg, key=jax.random.PRNGKey(0))
            hard_sync(state)
            best = max(best, executed / (time.perf_counter() - t0))
        print(
            json.dumps(
                {
                    **extra,
                    "iters_per_sec": round(best, 1),
                    "iterations": executed,
                    "frame_1e9_s": round(1e9 / best, 2),
                }
            ),
            flush=True,
        )

    for strategy, kind, budget in rows:
        measure(
            presets.poisson_saturne(
                iterations=budget,
                width=1920,
                height=1080,
                colors=Colors(brightness=BrightnessConstants(offset=-0.25)),
                render=kind,
                seed=0,
                silent=True,
                bin_strategy=strategy,
            ),
            strategy=strategy.value,
        )

    # reference workload 2 (README.md:74-75): solar-sail 1e9 @ 1800x2000,
    # brightness -0.1 — the larger canvas picks up the auto 64-row window
    measure(
        presets.solar_sail(
            iterations=fast_budget,
            width=1800,
            height=2000,
            colors=Colors(brightness=BrightnessConstants(offset=-0.1)),
            seed=0,
            silent=True,
            # pin explicitly: AUTO resolves to EXACT off-TPU, which would
            # mislabel a CPU token run's row as 'kernel'
            bin_strategy=BinStrategy.KERNEL,
        ),
        strategy="kernel",
        workload="solar-sail 1e9 1800x2000 b-0.1 (reference workload 2)",
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
