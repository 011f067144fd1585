"""End-to-end flagship-workload rate for EXACT16_KERNEL on the real chip.

    python tools/bench_exact16.py [iters] [earliest|value]

Runs the full render() path (map + sort + apply + merge) with the chosen
bucket-tie discipline via ``Config.exact16_ties`` (the same switch the CLI's
``--exact16-ties`` flag sets). Prints one JSON row like
tools/bench_strategies.py. Used for the round-3 EXACT16 design decision
(docs/KERNEL_NOTES.md).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import jax

    from strange_attractor_tpu.config import BinStrategy, BrightnessConstants, Colors
    from strange_attractor_tpu.models import presets
    from strange_attractor_tpu.render import plan_schedule, precompile, render
    from strange_attractor_tpu.utils.profiling import enable_compilation_cache, hard_sync

    enable_compilation_cache()
    iters = int(float(sys.argv[1])) if len(sys.argv) > 1 else int(1e9)
    ties = sys.argv[2] if len(sys.argv) > 2 else "earliest"
    if ties == "earliest":
        # same switch the CLI flips: the earliest discipline rides the
        # packed u64 sort key when 64-bit types are on (kernel_binning.py)
        jax.config.update("jax_enable_x64", True)

    cfg = presets.poisson_saturne(
        iterations=iters, width=1920, height=1080,
        colors=Colors(brightness=BrightnessConstants(offset=-0.25)),
        seed=0, silent=True, bin_strategy=BinStrategy.EXACT16_KERNEL,
        exact16_ties=ties,
    )
    lanes, chunk, nchunks = plan_schedule(cfg)
    executed = lanes * chunk * nchunks
    precompile(cfg)
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        state = render(cfg, key=jax.random.PRNGKey(0))
        hard_sync(state)
        best = max(best, executed / (time.perf_counter() - t0))
    print(json.dumps({
        "strategy": "exact16-kernel", "ties": ties,
        "iters_per_sec": round(best, 1), "iterations": executed,
        "wall_s_1e9": round(1e9 / best, 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
