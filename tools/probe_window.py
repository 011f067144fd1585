"""End-to-end (WINDOW_ROWS x ROW_LANES) geometry sweep under the i8 apply.

The shipped W=32/RL=1024 optimum was settled in round 2 BEFORE the int8 MXU
dot (round 3) halved the per-MAC cost — the grid cell "wider window, fewer
visits, more (now cheaper) MACs" has never been measured under the current
apply. One (window, row_lanes) variant per process (ROW_LANES is baked into
the module and the jit caches at import; see ops/kernel_binning.py), driven
by the __main__ loop via subprocesses.

Usage:
  python tools/probe_window.py                 # sweep the default grid
  python tools/probe_window.py 32 1024 1e9 4   # one cell: W RL iters reps
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

GRID = [
    (32, 1024),  # round-2..4 shipped geometry
    (64, 1024),  # fewer visits, 2x MACs/visit — the untested i8 cell
    (16, 1024),
    (32, 2048),  # round-5 winner (552.8M vs 540.6M) — shipped default
    (64, 2048),
    (16, 2048),  # gradient neighbors of the winner: both fall away
    (32, 4096),  # (docs/KERNEL_NOTES.md round-5 table)
]


def run_cell(window: int, row_lanes: int, iters: int, reps: int) -> None:
    import jax

    from strange_attractor_tpu import presets, render
    from strange_attractor_tpu.config import BrightnessConstants, Colors
    from strange_attractor_tpu.render import plan_schedule, precompile
    from strange_attractor_tpu.utils.profiling import enable_compilation_cache

    import strange_attractor_tpu.ops.kernel_binning as kb

    assert kb.ROW_LANES == row_lanes, (kb.ROW_LANES, row_lanes)
    enable_compilation_cache()
    cfg = presets.poisson_saturne(
        iterations=iters, width=1920, height=1080,
        colors=Colors(brightness=BrightnessConstants(offset=-0.25)),
        seed=0, silent=True, kernel_window=window,
    )
    lanes, chunk, nchunks = plan_schedule(cfg)
    executed = lanes * chunk * nchunks
    t0 = time.perf_counter()
    state = precompile(cfg)
    float(state.count.sum())
    compile_s = time.perf_counter() - t0
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        st = render(cfg, key=jax.random.PRNGKey(0))
        float(st.count.sum())
        rates.append(executed / (time.perf_counter() - t0))
    print(json.dumps({
        "window": window, "row_lanes": row_lanes, "iters": executed,
        "best_rate": round(max(rates), 1),
        "rates": [round(r, 1) for r in rates],
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }), flush=True)


def main() -> None:
    if len(sys.argv) > 1:
        w, rl = int(sys.argv[1]), int(sys.argv[2])
        iters = int(float(sys.argv[3])) if len(sys.argv) > 3 else int(1e9)
        reps = int(sys.argv[4]) if len(sys.argv) > 4 else 4
        run_cell(w, rl, iters, reps)
        return
    # driver mode: one subprocess per cell (serial — never two TPU compiles
    # at once on the shared remote compile service)
    iters = os.environ.get("PROBE_ITERS", "1e9")
    reps = os.environ.get("PROBE_REPS", "4")
    for w, rl in GRID:
        env = dict(os.environ, SAR_ROW_LANES=str(rl))
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(w), str(rl),
             iters, reps],
            env=env, cwd=ROOT, check=False,
        )


if __name__ == "__main__":
    main()
