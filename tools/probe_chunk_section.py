"""Flagship (chunk buffer x sort section) re-sweep under RL=2048 (round 5).

The 4M-point chunk buffer and the section = chunk/8 = 2^19 rule were both
settled in round 2 at ROW_LANES=1024. RL=2048 (round 5) halves the apply's
row-loop trip count and deepens the dot contraction, which could move the
optimum toward bigger chunks (fewer scan steps / dispatches) the same way
it moved the row width. This sweeps the neighborhood end-to-end: full
flagship render at 1e9, best-of-N per cell, one JSON line per cell.

Usage: python tools/probe_chunk_section.py [iters=1e9] [reps=3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (chunk_steps at 32768 lanes, kernel_section): chunk points = steps * 32768
GRID = [
    (128, 1 << 19),  # shipped: 4M-point chunks, 8 sections/chunk
    (256, 1 << 19),  # 8M chunks, 16 sections: fewer dispatches, same sort
    (256, 1 << 20),  # 8M chunks, chunk/8 rule: tests the 2^19 sort cliff
    (64, 1 << 19),   # 2M chunks, 4 sections: the downward gradient
]


def main() -> None:
    import jax

    from strange_attractor_tpu import presets, render
    from strange_attractor_tpu.config import BrightnessConstants, Colors
    from strange_attractor_tpu.render import plan_schedule
    from strange_attractor_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    iters = int(float(sys.argv[1])) if len(sys.argv) > 1 else int(1e9)
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    for chunk_steps, section in GRID:
        cfg = presets.poisson_saturne(
            iterations=iters,
            colors=Colors(brightness=BrightnessConstants(offset=-0.25)),
            seed=0, silent=True,
            chunk_steps=chunk_steps, kernel_section=section,
        )
        lanes, steps, nchunks = plan_schedule(cfg)
        executed = lanes * steps * nchunks
        st = render(cfg, key=jax.random.PRNGKey(0))  # warm/compile
        float(st.count.sum())
        rates, walls = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            st = render(cfg, key=jax.random.PRNGKey(0))
            float(st.count.sum())
            dt = time.perf_counter() - t0
            rates.append(round(executed / dt / 1e6, 1))
            walls.append(round(dt, 3))
        print(json.dumps({
            "chunk_steps": steps, "lanes": lanes, "nchunks": nchunks,
            "section_log2": section.bit_length() - 1,
            "chunk_points_M": round(lanes * steps / 1e6, 2),
            "executed": executed,
            "best_M": max(rates), "all_M": rates, "walls_s": walls,
        }), flush=True)


if __name__ == "__main__":
    main()
