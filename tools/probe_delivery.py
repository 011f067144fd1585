"""Band-count ladder for the banded delivery (colorize_convert_fetch).

probe_fetch.py showed the tunnel fetch pays a PER-TRANSFER overhead that
varies with link weather (slow windows: ~80 ms/transfer, which makes 4
bands SLOWER than one big fetch; good windows: small). This times the real
delivery pipeline — tone map + convert + u32-packed fetch of the flagship
deliverable from a standing accumulation — at several band counts, so the
default can be set from end-to-end data and re-checked per weather.

Usage: python tools/probe_delivery.py [iters=1e8] [reps=5]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    from strange_attractor_tpu import presets
    from strange_attractor_tpu.config import BrightnessConstants, Colors
    from strange_attractor_tpu.render import colorize_convert_fetch, render
    from strange_attractor_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    iters = int(float(sys.argv[1])) if len(sys.argv) > 1 else int(1e8)
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    cfg = presets.poisson_saturne(
        iterations=iters, width=1920, height=1080,
        colors=Colors(brightness=BrightnessConstants(offset=-0.25)),
        seed=0, silent=True,
    )
    state = render(cfg, key=jax.random.PRNGKey(0))
    float(state.count.sum())

    results = {"device": str(jax.devices()[0]), "iters": iters}
    ref = None
    for bands in (1, 2, 4, 8, 16):
        # warm the band programs outside the timed region
        img = colorize_convert_fetch(cfg, state, transparent=False,
                                     eight_bit=True, bands=bands)
        if ref is None:
            ref = img
        else:
            assert (img == ref).all(), f"bands={bands} diverged"
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            colorize_convert_fetch(cfg, state, transparent=False,
                                   eight_bit=True, bands=bands)
            times.append(time.perf_counter() - t0)
        times.sort()
        results[f"bands{bands}"] = {
            "best_s": round(times[0], 4),
            "med_s": round(times[len(times) // 2], 4),
            "all": [round(t, 4) for t in times],
        }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
