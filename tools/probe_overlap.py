"""Measure the frame-delivery tail: plain colorize+fetch vs the banded
overlapped pipeline (render.colorize_convert_fetch).

The plain tail serializes the ~55 ms 1080p colorize+convert before the
multi-MB tunnel fetch; the banded pipeline overlaps each band's transfer
with the next band's compute, at the cost of one stats dispatch plus one
dispatch per band (~4 ms each on the tunnel). This probe settles whether
the overlap nets out, and at which band count.

    python tools/probe_overlap.py [iters] [reps]

Prints one JSON line per variant (best-of-reps). Run on the real TPU; on
CPU transfers are host-local and the sweep is meaningless.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    iters = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10**8
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from strange_attractor_tpu.utils.profiling import force_cpu_if_requested, hard_sync

    force_cpu_if_requested()

    import jax

    from strange_attractor_tpu import colorize, presets, render
    from strange_attractor_tpu.config import BrightnessConstants, Colors
    from strange_attractor_tpu.render import colorize_convert_fetch
    from strange_attractor_tpu.utils.export import convert_format_device, fetch_image

    cfg = presets.poisson_saturne(
        iterations=iters,
        colors=Colors(brightness=BrightnessConstants(offset=-0.25)),
        seed=0,
        silent=True,
    )
    st = render(cfg, key=jax.random.PRNGKey(0))
    hard_sync(st.count)

    @jax.jit
    def colorize8(state):
        return convert_format_device(colorize(cfg, state), False, True)

    # warm every program the sweep will time (each band count is its own
    # compiled program — an unwarmed one would pay the remote compile inside
    # the timed region), and pin each banded output byte-identical to the
    # plain path before timing anything
    sweep = (2, 3, 4, 6, 8)
    plain = fetch_image(colorize8(st))
    for bands in sweep:
        got = colorize_convert_fetch(cfg, st, transparent=False, eight_bit=True,
                                     bands=bands)
        np.testing.assert_array_equal(got, plain)

    def best(fn):
        t = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            assert out.shape == (1080, 1920, 3)
            t = dt if t is None else min(t, dt)
        return t

    rows = [("plain colorize8+fetch", lambda: fetch_image(colorize8(st)))]
    rows += [
        (f"banded bands={b}",
         lambda b=b: colorize_convert_fetch(cfg, st, transparent=False,
                                            eight_bit=True, bands=b))
        for b in sweep
    ]
    for name, fn in rows:
        print(json.dumps({"variant": name, "best_s": round(best(fn), 4),
                          "reps": reps}), flush=True)


if __name__ == "__main__":
    main()
