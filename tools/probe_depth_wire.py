#!/usr/bin/env python
"""Measure + certify the DEPTH wire-channel delivery on the real chip.

DEPTH tone maps every pixel to (g, g, g, 65535), so every fetch path wires
ONE gray channel and the host replicates it (render._wire_channels /
_expand_wire — see docs/KERNEL_NOTES.md round 5 late). This probe renders a
flagship-view depth frame at 1080p, times warm cropped deliveries for the
16-bit and 8-bit opaque deliverables, and asserts each delivery is
bit-identical to the first (learn) call's full-channel frame.

Usage: python tools/probe_depth_wire.py [iterations]   (default 1e8)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from strange_attractor_tpu import presets
from strange_attractor_tpu.config import BinStrategy, RenderKind
from strange_attractor_tpu.render import colorize_convert_fetch, render
from strange_attractor_tpu.utils.profiling import hard_sync


def main() -> None:
    iters = int(float(sys.argv[1])) if len(sys.argv) > 1 else 100_000_000
    cfg = presets.poisson_saturne(
        iterations=iters, width=1920, height=1080, seed=3, silent=True,
        render=RenderKind.DEPTH, bin_strategy=BinStrategy.DEPTH_KERNEL,
    )
    st = render(cfg)
    hard_sync(st.zbuf)
    for label, tr, eb in (("16-bit opaque", False, False),
                          ("8-bit opaque", False, True)):
        # call 1 learns the crop bbox (full fetch + rider); call 2 is the
        # first CROPPED delivery and pays the cropped band-shape remote
        # compiles — both untimed, so the loop times the warm steady state
        ref = colorize_convert_fetch(cfg, st, transparent=tr, eight_bit=eb)
        np.testing.assert_array_equal(
            colorize_convert_fetch(cfg, st, transparent=tr, eight_bit=eb), ref)
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            got = colorize_convert_fetch(cfg, st, transparent=tr, eight_bit=eb)
            times.append(time.perf_counter() - t0)
        np.testing.assert_array_equal(got, ref)
        wire_mb = got.shape[0] * got.shape[1] * got.dtype.itemsize / 1e6
        print(f"{label}: warm deliveries {[f'{t:.3f}' for t in times]} s  "
              f"(~{wire_mb:.1f} MB/frame wire pre-crop; full-channel would be "
              f"3x)  bit-exact: True")


if __name__ == "__main__":
    main()
