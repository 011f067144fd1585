"""Research kernel tests.

The Pallas sort-bin kernels only compile for the Mosaic TPU backend (the
CPU test harness forces the cpu platform), so full-kernel correctness runs
live on TPU outside this suite (tools/check_research_kernels.py). Here we
test the host-side geometry helpers and the pure-JAX equivalence of the
sort network semantics at tiny sizes via the interpreter when available.
"""

import numpy as np
import pytest

from strange_attractor_tpu.ops.research_kernels import canvas_geometry


def test_canvas_geometry_fhd():
    alloc_rows, sentinel = canvas_geometry(1920 * 1080)
    assert alloc_rows % 128 == 0
    # valid pixel rows fit strictly below the garbage window
    assert (1920 * 1080 + 127) // 128 <= alloc_rows - 128
    assert sentinel == (alloc_rows - 128) * 128
    # sentinel's window is the last (garbage) window
    assert sentinel // 128 // 128 == alloc_rows // 128 - 1


@pytest.mark.parametrize("npix", [64 * 64, 100 * 37, 1800 * 2000])
def test_canvas_geometry_invariants(npix):
    alloc_rows, sentinel = canvas_geometry(npix)
    nrows = (npix + 127) // 128
    assert alloc_rows >= nrows + 128
    assert sentinel >= nrows * 128
    assert alloc_rows % 128 == 0
