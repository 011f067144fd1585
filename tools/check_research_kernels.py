"""On-TPU correctness check for the research sort-bin kernels.

Run manually on a machine with a TPU attached (takes minutes: the unrolled
bitonic network compiles slowly — see docs/KERNEL_NOTES.md):

    python tools/check_research_kernels.py [R] [S]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from strange_attractor_tpu.ops.research_kernels import (
    bitonic_sort_pairs,
    canvas_geometry,
    window_apply,
)


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    C = 128
    M = R * C
    npix = 1920 * 1080
    alloc_rows, sentinel = canvas_geometry(npix)

    rng = np.random.default_rng(0)
    flat = rng.integers(0, npix, (S, M)).astype(np.uint32)
    flat[rng.random((S, M)) < 0.05] = sentinel  # some out-of-bounds points
    packed = rng.integers(1, 2**31, (S, M)).astype(np.uint32)

    # column-major chunk layout
    fl = np.stack([flat[s].reshape(C, R).T for s in range(S)])
    pk = np.stack([packed[s].reshape(C, R).T for s in range(S)])

    t0 = time.perf_counter()
    sf, sp = jax.jit(bitonic_sort_pairs)(jnp.asarray(fl), jnp.asarray(pk))
    float(sf[0, 0, 0])
    print(f"sort compile+run: {time.perf_counter() - t0:.1f}s")
    for s in range(S):
        order = np.lexsort((packed[s], flat[s]))
        got_f = np.asarray(sf[s]).T.reshape(-1)
        got_p = np.asarray(sp[s]).T.reshape(-1)
        assert np.array_equal(got_f, flat[s][order]), f"chunk {s}: flat order wrong"
        assert np.array_equal(got_p, packed[s][order]), f"chunk {s}: packed order wrong"
    print("sort: exact")

    t0 = time.perf_counter()
    cnt, pkc = jax.jit(lambda a, b: window_apply(a, b, npix))(sf, sp)
    float(cnt[0, 0])
    print(f"apply compile+run: {time.perf_counter() - t0:.1f}s")
    cnt = np.asarray(cnt).reshape(-1)[:npix]
    pkc = np.asarray(pkc).reshape(-1)[:npix]
    want_cnt = np.zeros(npix, np.uint32)
    want_pk = np.zeros(npix, np.uint32)
    af, ap = flat.reshape(-1), packed.reshape(-1)
    valid = af < npix
    np.add.at(want_cnt, af[valid], 1)
    np.maximum.at(want_pk, af[valid], ap[valid])
    assert np.array_equal(cnt, want_cnt), "count mismatch"
    assert np.array_equal(pkc, want_pk), "packed mismatch"
    print("apply: exact")


if __name__ == "__main__":
    main()
