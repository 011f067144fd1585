"""Sweep the host-fetch band count for a real 1080p 8-bit frame.

``utils.export.fetch_image`` splits the u32-packed frame into TWO async
in-flight transfers, which measured ~25% faster than one on the tunneled
dev platform (the tunnel charges per-transfer bookkeeping that overlaps
across in-flight RPCs). This probe asks whether MORE bands keep paying:
it renders a short flagship frame, colorizes + converts on device (the
bench deliverable), then times 1/2/4/8-band u32 fetches best-of-N each.

    python tools/probe_fetch.py [iters] [reps]

Prints one JSON line per band count. Run on the real TPU; on CPU the
transfer is host-local and the sweep is meaningless.
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

    import jax
    import jax.numpy as jnp
    from jax import lax

    from strange_attractor_tpu import colorize, presets, render
    from strange_attractor_tpu.config import BrightnessConstants, Colors
    from strange_attractor_tpu.utils.export import convert_format_device
    from strange_attractor_tpu.utils.profiling import hard_sync

    cfg = presets.poisson_saturne(
        iterations=iters,
        colors=Colors(brightness=BrightnessConstants(offset=-0.25)),
        seed=0,
        silent=True,
    )
    st = render(cfg, key=jax.random.PRNGKey(0))

    @jax.jit
    def colorize8(state):
        return convert_format_device(colorize(cfg, state), False, True)

    img = colorize8(st)
    hard_sync(img)
    n = int(np.prod(img.shape))
    assert img.dtype == np.uint8 and n % 4 == 0, (img.dtype, img.shape)
    packed = jax.jit(
        lambda a: lax.bitcast_convert_type(a.reshape(-1, 4), jnp.uint32)
    )(img)
    hard_sync(packed)
    words = packed.shape[0]
    direct = np.asarray(jax.device_get(img))

    for bands in (1, 2, 4, 8, 16):
        if words % bands:
            continue
        per = words // bands

        # FRESH device arrays every rep: jax caches the host copy on the
        # Array object after the first device_get, so re-fetching the same
        # slices times a host-side no-op (this probe once reported 9 GB/s
        # over a ~50 MB/s link that way). The XOR with the rep index cannot
        # be folded away, so every rep transfers real new bytes; the host
        # XORs them back for verification.
        @jax.jit
        def make_parts(a, r, per=per, bands=bands):
            x = lax.bitcast_convert_type(a.reshape(-1, 4), jnp.uint32) ^ r
            return [x[i * per : (i + 1) * per] for i in range(bands)]

        best = None
        host = None
        for rep in range(reps):
            parts = make_parts(img, jnp.uint32(rep))
            for p in parts:
                hard_sync(p)  # band setup (slices + XOR) is not the question
            t0 = time.perf_counter()
            for p in parts:
                p.copy_to_host_async()
            host = np.concatenate([np.asarray(jax.device_get(p)) for p in parts])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            got = (
                np.ascontiguousarray(host ^ np.uint32(rep))
                .view(np.uint8)
                .reshape(img.shape)
            )
            np.testing.assert_array_equal(got, direct)
        print(
            json.dumps(
                {
                    "bands": bands,
                    "best_s": round(best, 4),
                    "mb": round(n / 1e6, 2),
                    "mb_per_s": round(n / 1e6 / best, 1),
                    "reps": reps,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
