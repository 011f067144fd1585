"""Lit-bounding-box crop probe for the delivery tail.

Round 3 rejected SPARSE fetch (bitmask + lit-value compaction): device-side
compaction (packbits/gather) cost ~1 s per 1080p frame, dwarfing the ~0.15 s
dense fetch. A bounding-box CROP is a different mechanism with none of that
cost: unlit pixels tone-map to one constant (exactly 0 for brightness
offset <= 0, since (c*factor + offset)*factor_b saturates below 0), so the
frame outside the lit rows/cols bbox is a host-side constant fill. The crop
is a static slice (free, fuses into the band colorize), the bbox is four
scalars computed from the count plane in two tiny reductions, and the fetch
then moves only bbox_frac of the bytes over the ~41-46 MB/s byte-bound link.

Whether it pays is purely a question of the measured bbox fraction: a
33%-lit flame can still have a ~95% bbox (and solar-sail's pixel-(0,0)
flood pins the bbox's top-left corner at the origin). This probe answers it
with real renders:

  1. render the workload, compute the lit (count>0) bbox on device,
  2. verify the host frame is constant outside the bbox (bit-exactness
     precondition for the crop+fill delivery),
  3. time full vs bbox-cropped banded fetches of the same deliverable.

Usage: python tools/probe_bbox.py [iters=1e9] [preset=poisson-saturne] [reps=5]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from strange_attractor_tpu import presets
    from strange_attractor_tpu.config import BrightnessConstants, Colors
    from strange_attractor_tpu.render import colorize, render
    from strange_attractor_tpu.utils.export import convert_format_device
    from strange_attractor_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    iters = int(float(sys.argv[1])) if len(sys.argv) > 1 else int(1e9)
    preset = sys.argv[2] if len(sys.argv) > 2 else "poisson-saturne"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    if preset == "solar-sail":
        cfg = presets.solar_sail(
            iterations=iters, width=1800, height=2000,
            colors=Colors(brightness=BrightnessConstants(offset=-0.1)),
            seed=0, silent=True,
        )
    else:
        cfg = presets.poisson_saturne(
            iterations=iters, width=1920, height=1080,
            colors=Colors(brightness=BrightnessConstants(offset=-0.25)),
            seed=0, silent=True,
        )
    h, w = cfg.height, cfg.width

    state = render(cfg, key=jax.random.PRNGKey(0))
    float(state.count.sum())

    # --- 1. lit bbox from the count plane (two reductions + 4 tiny argmaxes)
    @jax.jit
    def bbox_fn(count):
        rows = jnp.any(count > 0, axis=1)
        cols = jnp.any(count > 0, axis=0)
        ri = jnp.arange(rows.shape[0], dtype=jnp.int32)
        ci = jnp.arange(cols.shape[0], dtype=jnp.int32)
        r_lo = jnp.min(jnp.where(rows, ri, rows.shape[0]))
        r_hi = jnp.max(jnp.where(rows, ri, -1)) + 1
        c_lo = jnp.min(jnp.where(cols, ci, cols.shape[0]))
        c_hi = jnp.max(jnp.where(cols, ci, -1)) + 1
        return jnp.stack([r_lo, r_hi, c_lo, c_hi])

    bbox_fn(state.count)  # warm
    t0 = time.perf_counter()
    r_lo, r_hi, c_lo, c_hi = (int(v) for v in np.asarray(
        jax.device_get(bbox_fn(state.count))))
    bbox_fetch_s = time.perf_counter() - t0
    bbox_frac = ((r_hi - r_lo) * (c_hi - c_lo)) / float(h * w)

    # --- 2. constant-outside-bbox verification on the host frame
    img = np.asarray(jax.device_get(convert_format_device(
        colorize(cfg, state), False, True)))
    outside = np.ones((h, w), bool)
    outside[r_lo:r_hi, c_lo:c_hi] = False
    fills = np.unique(img[outside].reshape(-1, img.shape[-1]), axis=0)
    constant_outside = fills.shape[0] <= 1

    # --- 3. full vs cropped banded fetch of the same standing image.
    # Both sides use the identical mechanism (device image ready; slice ->
    # flatten -> u32-pack when aligned -> 8-band async fetch) so the delta
    # is bytes, not plumbing. Crop cols snap to multiples of 4 so rows stay
    # u32-packable.
    c_lo_s = (c_lo // 4) * 4
    c_hi_s = min(w, ((c_hi + 3) // 4) * 4)

    dev_img = convert_format_device(colorize(cfg, state), False, True)
    dev_img = jax.block_until_ready(dev_img)

    def banded_fetch(rows0, rows1, cols0, cols1, bands=8):
        nrows = rows1 - rows0
        rows_per = max(1, nrows // bands)
        parts = []
        for k in range(bands):
            a = rows0 + k * rows_per
            b = rows1 if k == bands - 1 else min(rows1, a + rows_per)
            if a >= b:
                continue
            flat = _slice_flat(np.int32(a), np.int32(b - a),
                               np.int32(cols0), np.int32(cols1 - cols0))
            parts.append(flat)
        for p in parts:
            p.copy_to_host_async()
        return [np.asarray(jax.device_get(p)) for p in parts]

    from functools import partial

    @partial(jax.jit, static_argnums=(1, 3))
    def _slice_flat(a, n, c0, nc):
        import jax.lax as lax
        band = lax.dynamic_slice(dev_img, (a, c0, 0), (n, nc, dev_img.shape[-1]))
        flat = band.reshape(-1)
        per = 4 // flat.dtype.itemsize
        if per > 1 and flat.shape[0] % per == 0:
            flat = lax.bitcast_convert_type(flat.reshape(-1, per), jnp.uint32)
        return flat

    results = {
        "device": str(jax.devices()[0]), "iters": iters, "preset": preset,
        "bbox": [r_lo, r_hi, c_lo, c_hi], "bbox_frac": round(bbox_frac, 4),
        "row_frac": round((r_hi - r_lo) / h, 4),
        "col_frac": round((c_hi - c_lo) / w, 4),
        "bbox_fetch_s": round(bbox_fetch_s, 4),
        "constant_outside": bool(constant_outside),
        "fill": fills[0].tolist() if fills.shape[0] == 1 else None,
    }

    for name, (a, b, c0, c1) in {
        "full": (0, h, 0, w),
        "cropped": (r_lo, r_hi, c_lo_s, c_hi_s),
    }.items():
        banded_fetch(a, b, c0, c1)  # warm compiles
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            banded_fetch(a, b, c0, c1)
            times.append(time.perf_counter() - t0)
        times.sort()
        results[name] = {
            "mb": round((b - a) * (c1 - c0) * 3 / 1e6, 2),
            "best_s": round(times[0], 4),
            "med_s": round(times[len(times) // 2], 4),
            "all": [round(t, 4) for t in times],
        }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
