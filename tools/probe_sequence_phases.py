"""Phase split of the vmapped sequence program by ablation.

The 120-frame sequence measures 162M iters/s vs the flagship's 544M — a
3.4x per-point gap that per-chunk accounting can't explain (the total
chunk/sort/apply counts are nearly identical). probe_colorize.py already
acquitted the tone map (~2 ms/frame in-jit). This probe times the vmapped
per-frame body (`_canvas_body(..., vmapped=True)`, the exact program
render_sequence_batched runs) in cumulative ablations on the real chip:

  1. seed+warm-up only            (vmapped _seed_warm)
  2. + map scan, emission summed  (no binning)
  3. + binning                    (full canvas body)
  4. + colorize                   (the production `one()` program)

Each variant is jitted over F frames at the production schedule and timed
by scalar-fetch sync, best-of-2. Differences between adjacent rows = the
phase costs. Compare ratios measured here, not absolutes elsewhere.

Usage: python tools/probe_sequence_phases.py [F=60] [ITERS=1e7]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main() -> None:
    from strange_attractor_tpu.models import presets
    from strange_attractor_tpu.ops.colorize import colorize_planes, state_planes
    from strange_attractor_tpu.parallel.mesh import planes_to_state
    from strange_attractor_tpu.render import (
        RenderState, _bin_fn, _canvas_body, _dtype, _join_xyz, _seed_warm,
        _split_xyz, _state_to_planes, _step_fn, plan_schedule, seed_key,
    )
    from strange_attractor_tpu.ops.projection import camera_params
    from strange_attractor_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    F = int(float(sys.argv[1])) if len(sys.argv) > 1 else 60
    iters = int(float(sys.argv[2])) if len(sys.argv) > 2 else int(1e7)
    cfg = presets.poisson_saturne(iterations=iters, width=1920, height=1080,
                                  seed=0, silent=True)
    strategy = cfg.resolved_bin_strategy(jax.default_backend())
    lanes, chunk, nchunks = plan_schedule(cfg)
    dt = _dtype(cfg)
    cam = camera_params(cfg.view, 0.0, cfg.width, cfg.height)
    npix = cfg.width * cfg.height
    shape = (cfg.height, cfg.width)
    step = _step_fn(cfg, cam, strategy)

    base = seed_key(cfg)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(jnp.arange(F))
    rad = np.radians(np.linspace(0.0, 360.0, F, endpoint=False))
    cos_v = jnp.asarray(np.cos(rad), dt)
    sin_v = jnp.asarray(np.sin(rad), dt)

    def bench(name, fn):
        jfn = jax.jit(jax.vmap(fn))
        out = jfn(keys, cos_v, sin_v)
        float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0].astype(jnp.float32))
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            out = jfn(keys, cos_v, sin_v)
            float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0]
                  .astype(jnp.float32))
            dt_ = time.perf_counter() - t0
            best = dt_ if best is None else min(best, dt_)
        total = F * lanes * chunk * nchunks
        print(json.dumps({
            "variant": name, "s": round(best, 3),
            "s_per_frame": round(best / F, 4),
            "iters_per_sec": round(total / best, 1),
        }), flush=True)

    def warm_only(k, c, s):
        cur = _seed_warm(cfg, lanes, dt, k)
        return cur.sum() + c + s

    def warm_map(k, c, s):
        cur = _seed_warm(cfg, lanes, dt, k)
        prev = cur
        age = jnp.zeros((lanes,), jnp.int32)

        def chunk_body(carry, _):
            cur, prev, age, acc = carry
            (x, y, z, px, py, pz, age, _, _), em = lax.scan(
                step, (*_split_xyz(cur), *_split_xyz(prev), age, c, s),
                None, length=chunk, unroll=8,
            )
            # consume the emission without binning (flat + packed sums)
            acc = acc + sum(e.astype(jnp.float32).sum() for e in em)
            return (_join_xyz(x, y, z), _join_xyz(px, py, pz), age, acc), None

        (cur, _, _, acc), _ = lax.scan(
            chunk_body, (cur, prev, age, jnp.float32(0.0)), None, length=nchunks)
        return acc

    body = _canvas_body(cfg, strategy, lanes, chunk, nchunks, vmapped=True)

    def full_bin(k, c, s):
        planes = body(k, c, s)
        return sum(p.astype(jnp.float32)[::1024].sum() for p in planes)

    def full_colorize(k, c, s):
        st = planes_to_state(body(k, c, s), strategy, shape)
        return colorize_planes(cfg, *state_planes(st)).reshape(-1)

    bench("1 warm-up only", warm_only)
    bench("2 warm-up + map scan (no binning)", warm_map)
    bench("3 + binning (full canvas body)", full_bin)
    bench("4 + colorize (production one())", full_colorize)


if __name__ == "__main__":
    main()
