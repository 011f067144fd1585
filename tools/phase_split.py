"""Per-phase timing of the KERNEL render pipeline on REAL emitted data.

Random-data microbenchmarks mislead here (attractor support is concentrated,
so window-walk costs differ a lot from uniform streams — docs/KERNEL_NOTES.md).
This tool runs the actual map scan of a workload to steady state, captures a
representative mid-render chunk's emission, and times each phase with in-jit
repetition (XOR-perturbed between iterations so XLA cannot CSE):

- map:        the emission scan alone (chunk_steps x lanes points)
- sort:       sentinel-map + section reshape + lax.sort (kernel_binning._sections)
- sort+apply: the full bin_chunk_kernel incl. the npix-plane merge

CAVEAT: isolated phases run SLOWER than their share of the real pipeline
(the phase sum here exceeds 1e9/end-to-end-rate by ~50%): jit-parameter
boundaries pin layouts the fused pipeline never materializes and XLA
overlap across phases is lost. Use the splits to compare WORKLOADS or
RATIOS, not as absolute budgets; absolute per-phase budgets come from
ablation diffs of end-to-end runs (docs/KERNEL_NOTES.md).

    python tools/phase_split.py [workload] [chunks_in]

workload: "poisson" (default; reference workload 1 canvas) or "solar"
(reference workload 2, 1800x2000 — the auto 64-row window applies).
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax


def main() -> int:
    from strange_attractor_tpu.config import BinStrategy, BrightnessConstants, Colors
    from strange_attractor_tpu.models import presets
    import importlib

    R = importlib.import_module("strange_attractor_tpu.render")
    from strange_attractor_tpu.ops import kernel_binning as kb
    from strange_attractor_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    which = sys.argv[1] if len(sys.argv) > 1 else "poisson"
    chunks_in = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    if which == "solar":
        cfg = presets.solar_sail(
            iterations=int(1e9), width=1800, height=2000,
            colors=Colors(brightness=BrightnessConstants(offset=-0.1)),
            seed=0, silent=True,
        )
    else:
        cfg = presets.poisson_saturne(
            iterations=int(1e9), width=1920, height=1080,
            colors=Colors(brightness=BrightnessConstants(offset=-0.25)),
            seed=0, silent=True,
        )
    strategy = cfg.resolved_bin_strategy(jax.default_backend())
    assert strategy == BinStrategy.KERNEL, strategy
    lanes, chunk_steps, nchunks = R.plan_schedule(cfg)
    n = lanes * chunk_steps
    npix = cfg.width * cfg.height
    section = cfg.resolved_kernel_section()
    window = cfg.kernel_window or (64 if npix > 3_000_000 else None)
    kwargs = dict(npix=npix, section=section)
    if window:
        kwargs["window"] = window
    K = 16

    import numpy as np

    cam = R.camera_params(cfg.view, 0.0, cfg.width, cfg.height)
    dt = R._dtype(cfg)
    step = R._step_fn(cfg, cam, strategy)
    init, _ = R._build_kernels(cfg, strategy, min(nchunks, R.DISPATCH_GROUP))
    p0 = init(R.seed_key(cfg))

    @functools.partial(jax.jit, static_argnums=1)
    def advance(carry, steps_chunks):
        """Run the map for steps_chunks chunks, return carry + last emission."""
        def body(c, _):
            c, em = lax.scan(step, c, None, length=chunk_steps, unroll=8)
            return c, None
        c, _ = lax.scan(body, carry, None, length=steps_chunks - 1)
        c, em = lax.scan(step, c, None, length=chunk_steps, unroll=8)
        return c, tuple(e.reshape(-1) for e in em)

    cos_v = jnp.asarray(np.cos(cfg.angle), dt)
    sin_v = jnp.asarray(np.sin(cfg.angle), dt)
    carry0 = (*R._split_xyz(p0), *R._split_xyz(p0),
              jnp.zeros((lanes,), jnp.int32), cos_v, sin_v)
    carry, (flat, packed) = advance(carry0, chunks_in)
    dead = float((flat == npix).mean())
    p0_frac = float((flat == 0).mean())

    # ---- map phase: emission scan, reduced into the carry so it can't drop
    @jax.jit
    def time_map(carry):
        def body(c, _):
            c, em = lax.scan(step, c, None, length=chunk_steps, unroll=8)
            return c, jnp.asarray([em[0].sum(), em[1].astype(jnp.uint32).max()], jnp.uint32)
        c, sums = lax.scan(body, carry, None, length=K)
        return sums.sum()

    # ---- sort phase: _sections alone (unstable pair sort, production shape)
    @jax.jit
    def time_sort(flat, packed, salt):
        def body(s, _):
            f = flat ^ (s & 1).astype(jnp.int32)
            arrays, *_ = kb._sections(npix, f, [packed], section,
                                      [jnp.uint32(0)], stable=False,
                                      w=window or kb.WINDOW_ROWS)
            return s + arrays[0][0, 0, 0].astype(jnp.int32), None
        s, _ = lax.scan(body, salt, None, length=K)
        return s

    # ---- full bin: sort + pallas apply + npix merge
    @jax.jit
    def time_bin(cnt, pk, flat, packed):
        def body(c, _):
            cnt, pk = c
            f = flat ^ (cnt[0] & 1).astype(jnp.int32)
            return kb.bin_chunk_kernel(cnt, pk, f, packed, **kwargs), None
        c, _ = lax.scan(body, (cnt, pk), None, length=K)
        return c

    def bench(fn, *args):
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: float(jnp.asarray(x).reshape(-1)[0]), out)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.tree_util.tree_map(lambda x: float(jnp.asarray(x).reshape(-1)[0]), out)
            best = min(best, time.perf_counter() - t0)
        return best / (K * n) * 1e9

    cnt = jnp.zeros((npix,), jnp.uint32)
    pk = jnp.zeros((npix,), jnp.uint32)
    t_map = bench(time_map, carry)
    t_sort = bench(time_sort, flat, packed, jnp.int32(0))
    t_bin = bench(time_bin, cnt, pk, flat, packed)
    print(json.dumps({
        "workload": which, "lanes": lanes, "chunk_steps": chunk_steps,
        "section": section, "window": window or kb.WINDOW_ROWS,
        "chunk_at": chunks_in, "dead_frac": round(dead, 4),
        "pixel0_frac": round(p0_frac, 4),
        "map_ns_pt": round(t_map, 3),
        "sort_ns_pt": round(t_sort, 3),
        "sort_apply_merge_ns_pt": round(t_bin, 3),
        "apply_merge_ns_pt": round(t_bin - t_sort, 3),
        "total_ns_pt": round(t_map + t_bin, 3),
        "implied_iters_per_sec": round(1e9 / (t_map + t_bin)),
    }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
