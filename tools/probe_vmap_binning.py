"""Why does the vmapped sequence binning run ~3x slower per point than the
flagship's (5.5 vs 1.7 ns/pt)?

probe_sequence_phases.py pinned 95% of sequence device time on the binning
(warm-up 1%, map 1%, colorize 3%). This probe isolates WHERE inside the
vmapped bin the inefficiency lives, timing on real emitted data at the
SEQUENCE schedule (1e7 iters/frame => chunk_steps 152, ~5M-pt chunks):

  - single-frame bin_chunk_kernel (the flagship pipeline, baseline)
  - vmap(bin) over F frames       (what render_sequence_batched executes)
  - single-frame sort (_sections) only
  - vmap(sort) over F frames

In-jit scan repetition, XOR-perturbed, best-of-2. Compare ratios.

Usage: python tools/probe_vmap_binning.py [F=60] [K=4]
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
import numpy as np
from jax import lax


def main() -> None:
    import importlib

    R = importlib.import_module("strange_attractor_tpu.render")
    from strange_attractor_tpu.config import BinStrategy
    from strange_attractor_tpu.models import presets
    from strange_attractor_tpu.ops import kernel_binning as kb
    from strange_attractor_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cfg = presets.poisson_saturne(iterations=int(1e7), width=1920, height=1080,
                                  seed=0, silent=True)
    strategy = cfg.resolved_bin_strategy(jax.default_backend())
    assert strategy == BinStrategy.KERNEL, strategy
    lanes, chunk_steps, nchunks = R.plan_schedule(cfg)
    n = lanes * chunk_steps
    npix = cfg.width * cfg.height
    section = cfg.resolved_kernel_section()
    kwargs = dict(npix=npix, section=section, flood_gate=False)

    cam = R.camera_params(cfg.view, 0.0, cfg.width, cfg.height)
    dt = R._dtype(cfg)
    step = R._step_fn(cfg, cam, strategy)
    init, _ = R._build_kernels(cfg, strategy, nchunks)
    p0 = init(R.seed_key(cfg))
    cos_v = jnp.asarray(np.cos(cfg.angle), dt)
    sin_v = jnp.asarray(np.sin(cfg.angle), dt)

    @jax.jit
    def advance(carry):
        c, em = lax.scan(step, carry, None, length=chunk_steps, unroll=8)
        return c, tuple(e.reshape(-1) for e in em)

    carry = (*R._split_xyz(p0), *R._split_xyz(p0),
             jnp.zeros((lanes,), jnp.int32), cos_v, sin_v)
    carry, (flat, packed) = advance(carry)  # second chunk = steady state
    carry, (flat, packed) = advance(carry)

    # F per-frame variants: same pixel distribution (frames differ only by
    # camera angle in production), per-frame value bits perturbed
    salts = jnp.arange(F, dtype=jnp.uint32)[:, None]
    packed_f = packed[None, :] ^ salts
    flat_f = jnp.broadcast_to(flat, (F, n))

    def bench(name, fn, per_pt, *args):
        jfn = jax.jit(fn)
        out = jfn(*args)
        float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0].astype(jnp.float32))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = jfn(*args)
            float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0]
                  .astype(jnp.float32))
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"variant": name,
                          "ns_per_pt": round(best / (K * per_pt) * 1e9, 3)}),
              flush=True)

    def single_bin(cnt, pk, f, p):
        def body(c, _):
            cnt, pk = c
            ff = f ^ (cnt[0] & 1).astype(jnp.int32)
            return kb.bin_chunk_kernel(cnt, pk, ff, p, **kwargs), None
        c, _ = lax.scan(body, (cnt, pk), None, length=K)
        return c

    def vmap_bin(cnt, pk, f, p):
        inner = functools.partial(kb.bin_chunk_kernel, **kwargs)
        def body(c, _):
            cnt, pk = c
            ff = f ^ (cnt[0, 0] & 1).astype(jnp.int32)
            return jax.vmap(inner)(cnt, pk, ff, p), None
        c, _ = lax.scan(body, (cnt, pk), None, length=K)
        return c

    def single_sort(f, p):
        def body(s, _):
            ff = f ^ (s & 1).astype(jnp.int32)
            arrays, *_ = kb._sections(npix, ff, [p], section, [jnp.uint32(0)],
                                      stable=False)
            return s + arrays[0][0, 0, 0].astype(jnp.int32), None
        s, _ = lax.scan(body, jnp.int32(0), None, length=K)
        return s

    def vmap_sort(f, p):
        def one(ff, pp):
            arrays, *_ = kb._sections(npix, ff, [pp], section, [jnp.uint32(0)],
                                      stable=False)
            return arrays[0][0, 0, 0].astype(jnp.int32)
        def body(s, _):
            ff = f ^ (s & 1).astype(jnp.int32)
            return s + jax.vmap(one)(ff, p).sum(), None
        s, _ = lax.scan(body, jnp.int32(0), None, length=K)
        return s

    cnt1 = jnp.zeros((npix,), jnp.uint32)
    pk1 = jnp.zeros((npix,), jnp.uint32)
    cntF = jnp.zeros((F, npix), jnp.uint32)
    pkF = jnp.zeros((F, npix), jnp.uint32)

    print(json.dumps({"schedule": [lanes, chunk_steps, nchunks], "n": n,
                      "F": F, "section": section}), flush=True)
    bench("single-frame sort", single_sort, n, flat, packed)
    bench("single-frame bin (flagship)", single_bin, n, cnt1, pk1, flat, packed)
    bench(f"vmap({F}) sort", vmap_sort, F * n, flat_f, packed_f)
    bench(f"vmap({F}) bin (sequence)", vmap_bin, F * n, cntF, pkF, flat_f, packed_f)


if __name__ == "__main__":
    main()
