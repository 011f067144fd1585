"""Why does the vmapped sequence binning run ~3x slower per point than the
flagship's (5.5 vs 1.7 ns/pt) — and what schedule fixes it?

probe_sequence_phases.py pinned 95% of sequence device time on the binning
(warm-up 1%, map 1%, colorize 3%). First run of this probe found the real
culprit: at 1e7 iters/frame the auto schedule resolves to lanes=512,
chunk_steps=512 — 262k-POINT CHUNKS with 2^15 sections, where the apply's
per-section window sweep costs ~15 points per window visit (flagship
4M-point chunks: ~1000). Measured: single-frame bin 32.4 ns/pt, vmap(60)
6.3 ns/pt, vs the flagship's ~1.7.

This probe sweeps chunk size at CONSTANT lanes=512 on real emitted data
(concatenated steady-state chunks of the actual 1e7 orbit), single-frame
and vmapped, to size the fix: raise chunk_steps (the 4M-point buffer /
lanes) instead of raising lanes — warm-up cost stays at 512 lanes.

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
    carry, _ = advance(carry)  # discard the cold first chunk
    parts = []
    for _ in range(16):  # 16 real steady-state chunks = a 4.2M-point stream
        carry, em = advance(carry)
        parts.append(em)
    flat_all = jnp.concatenate([p[0] for p in parts])
    packed_all = jnp.concatenate([p[1] for p in parts])

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

    def section_for(chunk_pts: int) -> int:
        target = max(128, chunk_pts // 8)
        pow2 = 1 << (target.bit_length() - 1)
        if target - pow2 > 2 * pow2 - target:
            pow2 <<= 1
        return max(1 << 14, min(1 << 19, pow2))

    print(json.dumps({"schedule": [lanes, chunk_steps, nchunks], "n": n,
                      "F": F}), flush=True)

    cnt1 = jnp.zeros((npix,), jnp.uint32)
    pk1 = jnp.zeros((npix,), jnp.uint32)

    for mult in (1, 4, 8, 16):
        m = mult * n
        flat = flat_all[:m]
        packed = packed_all[:m]
        kwargs = dict(npix=npix, section=section_for(m), flood_gate=False)

        def single_bin(cnt, pk, f, p, kwargs=kwargs):
            def body(c, _):
                cnt, pk = c
                ff = f ^ (cnt[0] & 1).astype(jnp.int32)
                return kb.bin_chunk_kernel(cnt, pk, ff, p, **kwargs), None
            c, _ = lax.scan(body, (cnt, pk), None, length=K)
            return c

        bench(f"single bin, chunk {m} (sec 2^{section_for(m).bit_length()-1})",
              single_bin, m, cnt1, pk1, flat, packed)

        # vmapped form at the big sizes is what a re-scheduled sequence runs;
        # keep the footprint sane by shrinking F as chunks grow
        Fv = max(4, F // mult)
        salts = jnp.arange(Fv, dtype=jnp.uint32)[:, None]
        packed_f = packed[None, :] ^ salts
        flat_f = jnp.broadcast_to(flat, (Fv, m))
        cntF = jnp.zeros((Fv, npix), jnp.uint32)
        pkF = jnp.zeros((Fv, npix), jnp.uint32)

        def vmap_bin(cnt, pk, f, p, kwargs=kwargs):
            inner = functools.partial(kb.bin_chunk_kernel, **kwargs)
            def body(c, _):
                cnt, pk = c
                ff = f ^ (cnt[0, 0] & 1).astype(jnp.int32)
                return jax.vmap(inner)(cnt, pk, ff, p), None
            c, _ = lax.scan(body, (cnt, pk), None, length=K)
            return c

        bench(f"vmap({Fv}) bin, chunk {m}", vmap_bin, Fv * m,
              cntF, pkF, flat_f, packed_f)


if __name__ == "__main__":
    main()
