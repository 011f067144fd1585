"""EXACT_KERNEL phase probe: time the sort variants and apply widths that
could take the reference-faithful strategy from 318M toward 400M+ iters/s
(round-2 VERDICT item 3).

Like tools/phase_split.py this measures on REAL emitted data (random streams
mislead — attractor support is concentrated) with in-jit repetition, and the
same caveat applies: isolated phases run slower than their share of the fused
pipeline; compare RATIOS between variants, not absolutes.

Variants probed:
  sort_stable3   (flat, zdesc, valbits) keys=2 stable  — current EXACT sort
  sort_unstable2 (flat, packed)         keys=2 unstable — KERNEL's sort (floor)
  sort_stable2   (flat, packed4)        keys=2 stable  — 4-byte-payload mode
  sort_unstable4 (flat, zdesc, idx, valbits) keys=3 unstable — full fidelity,
                 emission order carried by an explicit index key
  bin_exact_w{8,16,32}  full bin_chunk_kernel_exact at those apply windows

    python tools/probe_exact.py [chunks_in]
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
    from strange_attractor_tpu.ops.binning import _mono_u32, pack_zv
    from strange_attractor_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    chunks_in = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    cfg = presets.poisson_saturne(
        iterations=int(1e9), width=1920, height=1080,
        colors=Colors(brightness=BrightnessConstants(offset=-0.25)),
        seed=0, silent=True,
    )
    lanes, chunk_steps, nchunks = R.plan_schedule(cfg)
    n = lanes * chunk_steps
    npix = cfg.width * cfg.height
    section = cfg.resolved_kernel_section()
    K = 16

    import numpy as np

    cam = R.camera_params(cfg.view, 0.0, cfg.width, cfg.height)
    dt = R._dtype(cfg)
    step = R._step_fn(cfg, cam, BinStrategy.EXACT_KERNEL)
    init, _ = R._build_kernels(cfg, BinStrategy.EXACT_KERNEL, 1)
    p0 = init(R.seed_key(cfg))

    @functools.partial(jax.jit, static_argnums=1)
    def advance(carry, steps_chunks):
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
    carry, (flat, z, val) = advance(carry0, chunks_in)

    z = jnp.where(z == 0.0, jnp.float32(0.0), z)
    zdesc = ~_mono_u32(z)
    valbits = lax.bitcast_convert_type(val.astype(jnp.float32), jnp.uint32)
    packed = pack_zv(z, val)
    # 4-byte exact-tie packing: descending-z key high 16 | f16 value bits
    val16 = lax.bitcast_convert_type(val.astype(jnp.float16), jnp.uint16)
    packed4 = (zdesc & jnp.uint32(0xFFFF0000)) | val16.astype(jnp.uint32)
    idx = jnp.arange(flat.size, dtype=jnp.uint32)

    def sort_probe(arrays, num_keys, stable):
        ars = tuple(arrays)

        @jax.jit
        def fn(salt, *ops):
            def body(s, _):
                f = ops[0] ^ (s & 1).astype(jnp.int32)
                arrays, *_ = kb._sections(npix, f, list(ops[1:]), section,
                                          [jnp.uint32(0)] * (len(ops) - 1),
                                          stable=stable)
                # _sections sorts with num_keys=2 fixed; re-sort manually when
                # probing other key counts
                return s + arrays[0][0, 0, 0].astype(jnp.int32), None
            s, _ = lax.scan(body, salt, None, length=K)
            return s
        return fn, ars

    # _sections pins num_keys=2; build raw lax.sort probes for full control
    def raw_sort_probe(ops, num_keys, stable, sec_override=None):
        sec = min(sec_override or section, kb._round_pow2(ops[0].size))
        pad = (-ops[0].size) % sec

        @jax.jit
        def fn(salt, *ops):
            def body(s, _):
                f = (ops[0] ^ s.astype(jnp.uint32) & 1,) + ops[1:]
                arrs = [jnp.concatenate([a, jnp.zeros((pad,), a.dtype)]) if pad else a
                        for a in f]
                S = arrs[0].size // sec
                out = lax.sort(tuple(a.reshape(S, sec) for a in arrs),
                               dimension=1, num_keys=num_keys, is_stable=stable)
                return s + out[0][0, 0].astype(jnp.int32), None
            s, _ = lax.scan(body, salt, None, length=K)
            return s
        return fn

    fu = jnp.where(flat == npix, jnp.uint32(npix), flat.astype(jnp.uint32))

    sk16 = (packed4 >> 16).astype(jnp.uint16)
    v16u = val16
    probes = {
        "sort_unstable2": (raw_sort_probe((fu, packed), 2, False), (fu, packed)),
        "sort_stable2": (raw_sort_probe((fu, packed4), 2, True), (fu, packed4)),
        "sort_stable3": (raw_sort_probe((fu, zdesc, valbits), 2, True),
                         (fu, zdesc, valbits)),
        "sort_unstable4": (raw_sort_probe((fu, zdesc, idx, valbits), 3, False),
                           (fu, zdesc, idx, valbits)),
        # 16-bit payload operands: same bytes/pt as KERNEL's pair sort
        "sort_stable3_u16": (raw_sort_probe((fu, sk16, v16u), 2, True),
                             (fu, sk16, v16u)),
        "sort_unstable2_p4": (raw_sort_probe((fu, packed4), 2, False),
                              (fu, packed4)),
        # unique-key unstable variants: z-bucket key | section-local emission
        # index in the low 16 bits makes every key distinct, so an unstable
        # sort is deterministic AND earliest-wins — needs 2^16 sections
        "sort_unstable3": (raw_sort_probe((fu, zdesc, valbits), 3, False),
                           (fu, zdesc, valbits)),
        "sort_unstable3_s16": (raw_sort_probe((fu, packed4, v16u), 3, False,
                                              sec_override=1 << 16),
                               (fu, packed4, v16u)),
        "sort_unstable2_s16": (raw_sort_probe((fu, packed), 2, False,
                                              sec_override=1 << 16),
                               (fu, packed)),
        "sort_stable3_s16": (raw_sort_probe((fu, zdesc, valbits), 2, True,
                                            sec_override=1 << 16),
                             (fu, zdesc, valbits)),
    }

    def bench(fn, *args):
        out = fn(jnp.int32(0), *args)
        float(jnp.asarray(out).reshape(-1)[0])
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = fn(jnp.int32(0), *args)
            float(jnp.asarray(out).reshape(-1)[0])
            best = min(best, time.perf_counter() - t0)
        return best / (K * n) * 1e9

    results = {"chunk_at": chunks_in, "section": section,
               "dead_frac": round(float((flat == npix).mean()), 4)}
    for name, (fn, args) in probes.items():
        results[name] = round(bench(fn, *args), 3)
        print(f"  {name}: {results[name]} ns/pt", flush=True)

    # full exact bin at several windows
    cnt = jnp.zeros((npix,), jnp.uint32)
    stp = jnp.zeros((npix,), jnp.float32)
    zb = jnp.full((npix,), -1.0, jnp.float32)

    for w in (8, 16, 32):
        @jax.jit
        def time_bin(cnt, stp, zb, flat, z, val, _w=w):
            def body(c, _):
                cnt, stp, zb = c
                f = flat ^ (cnt[0] & 1).astype(jnp.int32)
                return kb.bin_chunk_kernel_exact(
                    cnt, stp, zb, f, z, val, npix=npix, section=section,
                    window=_w), None
            c, _ = lax.scan(body, (cnt, stp, zb), None, length=K)
            return c
        r = bench(lambda s, *a: time_bin(*a), cnt, stp, zb, flat, z, val)
        results[f"bin_exact_w{w}"] = round(r, 3)
        print(f"  bin_exact_w{w}: {r:.3f} ns/pt", flush=True)

    for w, sec in ((16, section), (32, section), (32, 1 << 16), (32, 1 << 17)):
        @jax.jit
        def time_bin16(cnt, stp, zb, flat, z, val, _w=w, _s=sec):
            def body(c, _):
                cnt, stp, zb = c
                f = flat ^ (cnt[0] & 1).astype(jnp.int32)
                return kb.bin_chunk_kernel_exact16(
                    cnt, stp, zb, f, z, val, npix=npix, section=_s,
                    window=_w), None
            c, _ = lax.scan(body, (cnt, stp, zb), None, length=K)
            return c
        r = bench(lambda s, *a: time_bin16(*a), cnt, stp, zb, flat, z, val)
        results[f"bin_exact16_w{w}_s{sec.bit_length() - 1}"] = round(r, 3)
        print(f"  bin_exact16_w{w}_s{sec.bit_length() - 1}: {r:.3f} ns/pt", flush=True)

    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
