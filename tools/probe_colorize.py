"""Where do colorize's ~34 ms/frame go at 1080p?

The 120-frame sequence measurement (tools/bench_sequence.py, round 4) put
colorize at >50% of device time for short per-frame budgets (1e7 iters),
and the flagship bench's colorize leg reads 0.034-0.039 s — ~17 ns/px for
what should be a fused elementwise tone map. Suspects:

  1. the (H, W, 3)-stacked palette/brightness math: a 3-wide minor dim
     tiles as (8, 128) lanes and wastes 125/128 of every VPU op (the same
     poison the round-2 map-phase fix removed from the hot loop);
  2. log1p's transcendental lowering;
  3. the final (H, W, 4) u16 assembly / relayout;
  4. unpack_zv bit manipulation.

In-jit scan repetition (each iteration XOR-perturbs the input planes so
the body cannot be folded; every variant reduces its output to a checksum
carry so nothing is DCE'd). Compare RATIOS between variants here, not
absolutes elsewhere.

Usage: python tools/probe_colorize.py [K=16]
"""

from __future__ import annotations

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
    from strange_attractor_tpu.models import presets
    from strange_attractor_tpu.ops.binning import unpack_zv
    from strange_attractor_tpu.ops.colorize import colorize_planes, palette_lookup
    from strange_attractor_tpu.utils.export import convert_format_device
    from strange_attractor_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    H, W = 1080, 1920
    cfg = presets.poisson_saturne(width=W, height=H, iterations=1, seed=0)
    bk = cfg.colors.brightness
    stops = cfg.colors.palette.stops

    # synthetic planes with a realistic value distribution: counts are
    # heavy-tailed, packed words carry (z-key | value) bits. For RATIO
    # comparisons the distribution barely matters (elementwise math).
    rng = np.random.default_rng(0)
    count = jnp.asarray(
        np.minimum(rng.zipf(1.7, (H, W)), 1 << 20).astype(np.uint32))
    packed = jnp.asarray(rng.integers(0, 1 << 32, (H, W), dtype=np.uint64)
                         .astype(np.uint32))
    npx = H * W

    def bench(name, fn):
        def scan_fn(c, p):
            def body(carry, _):
                cc, pp, acc = carry
                out = fn(cc, pp)
                acc = acc + out
                return (cc ^ jnp.uint32(1), pp ^ jnp.uint32(1), acc), None

            (_, _, acc), _ = lax.scan(body, (c, p, jnp.float32(0.0)), None, length=K)
            return acc

        jfn = jax.jit(scan_fn)
        float(jfn(count, packed))
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            float(jfn(count, packed))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(json.dumps({"variant": name, "ms_per_frame": round(best / K * 1e3, 3),
                          "ns_per_px": round(best / (K * npx) * 1e9, 3)}), flush=True)

    def full_current(c, p):
        zbuf, steps = unpack_zv(p)
        img = colorize_planes(cfg, c, steps, zbuf)
        return img.astype(jnp.float32).sum()

    def full_plus_convert(c, p):
        zbuf, steps = unpack_zv(p)
        img = colorize_planes(cfg, c, steps, zbuf)
        img8 = convert_format_device(img, False, True)
        return img8.astype(jnp.float32).sum()

    def unpack_only(c, p):
        zbuf, steps = unpack_zv(p)
        return zbuf.sum() + steps.sum() + c.astype(jnp.float32).sum()

    def factor_only(c, p):
        cf = c.astype(jnp.float32)
        maxc = jnp.max(cf)
        return (jnp.log1p(cf) / jnp.log1p(maxc)).sum() + p[0, 0].astype(jnp.float32)

    def palette_stacked(c, p):
        _, steps = unpack_zv(p)
        return palette_lookup(stops, steps).sum() + c[0, 0].astype(jnp.float32)

    def _palette_channels(value):
        k = stops.shape[0] - 1
        v = jnp.where(value >= 1.0, jnp.float32(0.999999), jnp.maximum(value, 0.0)) * k
        n = jnp.minimum(jnp.floor(v).astype(jnp.int32), k - 1)
        frac = v % 1.0
        lo = [jnp.zeros_like(v) for _ in range(3)]
        hi = [jnp.zeros_like(v) for _ in range(3)]
        for idx in range(k):
            sel = n == idx
            for ch in range(3):
                lo[ch] = jnp.where(sel, jnp.float32(stops[idx][ch]), lo[ch])
                hi[ch] = jnp.where(sel, jnp.float32(stops[idx + 1][ch]), hi[ch])
        return [jnp.sqrt(h * frac + l * (1.0 - frac)) for l, h in zip(lo, hi)]

    def palette_planes(c, p):
        _, steps = unpack_zv(p)
        chans = _palette_channels(steps)
        return sum(ch.sum() for ch in chans) + c[0, 0].astype(jnp.float32)

    def _saturate(x):
        x = jnp.nan_to_num(x, nan=0.0, posinf=65535.0, neginf=0.0)
        return jnp.clip(x, 0.0, 65535.0).astype(jnp.uint16)

    def full_channel_planes(c, p):
        # candidate: identical math, per-channel (H, W) planes throughout,
        # single interleave at the end
        _, steps = unpack_zv(p)
        chans = _palette_channels(steps)
        cf = c.astype(jnp.float32)
        factor = jnp.log1p(cf) / jnp.log1p(jnp.max(cf))
        out = [_saturate((ch * factor + jnp.float32(bk.offset))
                         * jnp.float32(bk.factor) * 65535.0) for ch in chans]
        out.append(jnp.full(c.shape, 65535, jnp.uint16))
        img = jnp.stack(out, axis=-1)
        return img.astype(jnp.float32).sum()

    def full_channel_no_assemble(c, p):
        # same but WITHOUT the final (H, W, 4) interleave: isolates the
        # relayout cost
        _, steps = unpack_zv(p)
        chans = _palette_channels(steps)
        cf = c.astype(jnp.float32)
        factor = jnp.log1p(cf) / jnp.log1p(jnp.max(cf))
        out = [_saturate((ch * factor + jnp.float32(bk.offset))
                         * jnp.float32(bk.factor) * 65535.0) for ch in chans]
        return sum(o.astype(jnp.float32).sum() for o in out) + 65535.0 * npx

    def assemble_only(c, p):
        planes = [c.astype(jnp.uint16), (p >> 16).astype(jnp.uint16),
                  (p & 0xFFFF).astype(jnp.uint16),
                  jnp.full(c.shape, 65535, jnp.uint16)]
        return jnp.stack(planes, axis=-1).astype(jnp.float32).sum()

    def baseline_sum(c, p):
        return c.astype(jnp.float32).sum() + p.astype(jnp.float32).sum()

    bench("baseline: input sums only", baseline_sum)
    bench("full colorize (current, stacked)", full_current)
    bench("full colorize + convert8 (current)", full_plus_convert)
    bench("unpack_zv only", unpack_only)
    bench("log1p factor only", factor_only)
    bench("palette (current, stacks (H,W,3))", palette_stacked)
    bench("palette (per-channel planes)", palette_planes)
    bench("full per-channel planes + final stack", full_channel_planes)
    bench("full per-channel planes, no assembly", full_channel_no_assemble)
    bench("(H,W,4) u16 assembly only", assemble_only)


if __name__ == "__main__":
    main()
