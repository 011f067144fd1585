"""Can EXACT16's earliest-wins tie rule ride a 2-operand sort via a u64 key?

Round-3 analysis (docs/KERNEL_NOTES.md) pinned the cost cliff at >2 sort
operands: the stable 3-operand sort that "earliest" ties require costs
~2.17 ns/pt random vs the unstable pair's 1.58, and end-to-end 364.8M vs
521.5M iters/s. A 32-bit repack provably cannot fix it — bucket(16) +
section-local emission order(19 @ section 2^19) = 35 bits before the f16
value has anywhere to live — but a U64 KEY fits: flat(21) | bucket(16) |
emission(19) = 56 bits, with the f16 value riding as the second operand.
Max-of-key then means (pixel, top bucket, earliest emission) and the sort
is 2-operand UNSTABLE.

The open questions this probe answers on the real chip (x64 enabled —
u64 needs it):

  1. does lax.sort keep a fast path for a (u64, u16) operand pair?
  2. what does the u64 pair cost vs the u32 stable-3op it would replace?

    python tools/probe_u64_sort.py [seclog] [K]

Prints one JSON line per variant (in-jit scan repetition, best-of-2).
Compare RATIOS between variants measured here, not absolutes elsewhere.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax import lax


def main() -> None:
    from strange_attractor_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    seclog = int(sys.argv[1]) if len(sys.argv) > 1 else 19
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    S = 8
    n = S << seclog

    rng = np.random.default_rng(0)
    flat = rng.integers(0, 1920 * 1080 + 1, n).astype(np.uint32)
    sk = rng.integers(0, 1 << 16, n).astype(np.uint32)
    val = rng.integers(0, 1 << 16, n).astype(np.uint16)
    emission = np.tile(np.arange(1 << seclog, dtype=np.uint64), S)

    key64 = (
        (flat.astype(np.uint64) << np.uint64(35))
        | (sk.astype(np.uint64) << np.uint64(19))
        | emission
    )
    shape = (S, 1 << seclog)
    k64 = jnp.asarray(key64.reshape(shape))
    f32 = jnp.asarray(flat.reshape(shape))
    s32 = jnp.asarray(sk.reshape(shape))
    v16 = jnp.asarray(val.reshape(shape))

    def bench(name, fn, *ops):
        jfn = jax.jit(fn)
        out = jfn(*ops)
        float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0].astype(jnp.float32))
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            out = jfn(*ops)
            float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0].astype(jnp.float32))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        ns = best / (K * n) * 1e9
        print(json.dumps({"variant": name, "ns_per_pt": round(ns, 3)}), flush=True)

    def scan_sort(mk):
        def fn(*ops):
            def body(c, _):
                # XOR-perturb so the scan body cannot be folded
                perturbed = [o ^ o.dtype.type(1) for o in c]
                return tuple(mk(*perturbed)), None

            c, _ = lax.scan(body, ops, None, length=K)
            return c

        return fn

    # today's unstable u32 pair (KERNEL's sort) — the floor
    bench(
        "u32 pair unstable (floor)",
        scan_sort(lambda a, b: lax.sort([a, b], num_keys=2, is_stable=False)),
        f32, s32,
    )
    # today's EXACT16 "earliest": stable, keys=(flat, sk), val rides
    bench(
        "u32 stable 3-op (current earliest)",
        scan_sort(lambda a, b, c: lax.sort([a, b, c], num_keys=2, is_stable=True)),
        f32, s32, v16.astype(jnp.uint32),
    )
    # candidate: single u64 key + u16 payload, unstable
    bench(
        "u64 key + u16 payload unstable",
        scan_sort(lambda a, b: lax.sort([a, b], num_keys=1, is_stable=False)),
        k64, v16,
    )
    # candidate variant: u64 key + u32 payload (payload width check)
    bench(
        "u64 key + u32 payload unstable",
        scan_sort(lambda a, b: lax.sort([a, b], num_keys=1, is_stable=False)),
        k64, v16.astype(jnp.uint32),
    )
    # reference point: u64 single key alone
    bench(
        "u64 single key unstable",
        scan_sort(lambda a: lax.sort([a], num_keys=1, is_stable=False)),
        k64,
    )
    # EXACT_KERNEL candidate (round 4): flat<<32 | zdesc as ONE u64 key,
    # f32 value bits as payload, STABLE (emission order must survive for
    # the reference's earliest-wins tie rule on exact (flat, z) ties —
    # uniqueness-via-emission-bits cannot fit: 21+32 leaves 11 bits, and
    # pixel-0 NaN floods collide on (flat, zdesc) by the million). Replaces
    # today's stable u32 3-op (flat, zdesc keys + valbits rider).
    k64e = (f32.astype(jnp.uint64) << jnp.uint64(32)) | s32.astype(jnp.uint64)
    bench(
        "u64 key + u32 payload STABLE (exact candidate)",
        scan_sort(lambda a, b: lax.sort([a, b], num_keys=1, is_stable=True)),
        k64e, v16.astype(jnp.uint32),
    )
    # the exact path it would replace, measured with f32-width value rider
    bench(
        "u32 stable 3-op, u32 value rider (current EXACT_KERNEL)",
        scan_sort(lambda a, b, c: lax.sort([a, b, c], num_keys=2, is_stable=True)),
        f32, s32, v16.astype(jnp.uint32),
    )


if __name__ == "__main__":
    main()
