"""Does the emission->section reshape cost anything? (VERDICT item 4 lever a)

Times, with in-jit K=16 repetition on 4M-point streams:
  A) production _sections: (m,) flat/packed -> sentinel map -> reshape (S, sec)
     -> unstable pair lax.sort
  B) sort of PRE-SECTIONED (S, sec) operands (no reshape, no sentinel map)
  C) B plus the post-sort (S, R_s, rl) reshape the apply consumes
The A-B gap bounds what fusing emission into the section layout could save.
"""
import json
import sys
import time

from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from strange_attractor_tpu.ops import kernel_binning as kb
from strange_attractor_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

n = 1 << 22
npix = 1920 * 1080
section = 1 << 19
K = 16
S = n // section

rng = np.random.default_rng(0)
flat = jnp.asarray(rng.integers(0, npix, n).astype(np.int32))
packed = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32))
flat2 = flat.reshape(S, section).astype(jnp.uint32)
packed2 = packed.reshape(S, section)


@jax.jit
def probe_a(flat, packed, salt):
    def body(s, _):
        f = flat ^ (s & 1).astype(jnp.int32)
        arrays, *_ = kb._sections(npix, f, [packed], section, [jnp.uint32(0)],
                                  stable=False)
        return s + arrays[0][0, 0, 0].astype(jnp.int32), None
    s, _ = lax.scan(body, salt, None, length=K)
    return s


@jax.jit
def probe_b(flat2, packed2, salt):
    def body(s, _):
        f = flat2 ^ (s & 1).astype(jnp.uint32)
        a, b = lax.sort((f, packed2), dimension=1, num_keys=2, is_stable=False)
        return s + a[0, 0].astype(jnp.int32), None
    s, _ = lax.scan(body, salt, None, length=K)
    return s


@jax.jit
def probe_c(flat2, packed2, salt):
    rl = kb.ROW_LANES
    def body(s, _):
        f = flat2 ^ (s & 1).astype(jnp.uint32)
        a, b = lax.sort((f, packed2), dimension=1, num_keys=2, is_stable=False)
        a = a.reshape(S, section // rl, rl)
        b = b.reshape(S, section // rl, rl)
        return s + a[0, 0, 0].astype(jnp.int32) + b[0, 0, 0].astype(jnp.int32), None
    s, _ = lax.scan(body, salt, None, length=K)
    return s


def bench(fn, *args):
    out = fn(*args)
    float(jnp.asarray(out).reshape(-1)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.asarray(out).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best / (K * n) * 1e9


ta = bench(probe_a, flat, packed, jnp.int32(0))
tb = bench(probe_b, flat2, packed2, jnp.int32(0))
tc = bench(probe_c, flat2, packed2, jnp.int32(0))
print(json.dumps({
    "production_sections_ns_pt": round(ta, 3),
    "presectioned_sort_ns_pt": round(tb, 3),
    "presectioned_sort_plus_row_reshape_ns_pt": round(tc, 3),
    "reshape_plus_sentinel_overhead_ns_pt": round(ta - tc, 3),
}))


# ---- sharper variants: isolate the where-pass (D) and the producer layout (E)
@jax.jit
def probe_d(flat2, packed2, salt):
    """sentinel map + sort on pre-sectioned input (no reshape-from-flat)."""
    def body(s, _):
        f = flat2 ^ (s & 1).astype(jnp.uint32)
        f = jnp.where(f == npix, jnp.uint32((1 << 22) - 128), f)
        a, b = lax.sort((f, packed2), dimension=1, num_keys=2, is_stable=False)
        rl = kb.ROW_LANES
        a = a.reshape(S, section // rl, rl)
        b = b.reshape(S, section // rl, rl)
        return s + a[0, 0, 0].astype(jnp.int32) + b[0, 0, 0].astype(jnp.int32), None
    s, _ = lax.scan(body, salt, None, length=K)
    return s


flat_e = flat.reshape(256, n // 256)
packed_e = packed.reshape(256, n // 256)


@jax.jit
def probe_e(fe, pe, salt):
    """emission-shaped (chunk_steps, lanes) input, reshaped to sections
    inside the jit — mimics the production producer layout."""
    def body(s, _):
        f = fe ^ (s & 1).astype(jnp.int32)
        fu = f.reshape(-1)
        pu = pe.reshape(-1)
        fu = jnp.where(fu == npix, jnp.uint32((1 << 22) - 128), fu.astype(jnp.uint32))
        a, b = lax.sort((fu.reshape(S, section), pu.reshape(S, section)),
                        dimension=1, num_keys=2, is_stable=False)
        rl = kb.ROW_LANES
        a = a.reshape(S, section // rl, rl)
        b = b.reshape(S, section // rl, rl)
        return s + a[0, 0, 0].astype(jnp.int32) + b[0, 0, 0].astype(jnp.int32), None
    s, _ = lax.scan(body, salt, None, length=K)
    return s


td = bench(probe_d, flat2, packed2, jnp.int32(0))
te = bench(probe_e, flat_e, packed_e, jnp.int32(0))
ta2 = bench(probe_a, flat, packed, jnp.int32(0))
print(json.dumps({
    "d_sentinel_plus_presectioned_sort_ns_pt": round(td, 3),
    "e_emission_shaped_input_ns_pt": round(te, 3),
    "a_rerun_ns_pt": round(ta2, 3),
}))
