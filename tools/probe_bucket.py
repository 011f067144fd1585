"""Bucket-sort feasibility: the histogram is cheap (one-hot dot over <=512
buckets), but placement needs a data-dependent permutation. Measure the
best permutation primitives XLA offers on production shapes (8 x 2^19 u32
pairs, in-scan K=16): gather-by-sorted-index (take_along_axis) and the
one-hot permutation matmul are the only mechanisms below scatter's ~8ns.
"""
import json, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from strange_attractor_tpu.utils.profiling import enable_compilation_cache
enable_compilation_cache()

S, sec = 8, 1 << 19
n = S * sec
K = 16
rng = np.random.default_rng(0)
vals = jnp.asarray(rng.integers(0, 2**32, (S, sec), dtype=np.uint64).astype(np.uint32))
pay  = jnp.asarray(rng.integers(0, 2**32, (S, sec), dtype=np.uint64).astype(np.uint32))
# a fixed random permutation per section (what a bucket pass would produce)
perm = jnp.asarray(np.argsort(rng.random((S, sec)), axis=1).astype(np.int32))

@jax.jit
def probe_gather(vals, pay, perm, salt):
    def body(s, _):
        p = perm ^ (s & 1)          # defeat CSE; still a valid-ish index set for cost purposes
        a = jnp.take_along_axis(vals, p, axis=1)
        b = jnp.take_along_axis(pay, p, axis=1)
        return s + a[0, 0].astype(jnp.int32) + b[0, 0].astype(jnp.int32), None
    s, _ = lax.scan(body, salt, None, length=K)
    return s

@jax.jit
def probe_sort_ref(vals, pay, salt):
    def body(s, _):
        a, b = lax.sort((vals ^ (s & 1).astype(jnp.uint32), pay), dimension=1,
                        num_keys=2, is_stable=False)
        return s + a[0, 0].astype(jnp.int32) + b[0, 0].astype(jnp.int32), None
    s, _ = lax.scan(body, salt, None, length=K)
    return s

def bench(fn, *args):
    out = fn(*args); float(jnp.asarray(out).reshape(-1)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); out = fn(*args)
        float(jnp.asarray(out).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best / (K * n) * 1e9

tg = bench(probe_gather, vals, pay, perm, jnp.int32(0))
ts = bench(probe_sort_ref, vals, pay, jnp.int32(0))
print(json.dumps({"gather_permute_2xu32_ns_pt": round(tg, 3),
                  "full_pair_sort_ns_pt": round(ts, 3)}))
