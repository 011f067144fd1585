"""On-TPU correctness + throughput check for the production KERNEL binning
pipeline (ops/kernel_binning.py) — the *compiled* Mosaic path, which the CPU
test suite only covers in interpreter mode.

Part of the verify recipe (.claude/skills/verify/SKILL.md); also run before
trusting a bench number after kernel changes:

    python tools/check_kernels.py [n_points] [section_log2] [--x64]

``--x64`` enables jax_enable_x64 first: the f64 escape hatch shares these
kernels and x64 mode has repeatedly broken ONLY the compiled Mosaic
lowering (never interpret mode) — run it after kernel changes too.

Exits non-zero on any exactness mismatch vs a sequential numpy reference.
``certify_kernels`` is the importable core: bench.py runs it before every
timed run so each recorded BENCH_r*.json certifies the compiled Mosaic path
is still bit-exact (round-2 verdict item 5).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def certify_kernels(n: int = 1 << 20, seclog: int = 17, npix: int = 1920 * 1080,
                    interpret: bool = False, seed: int = 0, log=print) -> None:
    """Assert KERNEL / EXACT_KERNEL / DEPTH_KERNEL match a sequential numpy
    reference bit-for-bit on ``n`` random points (2% out-of-bounds, z ties
    injected). Raises AssertionError on any mismatch."""
    from strange_attractor_tpu.ops import kernel_binning as kb

    rng = np.random.default_rng(seed)
    flat = rng.integers(0, npix, n).astype(np.int32)
    flat[rng.random(n) < 0.02] = npix  # out-of-bounds convention
    # flood pixel (0,0) like solar-sail's NaN quirk (35-40% of points on a
    # long render): exercises the eviction fixup, the sentinel-tail skip,
    # and the mixed-row window clamp in the compiled Mosaic kernel
    flat[rng.random(n) < 0.35] = 0
    packed = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)

    cnt = jnp.zeros((npix,), jnp.uint32)
    pk = jnp.zeros((npix,), jnp.uint32)
    t0 = time.perf_counter()
    cnt, pk = kb.bin_chunk_kernel(
        cnt, pk, jnp.asarray(flat), jnp.asarray(packed),
        npix=npix, section=1 << seclog, interpret=interpret,
    )
    got_c = np.asarray(cnt)[:npix]
    got_p = np.asarray(pk)[:npix]
    log(f"compile+run: {time.perf_counter() - t0:.1f}s")

    want_c = np.zeros(npix + 1, np.uint64)
    want_p = np.zeros(npix + 1, np.uint32)
    for f, p in zip(flat, packed):
        want_c[f] += 1
        want_p[f] = max(want_p[f], p)
    ok_c = (got_c == want_c[:npix].astype(np.uint32)).all()
    ok_p = (got_p == want_p[:npix]).all()
    log(f"count exact: {ok_c}  packed exact: {ok_p}")
    if not (ok_c and ok_p):
        bad = np.nonzero(got_p != want_p[:npix])[0][:5]
        log(f"first packed mismatches: {bad} {got_p[bad]} {want_p[bad]}")
        raise AssertionError("KERNEL mismatch vs sequential reference")

    # the static always-evict variant (flood_gate=False — what the vmapped
    # sequence paths compile) must match the gated program bit-for-bit
    cnt_a, pk_a = kb.bin_chunk_kernel(
        jnp.zeros((npix,), jnp.uint32), jnp.zeros((npix,), jnp.uint32),
        jnp.asarray(flat), jnp.asarray(packed),
        npix=npix, section=1 << seclog, interpret=interpret, flood_gate=False,
    )
    ok_a = (np.asarray(cnt_a)[:npix] == got_c).all() and (
        np.asarray(pk_a)[:npix] == got_p).all()
    log(f"always-evict (vmapped-path) exact: {ok_a}")
    if not ok_a:
        raise AssertionError("KERNEL flood_gate=False mismatch vs gated")

    # EXACT_KERNEL: full-f32 planes + strict z-test with earliest-wins ties
    z = rng.normal(0, 0.5, n).astype(np.float32)
    z[rng.random(n) < 0.02] = -2.0  # below sentinel: counted, never wins
    # quantize z so exact ties occur and exercise the stable-order path
    z = np.round(z * 64) / 64
    # give half the pixel-0 flood a never-winning z (-inf, like the real
    # NaN quirk); the other half keeps real z and must still resolve ties
    # in stream order — the realistic hard case for EXACT under floods
    # (EXACT deliberately does NOT evict: measured -5.5% on solar-sail,
    # docs/KERNEL_NOTES.md)
    p0 = np.nonzero(flat == 0)[0]
    z[p0[: len(p0) // 2]] = -np.inf
    val = rng.random(n).astype(np.float32)
    cnt_e = jnp.zeros((npix,), jnp.uint32)
    st_e = jnp.zeros((npix,), jnp.float32)
    zb_e = jnp.full((npix,), -1.0, jnp.float32)
    t0 = time.perf_counter()
    cnt_e, st_e, zb_e = kb.bin_chunk_kernel_exact(
        cnt_e, st_e, zb_e, jnp.asarray(flat), jnp.asarray(z), jnp.asarray(val),
        npix=npix, section=1 << seclog, interpret=interpret,
    )
    log(f"exact compile+run: {time.perf_counter() - t0:.1f}s")
    ec = np.zeros(npix + 1, np.uint64)
    es = np.zeros(npix + 1, np.float32)
    ez = np.full(npix + 1, -1.0, np.float32)
    for f, zz, vv in zip(flat, z, val):
        ec[f] += 1
        if zz > ez[f]:
            ez[f] = zz
            es[f] = vv
    ok_ec = (np.asarray(cnt_e) == ec[:npix].astype(np.uint32)).all()
    ok_ez = (np.asarray(zb_e) == ez[:npix]).all()
    ok_es = (np.asarray(st_e) == es[:npix]).all()
    log(f"exact: count {ok_ec}  zbuf {ok_ez}  steps {ok_es}")
    if not (ok_ec and ok_ez and ok_es):
        bad = np.nonzero(np.asarray(st_e) != es[:npix])[0][:5]
        log(f"steps mismatches: {bad} {np.asarray(st_e)[bad]} {es[bad]}")
        raise AssertionError("EXACT_KERNEL mismatch vs sequential reference")

    # EXACT16_KERNEL: same z-test discipline at 16-bit bucket granularity,
    # f16 values; verified bit-for-bit against a sequential reference that
    # applies the documented quantizer (bucket lower edge, strict >,
    # earliest-wins bucket ties)
    u = z.astype(np.float32)
    u = np.where(u == 0.0, np.float32(0.0), u)  # kernel canonicalizes -0.0
    ub = u.view(np.uint32)
    mono = np.where(ub >> 31 == 1, ~ub, ub | np.uint32(0x80000000))
    edge = ((mono >> 16) << 16).astype(np.uint32)
    z_q = np.where(edge < 0x80000000, ~edge,
                   edge & np.uint32(0x7FFFFFFF)).astype(np.uint32).view(np.float32)
    v16 = val.astype(np.float16).astype(np.float32)
    v16bits = val.astype(np.float16).view(np.uint16)
    live = u > -1.0
    for ties in ("value", "earliest"):
        ec16 = np.zeros(npix + 1, np.uint64)
        es16 = np.zeros(npix + 1, np.float32)
        ez16 = np.full(npix + 1, -1.0, np.float32)
        if ties == "earliest":
            for f, ok, zz, vv in zip(flat, live, z_q, v16):
                ec16[f] += 1
                if ok and zz > ez16[f]:
                    ez16[f] = zz
                    es16[f] = vv
        else:
            # within the chunk: smallest f16 bit-pattern of the top bucket
            best = {}
            for i, (f, ok, kk, vb) in enumerate(zip(flat, live, mono >> 16, v16bits)):
                ec16[f] += 1
                if not ok:
                    continue
                key = (-int(kk), int(vb))
                if f not in best or key < best[f][0]:
                    best[f] = (key, i)
            for f, (_, i) in best.items():
                ez16[f] = z_q[i]
                es16[f] = v16[i]
        cnt_q = jnp.zeros((npix,), jnp.uint32)
        st_q = jnp.zeros((npix,), jnp.float32)
        zb_q = jnp.full((npix,), -1.0, jnp.float32)
        t0 = time.perf_counter()
        cnt_q, st_q, zb_q = kb.bin_chunk_kernel_exact16(
            cnt_q, st_q, zb_q, jnp.asarray(flat), jnp.asarray(z), jnp.asarray(val),
            npix=npix, section=1 << seclog, interpret=interpret, ties=ties,
        )
        log(f"exact16[{ties}] compile+run: {time.perf_counter() - t0:.1f}s")
        ok_qc = (np.asarray(cnt_q) == ec16[:npix].astype(np.uint32)).all()
        ok_qz = (np.asarray(zb_q) == ez16[:npix]).all()
        ok_qs = (np.asarray(st_q) == es16[:npix]).all()
        log(f"exact16[{ties}]: count {ok_qc}  zbuf {ok_qz}  steps {ok_qs}")
        if not (ok_qc and ok_qz and ok_qs):
            bad = np.nonzero(np.asarray(st_q) != es16[:npix])[0][:5]
            log(f"exact16 steps mismatches: {bad} {np.asarray(st_q)[bad]} {es16[bad]}")
            raise AssertionError(
                f"EXACT16_KERNEL[{ties}] mismatch vs quantized sequential reference")

    # DEPTH_KERNEL: per-pixel max z through the same machinery
    zb_d = jnp.full((npix,), -1.0, jnp.float32)
    (zb_d,) = kb.bin_chunk_kernel_depth(
        zb_d, jnp.asarray(flat), jnp.asarray(z),
        npix=npix, section=1 << seclog, interpret=interpret,
    )
    dz = np.full(npix + 1, -1.0, np.float32)
    for f, zz in zip(flat, z):
        dz[f] = max(dz[f], zz)
    ok_d = (np.asarray(zb_d) == dz[:npix]).all()
    log(f"depth: zbuf {ok_d}")
    if not ok_d:
        raise AssertionError("DEPTH_KERNEL mismatch vs sequential reference")


def main() -> int:
    from strange_attractor_tpu.utils.profiling import (
        enable_compilation_cache, force_cpu_if_requested,
    )

    # honor JAX_PLATFORMS/JAX_PLATFORM_NAME=cpu before the first backend
    # touch: the env vars alone do not stop the tunneled TPU plugin's init,
    # which hangs forever during an outage (CLAUDE.md round-3 learnings) —
    # this is also the only way to reach the interpret-mode fallback by env
    force_cpu_if_requested()

    if "--x64" in sys.argv:
        # jax_enable_x64 changes Mosaic lowering in ways interpret mode
        # cannot catch (i64 fori counters, floor_divide recursion, i64
        # index-map constants, i64 dynamic_rotate shifts — each broke the
        # compiled kernel once); certify the compiled path under x64 too.
        # Must be set before JAX initializes, hence before anything else.
        sys.argv.remove("--x64")
        jax.config.update("jax_enable_x64", True)

    enable_compilation_cache()
    from strange_attractor_tpu.ops import kernel_binning as kb

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    seclog = int(sys.argv[2]) if len(sys.argv) > 2 else 17
    npix = 1920 * 1080
    interpret = jax.default_backend() != "tpu"
    if interpret:
        print("WARNING: no TPU visible — running in interpreter mode")
        n = min(n, 1 << 13)

    try:
        certify_kernels(n, seclog, npix, interpret)
    except AssertionError as e:
        print(f"FAIL: {e}")
        return 1

    if not interpret:
        # throughput: in-jit repetition buries the ~4ms dispatch latency.
        # NOTE: this is the legacy flood-free stream shape (fresh seed-0
        # draws), NOT the certification's arrays — certify_kernels now
        # injects a 35% pixel-0 flood and consumes an extra rng draw, so
        # rates here stay comparable with pre-flood historical numbers in
        # docs/KERNEL_NOTES.md rather than with the cert workload.
        rng = np.random.default_rng(0)
        flat = rng.integers(0, npix, n).astype(np.int32)
        flat[rng.random(n) < 0.02] = npix
        packed = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
        z = rng.normal(0, 0.5, n).astype(np.float32)
        z[rng.random(n) < 0.02] = -2.0
        z = np.round(z * 64) / 64
        val = rng.random(n).astype(np.float32)
        fj, pj = jnp.asarray(flat), jnp.asarray(packed)
        cnt = jnp.zeros((npix,), jnp.uint32)
        pk = jnp.zeros((npix,), jnp.uint32)

        @jax.jit
        def pipe(cnt, pk):
            def body(c, _):
                cnt, pk = c
                f = fj ^ (cnt[0] & 1).astype(jnp.int32)
                return kb.bin_chunk_kernel(
                    cnt, pk, f, pj, npix=npix, section=1 << seclog
                ), None

            (cnt, pk), _ = lax.scan(body, (cnt, pk), None, length=16)
            return cnt, pk

        out = pipe(cnt, pk)
        float(out[0][0])
        t0 = time.perf_counter()
        out = pipe(cnt, pk)
        float(out[0][0])
        ns = (time.perf_counter() - t0) / (16 * n) * 1e9
        print(f"sort+apply: {ns:.2f} ns/pt ({1e3 / ns:.0f}M pts/s) at section 2^{seclog}")

        zj, vj = jnp.asarray(z), jnp.asarray(val)
        cnt_e = jnp.zeros((npix,), jnp.uint32)
        st_e = jnp.zeros((npix,), jnp.float32)
        zb_e = jnp.full((npix,), -1.0, jnp.float32)

        @jax.jit
        def pipe_exact(cnt, st, zb):
            def body(c, _):
                cnt, st, zb = c
                f = fj ^ (cnt[0] & 1).astype(jnp.int32)
                return kb.bin_chunk_kernel_exact(
                    cnt, st, zb, f, zj, vj, npix=npix, section=1 << seclog
                ), None

            (cnt, st, zb), _ = lax.scan(body, (cnt, st, zb), None, length=16)
            return cnt, st, zb

        out = pipe_exact(cnt_e, st_e, zb_e)
        float(out[0][0])
        t0 = time.perf_counter()
        out = pipe_exact(cnt_e, st_e, zb_e)
        float(out[0][0])
        ns = (time.perf_counter() - t0) / (16 * n) * 1e9
        print(f"exact sort+apply: {ns:.2f} ns/pt ({1e3 / ns:.0f}M pts/s)")
    print("check_kernels: OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
