"""Benchmark: the README reference workloads end-to-end on one chip.

Workload 1 (the headline): poisson-saturne, 1e9 iterations, 1920x1080,
brightness -0.25 (reference README.md:72-73). Workload 2 (recorded in the
``solar_sail`` sub-object): solar-sail, 1e9 iterations, 1800x2000,
brightness -0.1 (reference README.md:74-75).

Prints ONE JSON line:
  {"metric": "map iterations/sec/chip", "value": N, "unit": "iters/s",
   "vs_baseline": N / 5e8, "wall_s": ..., "phases": {...},
   "solar_sail": {...}, ...}

vs_baseline is measured against the BASELINE.md north-star rate of 5e8
iterations/sec; > 1.0 beats the target. ``wall_s`` is honest END-TO-END:
fresh state -> render -> colorize -> device-side format conversion -> host
fetch of the deliverable frame, with the per-phase split in ``phases``.
The deliverable is the 8-bit RGB frame (the reference CLI's --8-bit export,
src/bin/main.rs:52-57, converted on device with identical rounding);
``wall_16bit_rgb_s`` additionally reports the run with the reference's
default no-flag deliverable (16-bit RGB), whose 12.4 MB host fetch is pure
tunnel bandwidth on this dev platform.

Attribution fields (round-4 verdict item 3): ``wall_runs`` records every
wall attempt and ``phase_runs`` every per-phase-synced attempt, so a slow
artifact day decomposes from the JSON alone (render regression vs tunnel
weather — the tunnel's fetch leg has slow WINDOWS of ~0.5 s vs the usual
0.15 that can outlast a whole process, measured 2026-08-19).

Before any timed run the compiled Mosaic kernels are certified bit-exact
against a sequential numpy reference (KERNEL + EXACT_KERNEL + EXACT16_KERNEL
+ DEPTH_KERNEL on 2^20 random points at the production section size) — a
wrong-but-fast kernel fails the bench instead of recording a number.

Env knobs: ``BENCH_ITERS`` overrides the iteration count (both workloads);
``BENCH_SOLAR=0`` skips workload 2 (it only runs on TPU anyway).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# the north star: 1e9-iteration frame in under 2 s on one chip
BASELINE_ITERS_PER_SEC = 5e8


def _probe_backend(timeout_s: float = 600.0):
    """Initialize the JAX backend with a hard deadline.

    During a tunnel outage the axon TPU plugin's init hangs *forever* (no
    env var prevents it — jax inits every plugin before choosing a
    platform, CLAUDE.md round-3 learnings). A bench that hangs records
    nothing; a bench that emits an explicit outage marker records the
    outage. The probe runs ``jax.devices()`` on a daemon thread; its result
    is process-cached, so the main thread's subsequent use is instant.
    """
    import threading

    out: list = []

    def probe():
        import jax

        out.append(jax.devices())

    err: list = []

    def run():
        try:
            probe()
        except BaseException as e:  # surface fast-failing plugins, not IndexError
            err.append(e)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        print(
            json.dumps(
                {
                    "metric": "map iterations/sec/chip",
                    "value": 0,
                    "unit": "iters/s",
                    "vs_baseline": 0.0,
                    "error": f"backend init exceeded {timeout_s:.0f}s "
                             "(TPU tunnel outage); no measurement taken",
                }
            ),
            flush=True,
        )
        os._exit(1)
    if err:
        raise err[0]
    return out[0]


def _measure(cfg, *, phase_attempts: int, wall_attempts: int,
             assert_shape, check_bitcast_fetch: bool = False) -> dict:
    """Render ``cfg`` end-to-end repeatedly; return the measurement record.

    Two instruments:
    - ``phase_runs``: explicit sync between render / colorize / fetch per
      attempt, giving the per-phase split and the iters/s metric (render
      phase only). The sync round-trips (~60 ms on the tunnel) exist only
      to attribute time, so they are not charged to the deliverable.
    - ``wall_runs``: the same pipeline with NO intermediate syncs —
      colorize and the format convert enqueue behind the render and the
      banded host fetch drains the queue — i.e. what a user actually waits
      for a frame. Banded delivery (`colorize_convert_fetch`) is the same
      pipeline cli.py ships frames through: tone-map + convert in row
      bands, each band's transfer overlapped with the next band's compute
      (bit-identical to plain, asserted during warm-up).
    Best-of-N on both: the tunneled dev platform adds +/-2% render noise
    and the fetch leg has slow windows that can outlast a process.
    """
    import jax
    import numpy as np

    from strange_attractor_tpu import colorize, render
    from strange_attractor_tpu.render import (
        colorize_convert_fetch,
        plan_schedule,
        precompile,
    )
    from strange_attractor_tpu.utils.export import convert_format_device, fetch_image
    from strange_attractor_tpu.utils.profiling import RenderProfile, hard_sync

    lanes, chunk_steps, nchunks = plan_schedule(cfg)
    executed = lanes * chunk_steps * nchunks

    # the deliverable conversion, fused into one jit
    @jax.jit
    def colorize8(st):
        # 8-bit RGB deliverable (reference --8-bit, no --transparent)
        return convert_format_device(colorize(cfg, st), False, True)

    # compile warm-up: exercises both kernel variants + the colorize path.
    # The colorize warms MUST use precompile's returned state: its planes
    # come from the same remainder program as a real render's, so the
    # consumers compile for the right device layout (a mismatched layout
    # re-JITs silently on the first timed call — see precompile docstring).
    # Warm EVERY program the timed loop will execute, with the same input
    # layouts: on this platform the FIRST execute of each program in a
    # process pays the remote compile service (seconds), regardless of the
    # persistent cache.
    state = precompile(cfg)
    float(state.count.sum())
    warm8 = colorize8(state)
    hard_sync(warm8)
    if check_bitcast_fetch:
        # the timed fetch goes through the u32-bitcast fast path (~2.7x the
        # narrow-dtype transfer rate); assert it is byte-identical to the
        # direct fetch once
        np.testing.assert_array_equal(
            fetch_image(warm8), np.asarray(jax.device_get(warm8)))
    # warm the banded delivery (stats + band programs) the wall loop uses,
    # and pin it byte-identical to the plain pipeline on this very state.
    # Called twice: the first call fetches the full canvas and learns the
    # lit bbox from the delivery rider; the second exercises (and compiles,
    # untimed) the CROPPED band programs the timed wall attempts ride
    # (render.colorize_convert_fetch crop path).
    for _ in range(2):
        warm_banded = colorize_convert_fetch(cfg, state, transparent=False,
                                             eight_bit=True)
        np.testing.assert_array_equal(warm_banded, fetch_image(warm8))

    phase_runs = []
    best = None
    for _ in range(phase_attempts):
        prof = RenderProfile(iterations=executed)
        with prof.phase("render"):
            state = render(cfg, key=jax.random.PRNGKey(0))
            float(state.count.sum())  # hard sync (block_until_ready is
            # unreliable on the tunneled dev platform; a scalar fetch is not)
        with prof.phase("colorize"):
            img8 = colorize8(state)
            hard_sync(img8)
        with prof.phase("fetch"):
            img8_host = fetch_image(img8)
        phase_runs.append({k: round(v, 3) for k, v in prof.phases.items()})
        if best is None or prof.iters_per_sec > best.iters_per_sec:
            best = prof

    # re-learn the lit bbox from a REAL full-workload render and compile
    # its cropped band shapes untimed: the precompile state's support can
    # land in different snap quanta, and a timed attempt must never pay a
    # program's first-execute remote compile
    for _ in range(2):
        warm_banded = colorize_convert_fetch(cfg, state, transparent=False,
                                             eight_bit=True)
    np.testing.assert_array_equal(warm_banded, fetch_image(colorize8(state)))

    wall = None
    wall_runs = []
    for _ in range(wall_attempts):
        t0 = time.perf_counter()
        state = render(cfg, key=jax.random.PRNGKey(0))
        img8_host = colorize_convert_fetch(cfg, state, transparent=False,
                                           eight_bit=True)
        run_wall = time.perf_counter() - t0
        wall_runs.append(round(run_wall, 3))
        wall = run_wall if wall is None else min(wall, run_wall)

    assert img8_host.shape == assert_shape and img8_host.dtype == np.uint8
    assert img8_host.max() > 0

    rate = best.iters_per_sec
    rates = [round(executed / r["render"], 1) for r in phase_runs]
    return {
        "value": round(rate, 1),
        "runs": rates,
        "wall_s": round(wall, 3),
        "wall_runs": wall_runs,
        "phases": {k: round(v, 3) for k, v in best.phases.items()},
        "phase_runs": phase_runs,
        "phases_sum_s": round(best.total_seconds, 3),
        "iterations": executed,
        "_state": state,  # for the caller's supplementary measurements
        "_best": best,
    }


def main() -> None:
    from strange_attractor_tpu.utils.profiling import force_cpu_if_requested

    force_cpu_if_requested()
    _probe_backend()

    import jax
    import numpy as np

    from strange_attractor_tpu import colorize, presets
    from strange_attractor_tpu.config import BrightnessConstants, Colors
    from strange_attractor_tpu.utils.export import convert_format_device, fetch_image
    from strange_attractor_tpu.utils.profiling import enable_compilation_cache, hard_sync

    # persistent XLA cache: kernel-iteration rounds recompile nothing
    enable_compilation_cache()

    on_tpu = jax.default_backend() == "tpu"
    # full reference workload on TPU; a token run elsewhere (CPU would take
    # tens of minutes at 1e9)
    default_iters = "1e9" if on_tpu else "2e6"
    iterations = int(float(os.environ.get("BENCH_ITERS", default_iters)))
    cfg = presets.poisson_saturne(
        iterations=iterations,
        width=1920,
        height=1080,
        colors=Colors(brightness=BrightnessConstants(offset=-0.25)),
        seed=0,
        silent=True,
    )

    # certify the compiled Mosaic path bit-exact before timing anything —
    # at the production section size so the certified kernel variant is the
    # one the render dispatches (skipped off-TPU: interpret mode is covered
    # by the test suite)
    cert = "skipped (not on TPU)"
    if on_tpu:
        from tools.check_kernels import certify_kernels

        seclog = cfg.resolved_kernel_section().bit_length() - 1
        certify_kernels(n=1 << 20, seclog=seclog, npix=cfg.width * cfg.height,
                        log=lambda *_: None)
        cert = f"bit-exact (2^20 pts, section 2^{seclog})"

    flagship = _measure(cfg, phase_attempts=2, wall_attempts=6,
                        assert_shape=(1080, 1920, 3), check_bitcast_fetch=True)
    state, best = flagship.pop("_state"), flagship.pop("_best")

    # supplementary: the same end-to-end with the 16-bit RGB deliverable
    # (the fetch is 12.4 MB instead of 5.9 MB over the tunnel). Best-of-2:
    # the tunnel fetch leg alone is +/-40% run-to-run, so a single sample
    # would put far more variance on this figure than on wall_s
    @jax.jit
    def colorize16(st):
        # the reference CLI's default no-flag deliverable: 16-bit RGB
        return convert_format_device(colorize(cfg, st), False, False)

    warm16 = colorize16(state)
    hard_sync(warm16)
    fetch_image(warm16)
    # ship 16-bit through the same banded + lit-bbox-cropped delivery the
    # CLI uses (two warm calls: learn the bbox, compile the cropped bands)
    from strange_attractor_tpu.render import colorize_convert_fetch as ccf

    for _ in range(2):
        warm16_banded = ccf(cfg, state, transparent=False, eight_bit=False)
    np.testing.assert_array_equal(warm16_banded, fetch_image(warm16))
    tail16 = None
    for _ in range(2):
        t0 = time.perf_counter()
        img16_host = ccf(cfg, state, transparent=False, eight_bit=False)
        t16 = time.perf_counter() - t0
        tail16 = t16 if tail16 is None else min(tail16, t16)
    assert img16_host.shape == (1080, 1920, 3) and img16_host.dtype == np.uint16

    # workload 2 (reference README.md:74-75): solar-sail 1800x2000,
    # brightness -0.1 — full end-to-end record, same instruments. TPU-only
    # (the token CPU run would double a CI-ish bench for no signal).
    solar: dict = {"skipped": True}
    if on_tpu and os.environ.get("BENCH_SOLAR", "1") != "0":
        scfg = presets.solar_sail(
            iterations=iterations,
            width=1800,
            height=2000,
            colors=Colors(brightness=BrightnessConstants(offset=-0.1)),
            seed=0,
            silent=True,
        )
        solar = _measure(scfg, phase_attempts=2, wall_attempts=4,
                         assert_shape=(2000, 1800, 3))
        solar.pop("_state")
        solar.pop("_best")
        solar["value_unit"] = "iters/s"
        solar["deliverable"] = "8-bit RGB frame on host (10.8 MB)"

    rate = flagship["value"]
    record = {
        "metric": "map iterations/sec/chip",
        "value": rate,
        "unit": "iters/s",
        "vs_baseline": round(rate / BASELINE_ITERS_PER_SEC, 4),
        **{k: flagship[k] for k in ("runs", "wall_s", "wall_runs", "phases",
                                    "phase_runs", "phases_sum_s")},
        "deliverable": "8-bit RGB frame on host (reference --8-bit path)",
        "wall_16bit_rgb_s": round(best.phases["render"] + tail16, 3),
        "kernel_cert": cert,
        "iterations": flagship["iterations"],
        "solar_sail": solar,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
