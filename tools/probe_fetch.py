"""Is the tunnel host fetch per-BYTE or per-ELEMENT bound? (round 5)

The banded delivery packs the 8-bit deliverable into u32 words because the
narrow-dtype fetch measured 2.7x slower (round 3) — which is evidence for
per-element cost, not per-byte. If the transport is element-bound, packing
into u64 (or wider) should halve the fetch leg again; if byte-bound, u64
changes nothing. This probe times device_get of the SAME 5.9 MB payload
(the flagship 8-bit RGB frame size) at every element width, plus the
16-bit deliverable size, and band splits.

Method notes (CLAUDE.md): each rep re-creates the device array (jax caches
host copies on the Array); sync by fetching a scalar first so the timed
region is pure transfer; best and median of N reported.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_fetch(make, reps: int = 5) -> dict:
    import jax
    import numpy as np

    times = []
    for _ in range(reps):
        arr = make()
        float(jax.device_get(arr.ravel()[0]))  # sync the producing dispatch
        t0 = time.perf_counter()
        host = np.asarray(jax.device_get(arr))
        times.append(time.perf_counter() - t0)
        del host
    times.sort()
    return {"best_s": round(times[0], 4),
            "med_s": round(times[len(times) // 2], 4)}


def main() -> None:
    import jax
    import jax.numpy as jnp

    nbytes = 1920 * 1080 * 3  # the flagship 8-bit RGB deliverable + pad
    nbytes -= nbytes % 8

    key = jax.random.PRNGKey(0)

    def dev_u8():
        return jax.random.randint(key, (nbytes,), 0, 255, jnp.uint8)

    base = dev_u8()

    results = {"payload_mb": round(nbytes / 1e6, 2),
               "device": str(jax.devices()[0])}
    results["u8"] = _time_fetch(lambda: base + 0)
    results["u16"] = _time_fetch(
        lambda: jax.lax.bitcast_convert_type((base + 0).reshape(-1, 2), jnp.uint16))
    results["u32"] = _time_fetch(
        lambda: jax.lax.bitcast_convert_type((base + 0).reshape(-1, 4), jnp.uint32))
    # f32 has the same element width as u32 — a pure dtype-handling check
    results["f32"] = _time_fetch(
        lambda: jax.lax.bitcast_convert_type((base + 0).reshape(-1, 4), jnp.float32))
    # u64 needs x64 for the HOST-side dtype; the device bitcast itself is
    # fine either way. (Moot since the byte-bound finding, kept for
    # completeness — docs/KERNEL_NOTES.md round 5.)
    try:
        with jax.enable_x64(True):
            u64fn = jax.jit(
                lambda b: jax.lax.bitcast_convert_type(b.reshape(-1, 8), jnp.uint64))
            arr64 = u64fn(base)
            assert arr64.dtype == jnp.uint64, arr64.dtype
            results["u64"] = _time_fetch(lambda: u64fn(base + 0))
    except Exception as e:  # pragma: no cover - probe robustness
        results["u64"] = {"error": repr(e)}

    # band splits of the u32 payload: per-transfer overhead vs overlap
    for bands in (2, 4, 8):
        def make_parts(bands=bands):
            flat = jax.lax.bitcast_convert_type((base + 0).reshape(-1, 4),
                                                jnp.uint32)
            return [flat[k * flat.shape[0] // bands:
                         (k + 1) * flat.shape[0] // bands] for k in range(bands)]

        import numpy as np

        times = []
        for _ in range(5):
            parts = make_parts()
            float(jax.device_get(parts[0][0]))
            t0 = time.perf_counter()
            for p in parts:
                p.copy_to_host_async()
            for p in parts:
                np.asarray(jax.device_get(p))
            times.append(time.perf_counter() - t0)
        times.sort()
        results[f"u32_bands{bands}"] = {"best_s": round(times[0], 4),
                                        "med_s": round(times[len(times) // 2], 4)}

    print(json.dumps(results))


if __name__ == "__main__":
    main()
