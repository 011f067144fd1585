"""Head-to-head: shared-orbit sequence frame axis as lax.scan vs jax.vmap.

Both bin identical per-frame emissions (bit-identical planes, pinned in
tests/test_sequence_shared.py); this probe settles which ORDERING the
device runs faster. The vmap batches all frames' sorts/applies into one
wide kernel per chunk but materializes every frame's emission + sort
buffers at once (~2 GB at 60 frames x 3.3M-point chunks); the scan
serializes the per-frame kernels but reuses ONE frame's buffers.

Usage: python tools/probe_shared_frame_axis.py [SEQ_FRAMES=60] [SEQ_ITERS=1e7] [REPS=3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from strange_attractor_tpu import presets
    from strange_attractor_tpu.render import (
        _canvas_body_shared, _dtype, plan_schedule, seed_key,
    )
    from strange_attractor_tpu.utils.profiling import (
        enable_compilation_cache, force_cpu_if_requested,
    )

    force_cpu_if_requested()
    enable_compilation_cache()
    on_tpu = jax.default_backend() == "tpu"
    frames = int(float(os.environ.get("SEQ_FRAMES", "60" if on_tpu else "3")))
    iters = int(float(os.environ.get("SEQ_ITERS", "1e7" if on_tpu else "2e5")))
    reps = int(os.environ.get("REPS", "3"))
    cfg = presets.poisson_saturne(iterations=iters, width=1920, height=1080,
                                  seed=0, silent=True)
    strategy = cfg.resolved_bin_strategy(jax.default_backend())
    lanes, chunk, nchunks = plan_schedule(cfg)
    dt = _dtype(cfg)
    key = seed_key(cfg)
    angles = np.radians(np.linspace(0.0, 360.0, frames, endpoint=False))
    cos_v = jnp.asarray(np.cos(angles), dt)
    sin_v = jnp.asarray(np.sin(angles), dt)

    out = {"frames": frames, "iters_per_frame": lanes * chunk * nchunks,
           "lanes": lanes, "chunk_steps": chunk, "nchunks": nchunks}
    for name, fv in (("scan", False), ("vmap", True)):
        body = _canvas_body_shared(cfg, strategy, lanes, chunk, nchunks,
                                   frame_vmap=fv)
        fn = jax.jit(lambda k, c, s: body(k, c, s)[0].sum())
        float(fn(key, cos_v, sin_v))  # warm (remote compile + execute)
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(key, cos_v, sin_v))
            dtime = time.perf_counter() - t0
            best = dtime if best is None else min(best, dtime)
        out[name + "_s"] = round(best, 3)
        out[name + "_frames_per_sec"] = round(frames / best, 2)
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
