"""Search for chaotic PolynomialSprott2Degree coefficient sets.

The reference's extension story is "write your own Attractor"
(src/lib.rs:562-564); its two shipped coefficient sets are chaoscope-style
second-degree Sprott maps. This tool reproduces Sprott's published random
search procedure (J.C. Sprott, "Strange Attractors: Creating Patterns in
Chaos", ch. 7-8: sample quadratic-map coefficients uniformly on a 0.1 grid
in [-1.2, 1.2], keep maps whose orbit stays bounded and has a positive
largest Lyapunov exponent) against OUR monomial basis — the reference's
[1, x, x^2, xy, xz, y, y^2, yz, z, z^2] rows (src/lib.rs:577-599) — so any
hit drops straight into ``--coeffs-x/y/z`` or a preset.

    python tools/find_attractors.py [n_candidates] [seed]

Prints one JSON line per keeper: coefficients, the orbit's bounding box
(for camera framing), and the Lyapunov estimate.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def step(c, p):
    x, y, z = p
    mono = np.array([1.0, x, x * x, x * y, x * z, y, y * y, y * z, z, z * z])
    return c @ mono


def lyapunov_and_bounds(c, n=20_000, warmup=1000):
    """Largest Lyapunov exponent via nearby-orbit renormalization (Sprott's
    procedure) + the orbit bounding box. Returns None for divergent or
    trivially-converging orbits."""
    p = np.array([0.05, 0.05, 0.05])
    d0 = 1e-8
    for _ in range(warmup):
        p = step(c, p)
        if not np.all(np.isfinite(p)) or np.abs(p).max() > 1e4:
            return None
    q = p + np.array([d0, 0.0, 0.0])
    lsum = 0.0
    lo = np.full(3, np.inf)
    hi = np.full(3, -np.inf)
    for k in range(n):
        p = step(c, p)
        q = step(c, q)
        if not np.all(np.isfinite(p)) or np.abs(p).max() > 1e4:
            return None
        d = np.linalg.norm(q - p)
        if d <= 0:
            return None
        lsum += np.log(d / d0)
        q = p + (q - p) * (d0 / d)  # renormalize
        lo = np.minimum(lo, p)
        hi = np.maximum(hi, p)
    lle = lsum / n
    extent = hi - lo
    if lle < 0.02 or extent.max() < 0.05 or extent.min() < 1e-3:
        return None  # fixed point / cycle / degenerate sheet
    return {"lle": float(lle), "lo": lo.tolist(), "hi": hi.tolist()}


def main() -> int:
    n_cand = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    rng = np.random.default_rng(seed)
    kept = 0
    for k in range(n_cand):
        # Sprott's 0.1-step grid in [-1.2, 1.2]
        c = rng.integers(-12, 13, (3, 10)) / 10.0
        r = lyapunov_and_bounds(c)
        if r is None:
            continue
        kept += 1
        print(json.dumps({
            "seed": seed, "index": k, "lle": round(r["lle"], 4),
            "lo": [round(v, 3) for v in r["lo"]],
            "hi": [round(v, 3) for v in r["hi"]],
            "x": c[0].tolist(), "y": c[1].tolist(), "z": c[2].tolist(),
        }), flush=True)
    print(f"# kept {kept}/{n_cand}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
