"""Attractor map definitions.

The reference defines an ``Attractor`` trait with a single ``next_point``
method (src/lib.rs:71-77) and one concrete map, the second-degree polynomial
Sprott attractor (src/lib.rs:575-621). Here an attractor is any object with a
``step(p) -> p'`` method over ``(..., 3)`` arrays, traced into ``lax.scan`` —
the whole batch of trajectory lanes advances in one vectorized step on the
VPU, replacing the reference's per-thread scalar loop.
"""

from __future__ import annotations

import dataclasses
from typing import Protocol, runtime_checkable

import numpy as np


@runtime_checkable
class Attractor(Protocol):
    """Polymorphic chaotic map (reference trait: src/lib.rs:71-77)."""

    def step(self, p):
        """Advance ``p`` (..., 3) one map iteration; pure & traceable."""
        ...

    def fingerprint(self) -> bytes:
        """Stable bytes identifying this attractor (for jit caching)."""
        ...


@dataclasses.dataclass(frozen=True)
class PolynomialSprott2Degree:
    """Second-degree polynomial Sprott map (reference: src/lib.rs:575-621).

    The next point is three dot products of the 10-element monomial vector
    ``[1, x, x^2, xy, xz, y, y^2, yz, z, z^2]`` (src/lib.rs:602-613) with the
    coefficient rows ``x``, ``y``, ``z`` (src/lib.rs:615-619).

    ``x``/``y``/``z`` are length-10 coefficient tuples. The step is written as
    an explicit fused multiply-add chain in the same term order as the
    reference's ``sum_coefficients`` loop (src/lib.rs:588-600) so it runs as
    pure elementwise VPU work over the lane batch.
    """

    x: tuple[float, ...]
    y: tuple[float, ...]
    z: tuple[float, ...]

    def __post_init__(self):
        for name in ("x", "y", "z"):
            v = getattr(self, name)
            if len(v) != 10:
                raise ValueError(f"coefficient row {name!r} must have 10 entries, got {len(v)}")
            object.__setattr__(self, name, tuple(float(c) for c in v))

    def step(self, p):
        import jax.numpy as jnp

        x, y, z = p[..., 0], p[..., 1], p[..., 2]
        dt = x.dtype
        one = jnp.ones_like(x)
        monoms = (one, x, x * x, x * y, x * z, y, y * y, y * z, z, z * z)

        def dot(coeffs):
            acc = jnp.asarray(coeffs[0], dt) * monoms[0]
            for c, m in zip(coeffs[1:], monoms[1:]):
                acc = acc + jnp.asarray(c, dt) * m
            return acc

        return jnp.stack([dot(self.x), dot(self.y), dot(self.z)], axis=-1)

    def step_numpy(self, p: np.ndarray) -> np.ndarray:
        """Numpy twin of :meth:`step` for the CPU oracle."""
        x, y, z = p[..., 0], p[..., 1], p[..., 2]
        dt = p.dtype
        monoms = (np.ones_like(x), x, x * x, x * y, x * z, y, y * y, y * z, z, z * z)

        def dot(coeffs):
            acc = dt.type(coeffs[0]) * monoms[0]
            for c, m in zip(coeffs[1:], monoms[1:]):
                acc = acc + dt.type(c) * m
            return acc

        return np.stack([dot(self.x), dot(self.y), dot(self.z)], axis=-1)

    def fingerprint(self) -> bytes:
        return b"sprott2:" + np.asarray(self.x + self.y + self.z, np.float64).tobytes()
