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

        nx, ny, nz = self.step_xyz(p[..., 0], p[..., 1], p[..., 2])
        return jnp.stack([nx, ny, nz], axis=-1)

    def step_xyz(self, x, y, z):
        """Component form of :meth:`step` — the hot-path variant.

        (lanes, 3) arrays tile as (8, 128) on TPU with a 3-wide lane
        dimension, wasting 125/128 of every VPU op; the render loop keeps
        x/y/z as separate (lanes,) arrays instead and calls this directly
        (docs/KERNEL_NOTES.md round-2).
        """
        import jax.numpy as jnp

        dt = x.dtype
        one = jnp.ones_like(x)
        monoms = (one, x, x * x, x * y, x * z, y, y * y, y * z, z, z * z)

        def dot(coeffs):
            acc = jnp.asarray(coeffs[0], dt) * monoms[0]
            for c, m in zip(coeffs[1:], monoms[1:]):
                acc = acc + jnp.asarray(c, dt) * m
            return acc

        return dot(self.x), dot(self.y), dot(self.z)

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


@dataclasses.dataclass(frozen=True)
class Lorenz:
    """Lorenz system integrated with a fixed-step RK4 — a continuous-time
    attractor demonstrating that the :class:`Attractor` protocol is not tied
    to polynomial maps (the reference's trait makes the same point,
    src/lib.rs:562-564: "You can always implement Attractor yourself!").

    One ``step`` = one RK4 step of size ``dt`` of
    dx=sigma(y-x), dy=x(rho-z)-y, dz=xy-beta*z.
    """

    sigma: float = 10.0
    rho: float = 28.0
    beta: float = 8.0 / 3.0
    dt: float = 0.005

    def _deriv(self, p, xp):
        x, y, z = p[..., 0], p[..., 1], p[..., 2]
        dx = self.sigma * (y - x)
        dy = x * (self.rho - z) - y
        dz = x * y - self.beta * z
        return xp.stack([dx, dy, dz], axis=-1)

    def _rk4(self, p, xp):
        h = p.dtype.type(self.dt) if xp is np else self.dt
        k1 = self._deriv(p, xp)
        k2 = self._deriv(p + 0.5 * h * k1, xp)
        k3 = self._deriv(p + 0.5 * h * k2, xp)
        k4 = self._deriv(p + h * k3, xp)
        return p + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)

    def step(self, p):
        import jax.numpy as jnp

        return self._rk4(p, jnp).astype(p.dtype)

    def step_numpy(self, p: np.ndarray) -> np.ndarray:
        return self._rk4(p, np).astype(p.dtype)

    def fingerprint(self) -> bytes:
        return b"lorenz:" + np.asarray(
            [self.sigma, self.rho, self.beta, self.dt], np.float64
        ).tobytes()


def as_xyz_step(attractor):
    """(x, y, z) -> (x, y, z) step function for the hot path.

    Uses the attractor's native ``step_xyz`` when it defines one; otherwise
    adapts the protocol ``step`` by stacking (custom attractors keep working
    at the cost of the padded (lanes, 3) layout).
    """
    native = getattr(attractor, "step_xyz", None)
    if native is not None:
        return native

    def adapted(x, y, z):
        import jax.numpy as jnp

        p = attractor.step(jnp.stack([x, y, z], axis=-1))
        return p[..., 0], p[..., 1], p[..., 2]

    return adapted
