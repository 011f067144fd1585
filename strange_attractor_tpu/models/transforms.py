"""Color transforms: map (delta, screen-space point, view) -> palette position.

Mirrors the reference's ``config::color_transforms`` module
(src/lib.rs:498-559). A transform is any callable
``transform(delta, screen, view) -> value`` where ``delta`` and ``screen`` are
``(..., 3)`` arrays and ``value`` is ``(...,)``; it is traced straight into
the render kernel. Returned values should land in [0, 1) — the palette
interpolation clamps anything outside (src/lib.rs:442-449).
"""

from __future__ import annotations

import dataclasses

import numpy as np

# cos/sin of 45.5 degrees = 91*pi/360 rad, the constants hardcoded by the
# reference (src/lib.rs:524-536).
_COS_45_5 = 0.7009092642998509
_SIN_45_5 = 0.7132504491541816


def _magnitude(v, xp):
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return xp.sqrt(x * x + y * y + z * z)


@dataclasses.dataclass(frozen=True)
class AdjustedVelocity:
    """``(|delta| + offset) * factor`` (reference: src/lib.rs:506-516)."""

    offset: float
    factor: float

    def __call__(self, delta, screen, view):
        import jax.numpy as jnp

        dt = delta.dtype
        return (_magnitude(delta, jnp) + jnp.asarray(self.offset, dt)) * jnp.asarray(
            self.factor, dt
        )

    def xyz(self, dx, dy, dz, sx, sy, sz, view):
        """Component form (hot path — avoids the padded (lanes, 3) layout)."""
        import jax.numpy as jnp

        dt = dx.dtype
        mag = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        return (mag + jnp.asarray(self.offset, dt)) * jnp.asarray(self.factor, dt)

    def numpy(self, delta, screen, view):
        dt = delta.dtype.type
        return (_magnitude(delta, np) + dt(self.offset)) * dt(self.factor)

    def fingerprint(self) -> bytes:
        return f"adjvel:{self.offset!r}:{self.factor!r}".encode()


def _poisson_saturne_part_terms(p, cc_x, cc_y):
    """The rotated x2 used by the part classifier (src/lib.rs:538-539).

    Quirk preserved exactly: ``view.center_camera.y`` is added to ``p.z`` —
    the same x/y/z mismatch as the projection.
    """
    return (p[..., 0] + cc_x) * _COS_45_5 + (p[..., 2] + cc_y) * _SIN_45_5


@dataclasses.dataclass(frozen=True)
class PoissonSaturneTransform:
    """The poisson-saturne classifier transform (reference: src/lib.rs:520-558).

    Classifies the screen-space point into one of two attractor "parts" via
    four half-plane tests (src/lib.rs:542-551), then blends the part index
    with |delta|: ``((part + |delta|) / 2 - 0.1) / 0.9`` (src/lib.rs:556-557).
    """

    def __call__(self, delta, screen, view):
        import jax.numpy as jnp

        dt = delta.dtype
        x2 = _poisson_saturne_part_terms(
            screen, jnp.asarray(view.center_camera[0], dt), jnp.asarray(view.center_camera[1], dt)
        )
        y = screen[..., 1]
        outside = (
            (x2 < -0.0839)
            | (10.55 * x2 + y < 0.46 - 1.0941)
            | (1.0426 * x2 + y < 0.179 - 0.1576)
            | (0.5139 * x2 - y > -0.04 - 0.04092)
        )
        part = jnp.where(outside, jnp.asarray(0.0, dt), jnp.asarray(1.0, dt))
        color = (part + _magnitude(delta, jnp)) / 2.0
        return (color - jnp.asarray(0.1, dt)) / jnp.asarray(0.9, dt)

    def xyz(self, dx, dy, dz, sx, sy, sz, view):
        """Component form (hot path). Same math/quirk as ``__call__``."""
        import jax.numpy as jnp

        dt = dx.dtype
        x2 = (sx + jnp.asarray(view.center_camera[0], dt)) * _COS_45_5 + (
            sz + jnp.asarray(view.center_camera[1], dt)
        ) * _SIN_45_5
        outside = (
            (x2 < -0.0839)
            | (10.55 * x2 + sy < 0.46 - 1.0941)
            | (1.0426 * x2 + sy < 0.179 - 0.1576)
            | (0.5139 * x2 - sy > -0.04 - 0.04092)
        )
        part = jnp.where(outside, jnp.asarray(0.0, dt), jnp.asarray(1.0, dt))
        color = (part + jnp.sqrt(dx * dx + dy * dy + dz * dz)) / 2.0
        return (color - jnp.asarray(0.1, dt)) / jnp.asarray(0.9, dt)

    def numpy(self, delta, screen, view):
        dt = delta.dtype.type
        x2 = _poisson_saturne_part_terms(screen, dt(view.center_camera[0]), dt(view.center_camera[1]))
        y = screen[..., 1]
        outside = (
            (x2 < dt(-0.0839))
            | (dt(10.55) * x2 + y < dt(0.46 - 1.0941))
            | (dt(1.0426) * x2 + y < dt(0.179 - 0.1576))
            | (dt(0.5139) * x2 - y > dt(-0.04 - 0.04092))
        )
        part = np.where(outside, dt(0.0), dt(1.0))
        color = (part + _magnitude(delta, np)) / dt(2.0)
        return (color - dt(0.1)) / dt(0.9)

    def fingerprint(self) -> bytes:
        return b"poisson-saturne-transform"


#: Singleton matching the reference's free function ``color_transforms::poisson_saturne``.
poisson_saturne_transform = PoissonSaturneTransform()


def as_xyz_transform(transform):
    """(dx, dy, dz, sx, sy, sz, view) -> value for the hot path.

    Uses the transform's native ``xyz`` when it defines one; otherwise
    adapts the protocol ``(delta, screen, view)`` callable by stacking
    (user-supplied closures keep working at the padded-layout cost).
    """
    native = getattr(transform, "xyz", None)
    if native is not None:
        return native

    def adapted(dx, dy, dz, sx, sy, sz, view):
        import jax.numpy as jnp

        delta = jnp.stack([dx, dy, dz], axis=-1)
        screen = jnp.stack([sx, sy, sz], axis=-1)
        return transform(delta, screen, view)

    return adapted
