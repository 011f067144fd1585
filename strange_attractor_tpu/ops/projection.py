"""Rotation and camera projection math.

Host-side (numpy, float64) precomputation of the Euler-axis rotation matrix —
the reference computes it once per render (src/lib.rs:755) — and the traced
(jnp) per-point camera rotation + projection used inside the hot loop
(src/lib.rs:776-786).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np


@dataclasses.dataclass(frozen=True)
class EulerAxisRotation:
    """Euler axis + angle rotation (reference: src/lib.rs:169-196).

    ``axis`` is a 3-tuple; ``rotation`` is the angle around it in radians.

    Note: the reference only normalizes the axis in *debug* builds
    (src/lib.rs:181-183); release builds — what users actually run — build the
    matrix from the raw axis. The solar-sail preset's axis is NOT unit length
    (|axis| ≈ 0.717, src/lib.rs:373), so its published images come from the
    unnormalized matrix. We therefore default to ``normalize=False`` to match
    release-build output exactly.
    """

    axis: tuple[float, float, float]
    rotation: float
    normalize: bool = False

    def __post_init__(self):
        if self.normalize and not math.sqrt(sum(v * v for v in self.axis)) > 0.0:
            # normalize=True is this port's own extension (the reference
            # release build never normalizes), so fail fast with context
            # instead of a bare ZeroDivisionError at render time
            raise ValueError(
                f"normalize=True requires a nonzero rotation axis, got {self.axis}"
            )

    def to_rotation_matrix(self) -> np.ndarray:
        """Rodrigues-form 3x3 matrix, float64 (reference: src/lib.rs:179-196).

        The reference names the rows ``columns`` but uses them as matrix rows
        in ``mul_right`` (src/lib.rs:208-215): ``out = M @ v`` with
        ``out.x = m[0] . v``. We return a standard row-major matrix for
        ``screen = R @ p``.
        """
        x, y, z = self.axis
        if self.normalize:
            n = math.sqrt(x * x + y * y + z * z)
            x, y, z = x / n, y / n, z / n
        c = math.cos(self.rotation)
        c1 = 1.0 - c
        s = math.sin(self.rotation)
        return np.array(
            [
                [c + x * x * c1, x * y * c1 - z * s, x * z * c1 + y * s],
                [y * x * c1 + z * s, c + y * y * c1, y * z * c1 - x * s],
                [z * x * c1 - y * s, z * y * c1 + x * s, c + z * z * c1],
            ],
            dtype=np.float64,
        )


@dataclasses.dataclass(frozen=True)
class CameraParams:
    """Per-frame scalar constants hoisted out of the hot loop.

    Mirrors the reference's precomputation block (src/lib.rs:754-764).
    All values float64 on host; cast to the compute dtype at trace time.
    """

    rotation_matrix: tuple  # 3x3 nested tuple, row-major
    cos_angle: float
    sin_angle: float
    center_camera: tuple[float, float, float]
    width: int
    height: int
    width_scaled: float  # width * scale            (src/lib.rs:763)
    scale_adjusted_mid: float  # 0.5 / scale        (src/lib.rs:764)


def camera_params(view, angle: float, width: int, height: int) -> CameraParams:
    """Build :class:`CameraParams` from a view + camera angle (radians)."""
    rot = view.rotation.to_rotation_matrix()
    return CameraParams(
        rotation_matrix=tuple(tuple(r) for r in rot.tolist()),
        cos_angle=math.cos(angle),
        sin_angle=math.sin(angle),
        center_camera=tuple(float(v) for v in view.center_camera),
        width=width,
        height=height,
        width_scaled=float(width) * view.scale,
        scale_adjusted_mid=0.5 / view.scale,
    )


def rotate_point(cam: CameraParams, p, jnp):
    """screen_space = R @ p, elementwise (reference: src/lib.rs:773, 208-215).

    ``p`` is (..., 3); returns (sx, sy, sz) each (...,). Written as explicit
    multiply-adds (not a matmul) so a batch of lanes runs on the VPU and the
    operation order matches the reference / oracle.
    """
    return rotate_xyz(cam, p[..., 0], p[..., 1], p[..., 2], jnp)


def rotate_xyz(cam: CameraParams, x, y, z, jnp):
    """Component form of :func:`rotate_point` (hot path: the render loop
    keeps lane coordinates as separate (lanes,) arrays — see
    models.attractors.PolynomialSprott2Degree.step_xyz)."""
    m = cam.rotation_matrix
    dt = x.dtype
    sx = jnp.asarray(m[0][0], dt) * x + jnp.asarray(m[0][1], dt) * y + jnp.asarray(m[0][2], dt) * z
    sy = jnp.asarray(m[1][0], dt) * x + jnp.asarray(m[1][1], dt) * y + jnp.asarray(m[1][2], dt) * z
    sz = jnp.asarray(m[2][0], dt) * x + jnp.asarray(m[2][1], dt) * y + jnp.asarray(m[2][2], dt) * z
    return sx, sy, sz


def project(cam: CameraParams, sx, sy, sz, cos_v, sin_v, jnp):
    """Camera-angle rotate + project to pixel coordinates.

    Replicates the reference exactly, *including* the cc.y <-> z and
    cc.z <-> y pairing quirk (src/lib.rs:776-786):

        x2 = (sx + cc.x) * cos + (sz + cc.y) * sin
        z2 = (sx + cc.x) * sin - (sz + cc.y) * cos
        i  = (0.5/scale - x2) * width * scale
        j  = height/2 - (sy + cc.z) * width * scale

    Returns (fi, fj, z2) as float arrays. ``cos_v``/``sin_v`` are traced
    scalars so animation sequences can vary the angle without recompiling.
    """
    dt = sx.dtype
    ccx = jnp.asarray(cam.center_camera[0], dt)
    ccy = jnp.asarray(cam.center_camera[1], dt)
    ccz = jnp.asarray(cam.center_camera[2], dt)
    xc = sx + ccx
    zc = sz + ccy  # quirk: camera .y pairs with the z screen coordinate
    x2 = xc * cos_v + zc * sin_v
    z2 = xc * sin_v - zc * cos_v
    fi = (jnp.asarray(cam.scale_adjusted_mid, dt) - x2) * jnp.asarray(cam.width_scaled, dt)
    fj = jnp.asarray(cam.height / 2.0, dt) - (sy + ccz) * jnp.asarray(cam.width_scaled, dt)
    return fi, fj, z2
