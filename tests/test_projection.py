"""Unit tests: rotation matrix and projection quirks vs hand values/oracle."""

import math

import numpy as np

import jax.numpy as jnp

from strange_attractor_tpu import presets
from strange_attractor_tpu.ops.projection import (
    EulerAxisRotation,
    camera_params,
    project,
    rotate_point,
)


def test_rotation_matrix_z_axis():
    # 90deg around z: x -> y, y -> -x ... using the reference's Rodrigues form
    r = EulerAxisRotation(axis=(0.0, 0.0, 1.0), rotation=math.pi / 2).to_rotation_matrix()
    np.testing.assert_allclose(r @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-12)
    np.testing.assert_allclose(r @ np.array([0.0, 1, 0]), [-1, 0, 0], atol=1e-12)


def test_rotation_matrix_orthogonal_when_unit_axis():
    r = EulerAxisRotation(
        axis=(0.304289493528802, 0.760492682863655, 0.573636455813981),
        rotation=1.78268191887446,
    ).to_rotation_matrix()
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)
    assert abs(np.linalg.det(r) - 1.0) < 1e-12


def test_rotation_matrix_not_normalized_by_default():
    # the release-build reference skips normalization (src/lib.rs:181-183)
    raw = EulerAxisRotation(axis=(0.02466, 0.4618, -0.54789), rotation=2.2195)
    r = raw.to_rotation_matrix()
    with np.errstate(all="ignore"):
        assert not np.allclose(r @ r.T, np.eye(3), atol=1e-6)
    rn = EulerAxisRotation(
        axis=raw.axis, rotation=raw.rotation, normalize=True
    ).to_rotation_matrix()
    np.testing.assert_allclose(rn @ rn.T, np.eye(3), atol=1e-12)


def test_projection_pairing_quirk():
    """cc.y pairs with z and cc.z pairs with y (src/lib.rs:776-786)."""
    cfg = presets.poisson_saturne(width=100, height=50)
    view = cfg.view
    cam = camera_params(view, 0.7, cfg.width, cfg.height)
    sx = jnp.asarray([0.1], jnp.float32)
    sy = jnp.asarray([-0.2], jnp.float32)
    sz = jnp.asarray([0.3], jnp.float32)
    cos_v = jnp.float32(math.cos(0.7))
    sin_v = jnp.float32(math.sin(0.7))
    fi, fj, z2 = project(cam, sx, sy, sz, cos_v, sin_v, jnp)

    ccx, ccy, ccz = view.center_camera
    x2 = (0.1 + ccx) * math.cos(0.7) + (0.3 + ccy) * math.sin(0.7)
    z2_want = (0.1 + ccx) * math.sin(0.7) - (0.3 + ccy) * math.cos(0.7)
    i_want = (0.5 / view.scale - x2) * (100 * view.scale)
    j_want = 50 / 2 - (-0.2 + ccz) * (100 * view.scale)
    np.testing.assert_allclose(float(fi[0]), i_want, rtol=1e-5)
    np.testing.assert_allclose(float(fj[0]), j_want, rtol=1e-5)
    np.testing.assert_allclose(float(z2[0]), z2_want, rtol=1e-4, atol=1e-6)


def test_rotate_point_matches_matrix():
    cfg = presets.solar_sail()
    cam = camera_params(cfg.view, 0.0, cfg.width, cfg.height)
    p = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)), jnp.float32)
    sx, sy, sz = rotate_point(cam, p, jnp)
    m = np.asarray(cam.rotation_matrix)
    want = np.asarray(p) @ m.T
    np.testing.assert_allclose(
        np.stack([sx, sy, sz], -1), want.astype(np.float32), rtol=1e-5, atol=1e-6
    )
