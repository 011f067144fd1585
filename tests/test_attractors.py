"""Unit tests: map step and preset constants vs the numpy oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from strange_attractor_tpu import presets
from strange_attractor_tpu.models.attractors import PolynomialSprott2Degree


@pytest.mark.parametrize("preset", [presets.poisson_saturne, presets.solar_sail])
def test_step_matches_numpy_oracle(preset):
    cfg = preset()
    p = np.array([[0.05, 0.02, 0.08], [0.0, 0.0, 0.0], [-0.3, 0.4, -0.1]], np.float32)
    got = np.asarray(cfg.attractor.step(jnp.asarray(p)))
    want = cfg.attractor.step_numpy(p)
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-7)


def test_step_hand_computed():
    # identity-ish check: with x-row = e_x (coefficient on the 'x' monomial),
    # y-row = e_1 (constant), z-row = e_{z^2}
    a = PolynomialSprott2Degree(
        x=(0, 1, 0, 0, 0, 0, 0, 0, 0, 0),
        y=(1, 0, 0, 0, 0, 0, 0, 0, 0, 0),
        z=(0, 0, 0, 0, 0, 0, 0, 0, 0, 1),
    )
    p = np.array([0.5, -0.25, 2.0], np.float64)
    out = a.step_numpy(p)
    np.testing.assert_allclose(out, [0.5, 1.0, 4.0])


def test_monomial_order_matches_reference():
    # monomials are [1, x, x^2, xy, xz, y, y^2, yz, z, z^2] (src/lib.rs:602-613)
    p = np.array([2.0, 3.0, 5.0], np.float64)
    expect_monoms = [1, 2, 4, 6, 10, 3, 9, 15, 5, 25]
    for i, m in enumerate(expect_monoms):
        coeffs = [0.0] * 10
        coeffs[i] = 1.0
        a = PolynomialSprott2Degree(x=tuple(coeffs), y=(0,) * 10, z=(0,) * 10)
        assert a.step_numpy(p)[0] == m


def test_trajectory_stays_bounded_poisson_saturne():
    cfg = presets.poisson_saturne()
    p = np.array([0.05, 0.05, 0.05], np.float32)
    for _ in range(5000):
        p = cfg.attractor.step_numpy(p)
    assert np.all(np.isfinite(p))
    assert np.all(np.abs(p) < 10.0)


def test_preset_constants_spot_checks():
    ps = presets.poisson_saturne()
    assert ps.attractor.x[0] == 0.021
    assert ps.attractor.y[3] == -0.835443
    assert ps.view.center_camera == (-0.005, 0.262, -0.366 + 0.12)
    assert ps.view.rotation.rotation == 1.78268191887446
    ss = presets.solar_sail()
    assert ss.view.scale == 1.7
    assert ss.color_transform.factor == -0.2
    assert ss.color_transform.offset == 0.8
    # solar-sail's axis is intentionally unnormalized (release-build quirk)
    ax = np.array(ss.view.rotation.axis)
    assert abs(np.linalg.norm(ax) - 1.0) > 0.2


def test_fingerprints_distinguish():
    a = presets.poisson_saturne()
    b = presets.solar_sail()
    assert a.fingerprint() != b.fingerprint()
    assert a.fingerprint() == presets.poisson_saturne().fingerprint()
    assert a.replace(angle=0.3).fingerprint() != a.fingerprint()


def test_lorenz_rk4_matches_numpy():
    from strange_attractor_tpu.models.attractors import Lorenz

    a = Lorenz()
    p = np.array([[0.05, 0.03, 0.08], [1.0, 1.0, 1.0]], np.float32)
    got = np.asarray(a.step(jnp.asarray(p)))
    want = a.step_numpy(p)
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-6)


def test_lorenz_orbit_bounded_on_attractor():
    from strange_attractor_tpu.models.attractors import Lorenz

    a = Lorenz()
    p = np.array([0.05, 0.03, 0.08], np.float32)
    for _ in range(3000):
        p = a.step_numpy(p)
    assert np.all(np.isfinite(p)) and np.abs(p).max() < 60


def test_lorenz_preset_renders():
    import jax
    from strange_attractor_tpu import colorize, render

    cfg = presets.by_name("lorenz", iterations=100_000, width=64, height=48,
                          seed=1, lanes=64)
    st = render(cfg)
    c = np.asarray(st.count)
    assert c.sum() > 50_000  # most points land in frame
    # butterfly occupies the middle of the frame, not the borders (both axes)
    assert c[:2, :].sum() + c[-2:, :].sum() < 0.05 * c.sum()
    assert c[:, :2].sum() + c[:, -2:].sum() < 0.05 * c.sum()
    img = np.asarray(jax.device_get(colorize(cfg, st)))
    assert img[..., :3].max() > 0


def test_config_validation():
    import pytest

    with pytest.raises(ValueError, match="dimensions"):
        presets.poisson_saturne(width=0)
    with pytest.raises(ValueError, match="iterations"):
        presets.poisson_saturne(iterations=-1)
    with pytest.raises(ValueError, match="warmup"):
        presets.poisson_saturne(warmup=-5)


@pytest.mark.parametrize("name", ["rossler", "halvorsen", "thomas"])
def test_ode_presets_render_in_frame(name):
    """The new continuous-time presets stay bounded and framed."""
    import jax
    from strange_attractor_tpu import colorize, render

    cfg = presets.by_name(name, iterations=200_000, width=96, height=54,
                          seed=3, lanes=128)
    st = render(cfg)
    c = np.asarray(st.count)
    assert c.sum() > 150_000  # most points land in frame
    # attractor occupies the interior, not the borders
    assert c[:2, :].sum() + c[-2:, :].sum() < 0.05 * c.sum()
    assert c[:, :2].sum() + c[:, -2:].sum() < 0.05 * c.sum()
    img = np.asarray(jax.device_get(colorize(cfg, st)))
    assert img[..., :3].max() > 0


@pytest.mark.parametrize("cls_name", ["Rossler", "Halvorsen", "Lorenz", "Thomas"])
def test_rk4_step_xyz_matches_stacked(cls_name):
    """Component-form step (hot path) == stacked protocol step == numpy."""
    from strange_attractor_tpu.models import attractors

    a = getattr(attractors, cls_name)()
    p = np.array([[0.05, 0.03, 0.08], [-1.0, 0.5, 2.0]], np.float32)
    stacked = np.asarray(a.step(jnp.asarray(p)))
    xyz = np.stack(
        [np.asarray(v) for v in a.step_xyz(*(jnp.asarray(p[:, i]) for i in range(3)))],
        axis=-1,
    )
    np.testing.assert_array_equal(stacked, xyz)
    np.testing.assert_allclose(stacked, a.step_numpy(p), rtol=2e-6, atol=1e-6)


@pytest.mark.parametrize("name", ["aurora-veil", "orchid-ribbon", "delta-kite"])
def test_discovered_sprott_presets_chaotic_and_framed(name):
    """The discovered second-degree Sprott presets (tools/find_attractors.py
    seed=1 hits): bounded chaotic orbit, positive largest Lyapunov exponent,
    and the auto-framed camera keeps the attractor in the interior."""
    import jax
    from strange_attractor_tpu import colorize, render

    cfg = presets.by_name(name)
    # bounded + chaotic (nearby-orbit renormalization, Sprott's procedure)
    p = np.array([0.05, 0.05, 0.05], np.float64)
    for _ in range(1000):
        p = cfg.attractor.step_numpy(p)
    d0 = 1e-8
    q = p + np.array([d0, 0.0, 0.0])
    lsum = 0.0
    for _ in range(4000):
        p = cfg.attractor.step_numpy(p)
        q = cfg.attractor.step_numpy(q)
        assert np.all(np.isfinite(p)) and np.abs(p).max() < 10.0
        d = np.linalg.norm(q - p)
        lsum += np.log(d / d0)
        q = p + (q - p) * (d0 / d)
    assert lsum / 4000 > 0.02  # positive LLE: chaos, not a limit cycle

    cfg = presets.by_name(name, iterations=200_000, width=96, height=54,
                          seed=3, lanes=128)
    st = render(cfg)
    c = np.asarray(st.count)
    assert c.sum() > 150_000  # most points land in frame
    assert c[:2, :].sum() + c[-2:, :].sum() < 0.08 * c.sum()
    assert c[:, :2].sum() + c[:, -2:].sum() < 0.08 * c.sum()
    img = np.asarray(jax.device_get(colorize(cfg, st)))
    assert img[..., :3].max() > 0


def test_discovered_presets_reachable_via_cli_coeffs():
    """The same coefficients through --coeffs-x/y/z + --camera +
    --rotation-axis produce the identical config fingerprint — the presets
    are exactly the reference's extension mechanism, not a parallel path."""
    from strange_attractor_tpu.cli import build_parser, config_from_args

    want = presets.by_name("delta-kite")
    a = want.attractor
    rot = want.view.rotation
    argv = ["-p", "solar-sail"]  # any base; every relevant field overridden
    for flag, row in (("--coeffs-x", a.x), ("--coeffs-y", a.y), ("--coeffs-z", a.z)):
        argv += [flag] + [str(v) for v in row]
    argv += ["--camera"] + [str(v) for v in want.view.center_camera]
    argv += ["--rotation-axis"] + [str(v) for v in rot.axis] + [str(rot.rotation)]
    argv += ["-s", str(want.view.scale), "-i", str(want.iterations)]
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    assert cfg.attractor.x == a.x and cfg.attractor.y == a.y and cfg.attractor.z == a.z
    assert cfg.view.center_camera == want.view.center_camera
    assert cfg.view.scale == want.view.scale
    assert cfg.view.rotation.axis == rot.axis
    assert cfg.view.rotation.rotation == rot.rotation
    # identical rotation SEMANTICS too: the preset must not rely on
    # normalize=True, which --rotation-axis cannot express
    assert cfg.view.rotation.normalize == rot.normalize is False
    np.testing.assert_array_equal(
        cfg.view.rotation.to_rotation_matrix(), rot.to_rotation_matrix()
    )


def test_thomas_preset_chaotic():
    """The thomas preset's b=0.18 sits in the robust chaotic window under
    the production RK4 (the classic b=0.208186 is marginal there — LLE
    ~0.004-0.013 — and collapses the reference-seeded lanes onto one thin
    symmetry-broken ribbon; presets.thomas docstring). Benettin
    renormalization from an OFF-diagonal start (x=y=z is an invariant
    manifold whose escape transient inflates the estimate)."""
    cfg = presets.by_name("thomas")
    a = cfg.attractor
    assert a.b == 0.18 and a.dt == 0.1
    p = np.array([0.05, 0.03, 0.08], np.float64)
    for _ in range(4000):
        p = a.step_numpy(p)
    d0 = 1e-8
    q = p + np.array([d0, 0.0, 0.0])
    lsum = 0.0
    n = 4000
    for _ in range(n):
        p = a.step_numpy(p)
        q = a.step_numpy(q)
        assert np.all(np.isfinite(p)) and np.abs(p).max() < 5.0  # bounded
        d = np.linalg.norm(q - p)
        lsum += np.log(d / d0)
        q = p + (q - p) * (d0 / d)
    # measured ~0.036/unit-time at this segment (wanders 0.017-0.036
    # across starts: weak chaos with laminar stretches); assert well clear
    # of zero but below the lowest observed segment
    assert lsum / (n * a.dt) > 0.005
