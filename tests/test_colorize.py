"""Tone-map tests: palette interpolation and colorize vs the numpy oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from strange_attractor_tpu import presets
from strange_attractor_tpu.config import Palette, RenderKind
from strange_attractor_tpu.ops.colorize import colorize_planes, palette_lookup
from strange_attractor_tpu.oracle import oracle_colorize


def test_palette_lookup_matches_numpy():
    pal = Palette.from_rgb(
        [1.0, 0.5, 1.0, 0.5, 0.5, 1.0],
        [1.0, 1.0, 0.5, 1.0, 0.5, 0.5],
        [0.5, 0.5, 0.5, 1.0, 1.0, 1.0],
    )
    v = np.linspace(-0.5, 1.5, 257).astype(np.float32)
    got = np.asarray(palette_lookup(pal.stops, jnp.asarray(v)))
    want = pal.interpolate_numpy(v)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_palette_hand_values():
    pal = Palette.from_rgb([0.0, 1.0], [0.25, 0.25], [1.0, 0.0])
    # value 0 -> first stop, sqrt applied (src/lib.rs:468-470)
    np.testing.assert_allclose(pal.interpolate_numpy(0.0), [0.0, 0.5, 1.0])
    # midpoint of the 2-stop palette: v=0.25 -> n=0, frac=0.5
    np.testing.assert_allclose(
        pal.interpolate_numpy(0.25), np.sqrt([0.5, 0.25, 0.5]), rtol=1e-12
    )
    # clamped above: 0.999999 * 2 -> n=1 (duplicate last stop keeps it exact)
    np.testing.assert_allclose(pal.interpolate_numpy(5.0), np.sqrt([1.0, 0.25, 0.0]), atol=1e-5)


def test_palette_near_one_passes_through():
    """Only v >= 1.0 clamps to 0.999999; values in [0.999999, 1.0) pass
    through unchanged (src/lib.rs:443-449) — both paths, incl. the f32 edge
    where v * count rounds up to exactly count."""
    pal = Palette.from_rgb([0.0, 1.0], [0.25, 0.25], [1.0, 0.0])
    # numpy twin (f64): 0.9999995 is between the clamp point and 1.0
    for v in (0.999999, 0.9999995, float(np.nextafter(1.0, 0.0))):
        frac = v * 2 % 1.0
        want = np.sqrt([1.0 * frac + 1.0 * (1 - frac), 0.25, 0.0])
        np.testing.assert_allclose(pal.interpolate_numpy(v), want, rtol=1e-9)
    # >= 1.0 clamps exactly like before
    np.testing.assert_allclose(
        pal.interpolate_numpy(1.0), pal.interpolate_numpy(5.0), rtol=0
    )
    # device path at the largest f32 below 1.0 must not index past the table
    v32 = np.float32(np.nextafter(np.float32(1.0), np.float32(0.0)))
    got = np.asarray(palette_lookup(pal.stops, jnp.asarray([v32, np.float32(0.5)])))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got[0], np.sqrt([1.0, 0.25, 0.0]), atol=1e-3)


def _planes(rng, h=6, w=9):
    count = rng.integers(0, 50, (h, w)).astype(np.uint32)
    steps = rng.random((h, w)).astype(np.float32)
    zbuf = np.where(
        rng.random((h, w)) < 0.3, np.float32(-1.0), rng.normal(0, 0.4, (h, w)).astype(np.float32)
    )
    return count, steps, zbuf


@pytest.mark.parametrize("transparent", [True, False])
def test_gas_matches_oracle(transparent):
    cfg = presets.poisson_saturne(width=9, height=6, transparent=transparent)
    count, steps, zbuf = _planes(np.random.default_rng(0))
    got = np.asarray(
        colorize_planes(cfg, jnp.asarray(count), jnp.asarray(steps), jnp.asarray(zbuf))
    )
    want = oracle_colorize(cfg, count, steps, zbuf)
    # float32 vs float64 tone-map: allow 1-2 ulp of u16
    assert got.shape == want.shape == (6, 9, 4)
    assert np.abs(got.astype(np.int64) - want.astype(np.int64)).max() <= 2


def test_depth_matches_oracle():
    cfg = presets.poisson_saturne(width=9, height=6, render=RenderKind.DEPTH)
    count, steps, zbuf = _planes(np.random.default_rng(1))
    got = np.asarray(
        colorize_planes(cfg, jnp.asarray(count), jnp.asarray(steps), jnp.asarray(zbuf))
    )
    want = oracle_colorize(cfg, count, steps, zbuf)
    assert np.abs(got.astype(np.int64) - want.astype(np.int64)).max() <= 1
    # sentinel pixels map to 0 gray, opaque alpha
    assert np.all(got[zbuf == -1.0, :3] == 0)
    assert np.all(got[..., 3] == 65535)


def test_gas_empty_render_is_black():
    cfg = presets.poisson_saturne(width=4, height=3)
    count = np.zeros((3, 4), np.uint32)
    steps = np.zeros((3, 4), np.float32)
    zbuf = np.full((3, 4), -1.0, np.float32)
    got = np.asarray(
        colorize_planes(cfg, jnp.asarray(count), jnp.asarray(steps), jnp.asarray(zbuf))
    )
    want = oracle_colorize(cfg, count, steps, zbuf)
    np.testing.assert_array_equal(got, want)
    assert np.all(got == 0)


def test_saturating_cast():
    # brightness factors that drive channels out of [0, 65535]
    from strange_attractor_tpu.config import BrightnessConstants, Colors

    cfg = presets.poisson_saturne(
        width=2, height=1, colors=Colors(brightness=BrightnessConstants(offset=5.0, factor=100.0))
    )
    count = np.array([[10, 0]], np.uint32)
    steps = np.array([[0.5, 0.0]], np.float32)
    zbuf = np.zeros((1, 2), np.float32)
    got = np.asarray(
        colorize_planes(cfg, jnp.asarray(count), jnp.asarray(steps), jnp.asarray(zbuf))
    )
    assert np.all(got[0, 0, :3] == 65535)  # saturated high
    want = oracle_colorize(cfg, count, steps, zbuf)
    np.testing.assert_array_equal(got, want)


def test_depth_all_valid_negative_matches_oracle():
    """The reference's (max, min) fold STARTS at (0.0, f32::MAX)
    (src/lib.rs:875-882): an all-valid, all-negative z-plane must normalize
    against zmax = 0.0, not the true negative max — the where-fill only
    injects 0.0 when some pixel holds the -1.0 sentinel."""
    cfg = presets.poisson_saturne(width=9, height=6, render=RenderKind.DEPTH)
    rng = np.random.default_rng(7)
    count = rng.integers(1, 9, (6, 9)).astype(np.uint32)
    steps = rng.random((6, 9), np.float32)
    zbuf = (-5.0 + 3.0 * rng.random((6, 9))).astype(np.float32)  # all valid, < 0
    got = np.asarray(
        colorize_planes(cfg, jnp.asarray(count), jnp.asarray(steps), jnp.asarray(zbuf))
    )
    want = oracle_colorize(cfg, count, steps, zbuf)
    assert np.abs(got.astype(np.int64) - want.astype(np.int64)).max() <= 1
    # zmax=0.0 > every z, so nothing may normalize to full white
    assert got[..., 0].max() < 65535


def test_palette_gather_path_bit_identical_to_selects():
    """The K-select chain and the table-gather path (used past
    PALETTE_SELECT_MAX_STOPS) must agree bit-for-bit — same (lo, hi) rows,
    same lerp ops."""
    rng = np.random.default_rng(3)
    for k in (2, 6, 9, 64):
        pal = Palette(rng.random((k, 3)))
        v = np.concatenate([
            np.linspace(-0.25, 1.25, 301),
            rng.random(200),
            [0.0, 0.999999, 0.99999994, 1.0, np.nextafter(1.0, 0.0)],
        ]).astype(np.float32)
        sel = np.asarray(palette_lookup(pal.stops, jnp.asarray(v), gather=False))
        gat = np.asarray(palette_lookup(pal.stops, jnp.asarray(v), gather=True))
        np.testing.assert_array_equal(sel, gat)


def test_palette_64_stops_matches_numpy():
    """A 64-stop palette (CLI --palette accepts arbitrary stop counts) takes
    the gather path automatically and still matches the numpy reference."""
    from strange_attractor_tpu.ops.colorize import PALETTE_SELECT_MAX_STOPS

    rng = np.random.default_rng(11)
    pal = Palette(rng.random((64, 3)))
    assert pal.count > PALETTE_SELECT_MAX_STOPS
    v = np.linspace(-0.5, 1.5, 1025).astype(np.float32)
    got = np.asarray(palette_lookup(pal.stops, jnp.asarray(v)))
    want = pal.interpolate_numpy(v)
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-6)


def test_gas_colorize_64_stop_palette_matches_oracle():
    from strange_attractor_tpu.config import Colors

    rng = np.random.default_rng(13)
    pal = Palette(rng.random((64, 3)))
    cfg = presets.poisson_saturne(width=9, height=6, colors=Colors(palette=pal))
    count = rng.integers(0, 9, (6, 9)).astype(np.uint32)
    steps = rng.random((6, 9), np.float32)
    zbuf = np.where(count > 0, rng.random((6, 9), np.float32), -1.0).astype(np.float32)
    got = np.asarray(
        colorize_planes(cfg, jnp.asarray(count), jnp.asarray(steps), jnp.asarray(zbuf))
    )
    want = oracle_colorize(cfg, count, steps, zbuf)
    assert np.abs(got.astype(np.int64) - want.astype(np.int64)).max() <= 1
