"""Device-side tone mapping: the reference's ``colorize`` (src/lib.rs:841-904)
as one fused elementwise pass over the canvas.

Gas mode: palette-interpolate the stored color value, scale brightness by
``log(count+1) / log(max+1)``, apply the brightness constants, and cast with
Rust ``as u16`` saturation semantics. Depth mode: reverse-lerp the z-buffer
between its (sentinel-excluded) min/max into 16-bit grayscale.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config import Config, RenderKind
from ..runtime import RenderState
from .binning import unpack_zv


def _saturate_u16(x):
    """Rust ``<f64> as u16``: NaN -> 0, clamp [0, 65535], truncate."""
    x = jnp.nan_to_num(x, nan=0.0, posinf=65535.0, neginf=0.0)
    return jnp.clip(x, 0.0, 65535.0).astype(jnp.uint16)


# beyond this stop count the select chain loses to one device gather:
# K selects cost 6K where-ops per pixel (a 64-stop palette: 384), while the
# gather is two (npix, 3) table lookups regardless of K
PALETTE_SELECT_MAX_STOPS = 8


def palette_lookup(stops: np.ndarray, value, *, gather: bool | None = None):
    """Palette interpolation (src/lib.rs:442-472) vectorized over the canvas.

    ``stops`` is the (K+1, 3) host table (last stop duplicated). With K tiny
    (the default palette: 6), the lookup is expressed as K selects — pure
    VPU work, no device gather; past ``PALETTE_SELECT_MAX_STOPS`` it
    switches to one table gather, whose cost is K-independent (the CLI
    accepts arbitrary ``--palette`` stop counts). Both paths compute the
    identical lerp from identical (lo, hi) rows, so the output is
    bit-identical (pinned in tests/test_colorize.py); ``gather`` pins a
    path explicitly for tests.
    Returns (..., 3): lerp between neighboring stops then sqrt per channel.
    """
    k = stops.shape[0] - 1
    # reference clamp (src/lib.rs:443-449): only v >= 1.0 maps to 0.999999;
    # values in [0.999999, 1.0) pass through unchanged
    v = jnp.where(value >= 1.0, jnp.float32(0.999999), jnp.maximum(value, 0.0)) * k
    # f32 can round v up to exactly k for value within half-an-ulp of 1.0
    # (the reference's f64 product cannot); clamp the stop index
    n = jnp.minimum(jnp.floor(v).astype(jnp.int32), k - 1)  # in [0, k-1]
    frac = v % 1.0

    if gather is None:
        gather = k > PALETTE_SELECT_MAX_STOPS
    if gather:
        tbl = jnp.asarray(stops, jnp.float32)  # (K+1, 3)
        lo_rows = tbl[n]  # (..., 3)
        hi_rows = tbl[n + 1]
        return jnp.sqrt(hi_rows * frac[..., None] + lo_rows * (1.0 - frac[..., None]))

    lo = [jnp.zeros_like(v) for _ in range(3)]
    hi = [jnp.zeros_like(v) for _ in range(3)]
    for idx in range(k):
        sel = n == idx
        for c in range(3):
            lo[c] = jnp.where(sel, jnp.float32(stops[idx][c]), lo[c])
            hi[c] = jnp.where(sel, jnp.float32(stops[idx + 1][c]), hi[c])
    out = [jnp.sqrt(h * frac + l * (1.0 - frac)) for l, h in zip(lo, hi)]
    return jnp.stack(out, axis=-1)


def state_planes(state: RenderState):
    """(count, steps, zbuf) planes regardless of storage strategy."""
    if state.packed is not None:
        zbuf, steps = unpack_zv(state.packed)
        return state.count, steps, zbuf
    return state.count, state.steps, state.zbuf


_DEPTH_STATE_AS_GAS_MSG = (
    "this state was accumulated with BinStrategy.DEPTH (z-buffer only) "
    "and cannot be colorized as a Gas render; use BinStrategy.PACKED/"
    "EXACT if you need both render kinds from one state"
)


def colorize_stats(config: Config, count, steps, zbuf):
    """Global reductions :func:`colorize_planes` needs: Gas mode the running
    max count (src/lib.rs:813-815, computed after the fact — SURVEY §7), Depth
    mode the sentinel-excluded (zmax, zmin) fold. Split out so a banded
    colorize (render.colorize_convert_fetch) can reduce over the FULL canvas
    once and tone-map row bands with bit-identical elementwise math. Takes
    the same plane triple as :func:`colorize_planes` (``steps`` unused)."""
    del steps
    if config.render == RenderKind.GAS:
        if count is None:
            raise ValueError(_DEPTH_STATE_AS_GAS_MSG)
        return (jnp.max(count.astype(jnp.float32)),)
    valid = zbuf != -1.0
    zmax = jnp.maximum(jnp.float32(0.0),
                       jnp.max(jnp.where(valid, zbuf, jnp.float32(0.0))))
    zmin = jnp.min(jnp.where(valid, zbuf, jnp.float32(np.finfo(np.float32).max)))
    return zmax, zmin


def colorize_planes(config: Config, count, steps, zbuf, stats=None):
    """Tone-map planes to (H, W, 4) uint16 RGBA.

    ``stats`` optionally carries :func:`colorize_stats` of the full canvas;
    when the planes ARE the full canvas it may be omitted and is computed
    inline (identical ops)."""
    if config.render == RenderKind.GAS and count is None:
        raise ValueError(_DEPTH_STATE_AS_GAS_MSG)
    if config.render == RenderKind.GAS:
        bk = config.colors.brightness
        rgb = palette_lookup(config.colors.palette.stops, steps)
        cf = count.astype(jnp.float32)
        (maxc,) = stats if stats is not None else colorize_stats(config, count, steps, zbuf)
        # log base (max+1) brightness (src/lib.rs:860); NaN when max == 0
        # mirrors the reference's NaN -> 0 cast for the empty render.
        factor = jnp.log1p(cf) / jnp.log1p(maxc)
        channels = (rgb * factor[..., None] + jnp.float32(bk.offset)) * jnp.float32(bk.factor)
        rgb16 = _saturate_u16(channels * 65535.0)
        if config.transparent:
            alpha = _saturate_u16(factor * 65535.0)
        else:
            alpha = jnp.full(count.shape, 65535, jnp.uint16)
        return jnp.concatenate([rgb16, alpha[..., None]], axis=-1)

    # Depth (src/lib.rs:875-899): fold starts (0.0, f32::MAX), -1.0 excluded.
    # The 0.0 fold START is load-bearing: an all-valid, all-negative z-plane
    # must still normalize against zmax=0.0 (the where-fill alone only
    # injects 0.0 when some pixel is invalid) — matches oracle.py:160-164.
    valid = zbuf != -1.0
    zmax, zmin = stats if stats is not None else colorize_stats(config, count, steps, zbuf)
    diff = zmax - zmin
    z = jnp.where(valid, (zbuf - zmin) / diff, jnp.float32(0.0))
    gray = _saturate_u16(z * jnp.float32(65535.0))
    alpha = jnp.full(zbuf.shape, 65535, jnp.uint16)
    return jnp.stack([gray, gray, gray, alpha], axis=-1)
