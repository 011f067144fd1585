"""Shared-orbit sequence rendering (render_sequence_shared).

The load-bearing invariant: every frame of a shared-orbit batch must be
BIT-identical to a single render() of the batch's orbit key at that frame's
angle — the split of the map step into a frame-invariant half
(_step_fn_shared) and a per-frame projection tail (_project_emit) must not
change a single emitted bit vs the fused step (_step_fn). If this holds,
all single-frame parity guarantees (oracle, reference PNG) transfer to
sequence frames for free.
"""

import numpy as np
import jax
import pytest

from strange_attractor_tpu import BinStrategy, colorize, render
from strange_attractor_tpu.models import presets
from strange_attractor_tpu.render import (
    render_sequence_batched,
    render_sequence_shared,
    seed_key,
)


def _cfg(**kw):
    base = dict(width=48, height=27, iterations=30_000, lanes=64,
                chunk_steps=32, seed=8)
    base.update(kw)
    return presets.poisson_saturne(**base)


def _single_frame(cfg, key, angle_deg):
    state = render(cfg, None, key, angle=float(np.radians(angle_deg)))
    return np.asarray(jax.device_get(colorize(cfg, state)))


@pytest.mark.parametrize("strategy", [
    BinStrategy.PACKED, BinStrategy.KERNEL, BinStrategy.DEPTH,
    BinStrategy.EXACT, BinStrategy.EXACT16_KERNEL,
])
def test_shared_frame_bit_matches_single_render(strategy):
    from strange_attractor_tpu.config import RenderKind

    kw = {"bin_strategy": strategy}
    if strategy.planes_kind() is BinStrategy.DEPTH:
        kw["render"] = RenderKind.DEPTH  # a z-only state can't tone-map as Gas
    cfg = _cfg(**kw)
    angles = [0.0, 90.0, 222.5]
    frames = render_sequence_shared(cfg, angles)
    assert frames.shape == (3, 27, 48, 4) and frames.dtype == np.uint16
    orbit_key = jax.random.fold_in(seed_key(cfg), 0)  # batch starts at lo=0
    for i, a in enumerate(angles):
        np.testing.assert_array_equal(frames[i], _single_frame(cfg, orbit_key, a))


def test_shared_batch_split_keys():
    """Each batch renders its own orbit (fold_in(base, batch_start))."""
    cfg = _cfg()
    angles = [0.0, 90.0, 180.0]
    frames = render_sequence_shared(cfg, angles, frames_per_batch=2)
    base = seed_key(cfg)
    np.testing.assert_array_equal(
        frames[0], _single_frame(cfg, jax.random.fold_in(base, 0), 0.0))
    np.testing.assert_array_equal(
        frames[2], _single_frame(cfg, jax.random.fold_in(base, 2), 180.0))
    # within one batch the orbit is shared: equal angles => equal frames
    dup = render_sequence_shared(cfg, [45.0, 45.0])
    np.testing.assert_array_equal(dup[0], dup[1])


def test_shared_reseed_lanes_bit_matches():
    """The emission gate (age > 0) is only materialized when reseeding —
    the reseed path must still match the fused step bit for bit."""
    cfg = _cfg(reseed_lanes=True)
    frames = render_sequence_shared(cfg, [30.0])
    orbit_key = jax.random.fold_in(seed_key(cfg), 0)
    np.testing.assert_array_equal(frames[0], _single_frame(cfg, orbit_key, 30.0))


def test_shared_device_conversion_matches_host():
    from strange_attractor_tpu.utils.export import convert_format

    cfg = _cfg(iterations=20_000)
    angles = [0.0, 120.0]
    raw = render_sequence_shared(cfg, angles)
    conv = render_sequence_shared(cfg, angles, transparent=False, eight_bit=True)
    assert conv.shape == (2, 27, 48, 3) and conv.dtype == np.uint8
    for f_raw, f_conv in zip(raw, conv):
        np.testing.assert_array_equal(f_conv, convert_format(f_raw, False, True))


def test_depth_sequence_wire_matches_host_conversion():
    """DEPTH sequence frames wire one gray channel per pixel over the link
    (render._wire_channels — the tone map's other channels are replicas /
    a constant alpha); every delivered frame must still equal the host
    conversion of the raw u16 RGBA frame, on both sequence paths."""
    from strange_attractor_tpu.config import RenderKind
    from strange_attractor_tpu.utils.export import convert_format

    cfg = _cfg(iterations=20_000, bin_strategy=BinStrategy.DEPTH,
               render=RenderKind.DEPTH)
    angles = [0.0, 120.0]
    raw_shared = render_sequence_shared(cfg, angles)
    raw_batched = render_sequence_batched(cfg, angles)
    assert raw_shared.shape == (2, 27, 48, 4) and raw_shared.dtype == np.uint16
    for transparent, eight_bit in ((False, True), (True, True), (False, False)):
        conv = render_sequence_shared(
            cfg, angles, transparent=transparent, eight_bit=eight_bit)
        for f_raw, f_conv in zip(raw_shared, conv):
            np.testing.assert_array_equal(
                f_conv, convert_format(f_raw, transparent, eight_bit))
        convb = render_sequence_batched(
            cfg, angles, transparent=transparent, eight_bit=eight_bit)
        for f_raw, f_conv in zip(raw_batched, convb):
            np.testing.assert_array_equal(
                f_conv, convert_format(f_raw, transparent, eight_bit))


def test_shared_degenerate_inputs():
    cfg = _cfg(iterations=0)
    blank = render_sequence_shared(cfg, [0.0, 90.0])
    np.testing.assert_array_equal(blank, render_sequence_batched(cfg, [0.0, 90.0]))
    empty = render_sequence_shared(_cfg(), [])
    assert empty.shape == (0, 27, 48, 4)


def test_frames_per_batch_zero_means_auto():
    """frames_per_batch <= 0 is auto on every sequence path (the mesh path's
    contract; 0 used to crash the single-device paths with an opaque
    range() error — round-4 advisor finding)."""
    cfg = _cfg()
    angles = [0.0, 45.0]
    want = render_sequence_shared(cfg, angles)
    np.testing.assert_array_equal(render_sequence_shared(cfg, angles, frames_per_batch=0), want)
    wantb = render_sequence_batched(cfg, angles)
    np.testing.assert_array_equal(
        render_sequence_batched(cfg, angles, frames_per_batch=0), wantb)
