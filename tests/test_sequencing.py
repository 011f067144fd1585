"""Frame sequencing: angle iteration and zero-padded naming
(reference AngleIter, src/bin/main.rs:107-176)."""

from pathlib import Path

import numpy as np

from strange_attractor_tpu.utils.sequencing import (
    angle_iter,
    frame_path,
    frame_sequence,
    needed_digits,
)


def test_full_rotation_frame_count():
    angles = list(angle_iter(0.0, 360.0, 0.5))
    assert len(angles) == 720
    assert angles[0] == 0.0
    np.testing.assert_allclose(angles[1], 0.5)
    assert angles[-1] < 360.0


def test_single_frame_fallback():
    # start == end: one frame at the start angle (main.rs:169-174)
    assert list(angle_iter(45.0, 45.0, 1.0)) == [45.0]


def test_step_larger_than_range():
    assert list(angle_iter(0.0, 10.0, 30.0)) == [0.0]


def test_needed_digits():
    assert needed_digits(0.0, 360.0, 0.5) == 3  # 720 frames -> 3 digits
    assert needed_digits(0.0, 360.0, 4.0) == 2  # 90 frames
    assert needed_digits(0.0, 2.0, 1.0) == 0  # degenerate


def test_frame_path_padding():
    assert frame_path(Path("attractor.png"), 7, 3).name == "attractor007.png"
    assert frame_path(Path("out/att"), 12, 2) == Path("out/att12")
    assert frame_path(Path("attractor.png"), 0, 0).name == "attractor.png"


def test_frame_sequence_single_plain_name():
    seq = list(frame_sequence(10.0, 10.0, 1.0, Path("foo")))
    assert seq == [(10.0, Path("foo"))]


def test_frame_sequence_names_unique():
    seq = list(frame_sequence(0.0, 5.0, 1.0, Path("att.png")))
    names = [p.name for _, p in seq]
    assert len(names) == len(set(names)) == 5
    assert names[0] == "att0.png"


def test_render_profile():
    from strange_attractor_tpu.utils.profiling import RenderProfile
    import time as _t

    prof = RenderProfile(iterations=1000)
    with prof.phase("render"):
        _t.sleep(0.01)
    with prof.phase("colorize"):
        _t.sleep(0.001)
    # 1000 iters / >=0.01 s sleep: nominal rate is exactly 100_000, so
    # leave real margin for a precise sleep/coarse clock
    assert prof.iters_per_sec is not None and prof.iters_per_sec <= 100_000
    s = prof.summary()
    assert "render=" in s and "rate=" in s


def test_f64_requires_x64():
    import pytest
    from strange_attractor_tpu import presets, render

    cfg = presets.poisson_saturne(iterations=1000, width=8, height=8, dtype="float64")
    with pytest.raises(ValueError, match="x64"):
        render(cfg)
