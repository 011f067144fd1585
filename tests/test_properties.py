"""Property-based tests (hypothesis) for the pure numeric kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

import jax.numpy as jnp

from strange_attractor_tpu.config import Palette
from strange_attractor_tpu.ops.binning import _mono_u32, _inv_mono_u32, pack_zv, unpack_zv
from strange_attractor_tpu.oracle import oracle_bin
from strange_attractor_tpu.runtime import RenderState, merge
from strange_attractor_tpu.utils.sequencing import angle_iter, frame_sequence

finite_f32 = st.floats(
    min_value=np.float32(-3.0e38), max_value=np.float32(3.0e38),
    allow_nan=False, allow_infinity=False, width=32,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(finite_f32, min_size=2, max_size=32))
def test_mono_u32_is_order_preserving(zs):
    z = np.asarray(zs, np.float32)
    # -0.0 and 0.0 compare equal as floats but map to adjacent keys; the
    # order property is over the numeric total order, so canonicalize zeros
    z = np.where(z == 0.0, np.float32(0.0), z)
    m = np.asarray(_mono_u32(jnp.asarray(z))).astype(np.int64)
    order = np.argsort(z, kind="stable")
    assert np.all(np.diff(m[order]) >= 0)
    # and it round-trips exactly
    back = np.asarray(_inv_mono_u32(jnp.asarray(m.astype(np.uint32))))
    np.testing.assert_array_equal(back, z)


@settings(max_examples=200, deadline=None)
@given(
    st.floats(min_value=np.float32(-5.0), max_value=100.0, width=32),
    st.floats(min_value=0.0, max_value=1.0, width=32),
)
def test_pack_zv_bounds(z, v):
    z32, v32 = np.float32(z), np.float32(v)
    packed = np.asarray(pack_zv(jnp.asarray([z32]), jnp.asarray([v32])))[0]
    zd, vd = (float(np.asarray(a)[0]) for a in unpack_zv(jnp.asarray([packed])))
    if z32 <= -1.0:
        assert packed == 0
    else:
        # depth decodes to the lower bucket edge: never above the input,
        # never more than ~2^-11 relative (+ tiny absolute) below it
        assert zd <= z32
        assert z32 - zd <= max(2e-3 * abs(z32), 2e-3)
        assert 0.0 <= vd <= 1.0
        assert vd <= min(v32, 0.999999) + 1e-6
        assert min(v32, 0.999999) - vd <= 1.0 / 4096 + 1e-6


@settings(max_examples=100, deadline=None)
@given(st.lists(st.floats(min_value=np.float32(-2.0), max_value=np.float32(3.0), width=32),
                min_size=1, max_size=20))
def test_palette_interpolation_in_gamut(vals):
    pal = Palette.from_rgb([1.0, 0.5, 0.0], [0.0, 0.5, 1.0], [0.25, 0.5, 0.75])
    out = pal.interpolate_numpy(np.asarray(vals, np.float64))
    assert np.all(out >= 0.0) and np.all(out <= 1.0)
    # endpoint behavior: clamped below to first stop
    lo = pal.interpolate_numpy(np.float64(-10.0))
    np.testing.assert_allclose(lo, np.sqrt([1.0, 0.0, 0.25]))


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1))
def test_merge_is_associative_and_commutative_on_counts(seed):
    rng = np.random.default_rng(seed)
    H, W = 3, 5

    def rand_state():
        return RenderState(
            count=jnp.asarray(rng.integers(0, 100, (H, W)).astype(np.uint32)),
            steps=jnp.asarray(rng.random((H, W)).astype(np.float32)),
            zbuf=jnp.asarray(
                np.where(rng.random((H, W)) < 0.3, -1.0, rng.normal(size=(H, W)))
                .astype(np.float32)
            ),
        )

    a, b, c = rand_state(), rand_state(), rand_state()
    ab_c = merge(merge(a, b), c)
    a_bc = merge(a, merge(b, c))
    np.testing.assert_array_equal(np.asarray(ab_c.count), np.asarray(a_bc.count))
    np.testing.assert_array_equal(np.asarray(ab_c.zbuf), np.asarray(a_bc.zbuf))
    np.testing.assert_array_equal(np.asarray(ab_c.steps), np.asarray(a_bc.steps))
    ba = merge(b, a)
    np.testing.assert_array_equal(np.asarray(merge(a, b).count), np.asarray(ba.count))
    np.testing.assert_array_equal(np.asarray(merge(a, b).zbuf), np.asarray(ba.zbuf))


@settings(max_examples=100, deadline=None)
@given(
    st.floats(min_value=-360, max_value=360),
    st.floats(min_value=0.01, max_value=400),
    st.floats(min_value=0.01, max_value=90),
)
def test_angle_iter_properties(start, span, step):
    end = start + span
    angles = list(angle_iter(start, end, step))
    assert len(angles) >= 1
    assert angles[0] == start
    # strictly increasing, never reaching end - step/2 — INCLUDING the last
    # angle, the only one a fencepost regression can push past the bound
    # (the single-yield fallback when no frame fits is exempt by design,
    # utils/sequencing.py:33-34)
    assert all(b > a for a, b in zip(angles, angles[1:]))
    if len(angles) > 1:
        assert all(a + step / 2 < end for a in angles)
    # frame names unique
    from pathlib import Path

    names = [p for _, p in frame_sequence(start, end, step, Path("x.png"))]
    assert len(set(names)) == len(names)


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1))
def test_bin_split_invariance(seed):
    """Binning a stream in two halves then summing counts == binning once
    (the property the reference's parallel merge relies on)."""
    rng = np.random.default_rng(seed)
    W, H, n = 4, 3, 60
    flat = rng.integers(-1, W * H, n)
    z = rng.normal(size=n).astype(np.float32)
    v = rng.random(n).astype(np.float32)
    c1, s1, z1 = oracle_bin(W, H, flat[: n // 2], z[: n // 2], v[: n // 2])
    c1, s1, z1 = oracle_bin(W, H, flat[n // 2 :], z[n // 2 :], v[n // 2 :], c1, s1, z1)
    c2, s2, z2 = oracle_bin(W, H, flat, z, v)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(z1, z2)
    np.testing.assert_array_equal(s1, s2)
