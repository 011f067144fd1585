"""Merge semantics (reference Runtime::merge, src/lib.rs:708-738) and
state lifecycle (create/reset/save/load)."""

import numpy as np

import jax
import jax.numpy as jnp

from strange_attractor_tpu import merge, presets, render
from strange_attractor_tpu.config import BinStrategy
from strange_attractor_tpu.oracle import oracle_bin
from strange_attractor_tpu.runtime import RenderState, load_state, merge_all, save_state


def _random_state(rng, h=4, w=6, packed=False):
    count = jnp.asarray(rng.integers(0, 9, (h, w)).astype(np.uint32))
    if packed:
        return RenderState(
            count=count,
            packed=jnp.asarray(rng.integers(0, 2**31, (h, w)).astype(np.uint32)),
        )
    zbuf = jnp.asarray(
        np.where(rng.random((h, w)) < 0.3, -1.0, rng.normal(0, 0.5, (h, w))).astype(np.float32)
    )
    return RenderState(
        count=count,
        steps=jnp.asarray(rng.random((h, w)).astype(np.float32)),
        zbuf=zbuf,
    )


def test_merge_matches_sequential_binning():
    """merge(bin(A), bin(B)) == bin(A ++ B) — the associativity property the
    reference's parallel scheme rests on (src/lib.rs:1037-1048)."""
    W, H = 6, 4
    rng = np.random.default_rng(0)
    NPIX = W * H

    def stream(n):
        return (
            rng.integers(0, NPIX, n).astype(np.int64),
            rng.normal(0, 0.5, n).astype(np.float32),
            rng.random(n).astype(np.float32),
        )

    a, b = stream(300), stream(300)
    ca, sa, za = oracle_bin(W, H, *a)
    cb, sb, zb = oracle_bin(W, H, *b)
    st = merge(
        RenderState(jnp.asarray(ca.reshape(H, W).astype(np.uint32)),
                    jnp.asarray(sa.reshape(H, W)), jnp.asarray(za.reshape(H, W))),
        RenderState(jnp.asarray(cb.reshape(H, W).astype(np.uint32)),
                    jnp.asarray(sb.reshape(H, W)), jnp.asarray(zb.reshape(H, W))),
    )
    flat = np.concatenate([a[0], b[0]])
    z = np.concatenate([a[1], b[1]])
    v = np.concatenate([a[2], b[2]])
    cs, ss, zs = oracle_bin(W, H, flat, z, v)
    np.testing.assert_array_equal(np.asarray(st.count).ravel(), cs)
    np.testing.assert_array_equal(np.asarray(st.zbuf).ravel(), zs)
    np.testing.assert_array_equal(np.asarray(st.steps).ravel(), ss)


def test_merge_identity_and_commutative_counts():
    rng = np.random.default_rng(1)
    a = _random_state(rng)
    zero = RenderState(
        count=jnp.zeros_like(a.count),
        steps=jnp.zeros_like(a.steps),
        zbuf=jnp.full_like(a.zbuf, -1.0),
    )
    m = merge(a, zero)
    np.testing.assert_array_equal(np.asarray(m.count), np.asarray(a.count))
    np.testing.assert_array_equal(np.asarray(m.zbuf), np.asarray(a.zbuf))
    np.testing.assert_array_equal(np.asarray(m.steps), np.asarray(a.steps))

    b = _random_state(rng)
    ab, ba = merge(a, b), merge(b, a)
    np.testing.assert_array_equal(np.asarray(ab.count), np.asarray(ba.count))
    np.testing.assert_array_equal(np.asarray(ab.zbuf), np.asarray(ba.zbuf))


def test_merge_packed():
    rng = np.random.default_rng(2)
    a, b = _random_state(rng, packed=True), _random_state(rng, packed=True)
    m = merge(a, b)
    np.testing.assert_array_equal(
        np.asarray(m.packed), np.maximum(np.asarray(a.packed), np.asarray(b.packed))
    )
    np.testing.assert_array_equal(
        np.asarray(m.count), np.asarray(a.count) + np.asarray(b.count)
    )


def test_merge_all_equals_two_renders():
    cfg = presets.poisson_saturne(
        width=48, height=27, iterations=40_000, lanes=64, seed=9,
        bin_strategy=BinStrategy.EXACT,
    )
    s1 = render(cfg, key=jax.random.PRNGKey(1))
    s2 = render(cfg, key=jax.random.PRNGKey(2))
    merged = merge_all([s1, s2])
    seq = render(cfg, s1, key=jax.random.PRNGKey(2))  # progressive over s1
    np.testing.assert_array_equal(np.asarray(merged.count), np.asarray(seq.count))
    np.testing.assert_allclose(np.asarray(merged.zbuf), np.asarray(seq.zbuf), atol=1e-6)


def test_state_reset_and_checkpoint(tmp_path):
    cfg = presets.poisson_saturne(width=16, height=9, iterations=5000, lanes=32, seed=1)
    st = render(cfg)
    assert int(st.count.sum()) > 0
    rs = st.reset()
    assert int(rs.count.sum()) == 0
    if rs.packed is not None:
        assert int(rs.packed.sum()) == 0

    path = tmp_path / "ckpt.npz"
    save_state(str(path), st)
    loaded = load_state(str(path))
    assert loaded.strategy == st.strategy
    np.testing.assert_array_equal(np.asarray(loaded.count), np.asarray(st.count))
