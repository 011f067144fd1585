"""End-to-end render vs the numpy oracle.

Two regimes:

- short horizon, EXACT strategy: with the same seed points the XLA-CPU and
  numpy float32 trajectories should agree closely for tens of steps, so the
  binned planes match (nearly) pixel-for-pixel.
- long horizon: chaotic divergence decorrelates individual orbits, but the
  rendered histogram converges to the same invariant measure — the exact
  argument the reference uses to justify merging independent renders
  (src/lib.rs:1037-1048). Compared tone-mapped, statistically.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from strange_attractor_tpu import colorize, presets, render
from strange_attractor_tpu.config import BinStrategy
from strange_attractor_tpu.oracle import oracle_colorize, oracle_render
from strange_attractor_tpu.render import plan_schedule, seed_key
from strange_attractor_tpu.runtime import RenderState


def _seeds_like_render(cfg, key):
    lanes, _, _ = plan_schedule(cfg)
    return np.asarray(jax.random.uniform(key, (lanes, 3), dtype=jnp.float32) * 0.1)


def test_short_horizon_matches_oracle_exactly():
    cfg = presets.poisson_saturne(
        width=64, height=36, lanes=4, chunk_steps=16, iterations=4 * 16 * 2,
        warmup=100, seed=7, bin_strategy=BinStrategy.EXACT,
    )
    key = seed_key(cfg)
    seeds = _seeds_like_render(cfg, key)
    state = render(cfg, key=key)
    oc, os_, oz = oracle_render(cfg, seeds, steps_per_lane=32)

    count = np.asarray(state.count)
    total = count.sum()
    assert total == oc.sum() > 0
    # float32 trajectories may disagree in the last ulp near pixel edges;
    # demand near-perfect agreement rather than bitwise equality
    agree = (count == oc).mean()
    assert agree > 0.999, f"count agreement {agree}"
    zb = np.asarray(state.zbuf)
    # set-masks must coincide exactly, and where both set the depths must
    # agree. Tolerance: XLA-CPU and numpy f32 steps round differently
    # (fma/fusion), and ~130 chaotic steps amplify that to ~1e-4 in z
    # (measured max 6e-4) — use 2e-3, far below the pixel quantum (~2e-2)
    # that the exact count agreement above already pins down.
    mask_mismatch = (zb == -1) != (oz == -1)
    assert mask_mismatch.sum() == 0, f"{mask_mismatch.sum()} set-mask mismatches"
    value_mismatch = ~np.isclose(zb, oz, atol=2e-3) & (zb != -1) & (oz != -1)
    assert value_mismatch.mean() < 0.01, f"z disagreement on {value_mismatch.sum()} px"


@pytest.mark.parametrize("preset", ["poisson-saturne", "solar-sail"])
def test_long_horizon_statistical(preset):
    cfg = presets.by_name(
        preset,
        width=96, height=54, iterations=400_000, lanes=128, chunk_steps=125,
        warmup=1000, seed=3, bin_strategy=BinStrategy.EXACT, transparent=False,
    )
    key = seed_key(cfg)
    state = render(cfg, key=key)
    img = np.asarray(jax.device_get(colorize(cfg, state)))

    # oracle with DIFFERENT trajectories (its own seeds) but same config:
    # histograms must agree statistically after tone mapping
    rng = np.random.default_rng(0)
    seeds = (rng.random((8, 3)) * 0.1).astype(np.float32)
    oc, os_, oz = oracle_render(cfg, seeds, steps_per_lane=50_000)
    want = oracle_colorize(cfg, oc, os_, oz)

    got = img[..., :3].astype(np.float64) / 65535.0
    ref = want[..., :3].astype(np.float64) / 65535.0
    mad = np.abs(got - ref).mean()
    assert mad < 0.035, f"mean abs tone-mapped diff {mad}"
    # support overlap: pixels visited should mostly coincide
    va, vb = np.asarray(state.count) > 0, oc > 0
    overlap = (va & vb).sum() / max(1, (va | vb).sum())
    assert overlap > 0.80, f"support overlap {overlap}"


def test_packed_vs_exact_same_trajectories():
    cfg = presets.poisson_saturne(
        width=96, height=54, iterations=200_000, lanes=128, chunk_steps=125,
        seed=11, transparent=True,
    )
    key = seed_key(cfg)
    st_e = render(cfg.replace(bin_strategy=BinStrategy.EXACT), key=key)
    st_p = render(
        cfg.replace(bin_strategy=BinStrategy.PACKED),
        RenderState.create(cfg, BinStrategy.PACKED),
        key=key,
    )
    np.testing.assert_array_equal(np.asarray(st_e.count), np.asarray(st_p.count))
    img_e = np.asarray(jax.device_get(colorize(cfg, st_e))).astype(np.int64)
    img_p = np.asarray(jax.device_get(colorize(cfg, st_p))).astype(np.int64)
    # packed quantizes the palette position to 1/4096 and depth to ~2^-11:
    # tone-mapped images agree to a fraction of a percent
    assert np.abs(img_e - img_p).mean() < 0.005 * 65535
    assert (np.abs(img_e - img_p) > 0.02 * 65535).mean() < 0.01


def test_progressive_accumulation():
    """render() without reset keeps building the image (src/lib.rs:742-744)."""
    cfg = presets.poisson_saturne(
        width=48, height=27, iterations=50_000, lanes=64, seed=5,
        bin_strategy=BinStrategy.EXACT,
    )
    st1 = render(cfg, key=jax.random.PRNGKey(0))
    total1 = int(st1.count.sum())
    st2 = render(cfg, st1, key=jax.random.PRNGKey(1))
    total2 = int(st2.count.sum())
    assert total2 > total1 > 0
    # zbuf only improves (monotone under accumulation)
    assert np.all(np.asarray(st2.zbuf) >= np.asarray(st1.zbuf) - 1e-6)


def test_angle_changes_output_without_recompile():
    cfg = presets.poisson_saturne(
        width=48, height=27, iterations=50_000, lanes=64, seed=5,
    )
    img0 = render(cfg, key=jax.random.PRNGKey(0), angle=0.0)
    img1 = render(cfg, key=jax.random.PRNGKey(0), angle=2.0)
    assert not np.array_equal(np.asarray(img0.count), np.asarray(img1.count))


def test_reseed_lanes_recovers_escaped_orbits():
    """solar-sail loses ~40% of its lanes to escaping orbits (a property of
    the coefficients, present in the reference's f64 math too); with
    reseed_lanes the sample count recovers and the image only gains samples."""
    base = presets.by_name(
        "solar-sail",
        width=96, height=54, iterations=400_000, lanes=128, chunk_steps=125,
        warmup=200, seed=3,
    )
    st_off = render(base, key=jax.random.PRNGKey(5))
    st_on = render(base.replace(reseed_lanes=True), key=jax.random.PRNGKey(5))
    c_off = np.asarray(st_off.count).astype(np.int64)
    c_on = np.asarray(st_on.count).astype(np.int64)
    # without reseeding, escaped lanes flood pixel (0,0) with NaN points
    # (reference quirk); with reseeding they contribute real samples instead
    useful_off = c_off.sum() - c_off[0, 0]
    useful_on = c_on.sum() - c_on[0, 0]
    assert useful_on > 1.2 * useful_off, (useful_on, useful_off)
    assert c_on[0, 0] < c_off[0, 0]
    # same attractor support: reseeded render covers at least what the
    # baseline covers (statistically)
    va = c_off > 1
    vb = c_on > 0
    assert (va & vb).sum() / max(1, va.sum()) > 0.95


def test_depth_strategy_matches_exact_zbuf():
    """DEPTH strategy (z-buffer-only accumulation) produces the identical
    depth image to the EXACT strategy on the same trajectories."""
    from strange_attractor_tpu.config import RenderKind

    cfg = presets.poisson_saturne(
        width=96, height=54, iterations=100_000, lanes=128, chunk_steps=125,
        seed=11, render=RenderKind.DEPTH,
    )
    key = seed_key(cfg)
    st_d = render(cfg.replace(bin_strategy=BinStrategy.DEPTH), key=key)
    st_e = render(cfg.replace(bin_strategy=BinStrategy.EXACT), key=key)
    assert st_d.strategy == BinStrategy.DEPTH and st_d.count is None
    np.testing.assert_array_equal(np.asarray(st_d.zbuf), np.asarray(st_e.zbuf))
    img_d = np.asarray(jax.device_get(colorize(cfg, st_d)))
    img_e = np.asarray(jax.device_get(colorize(cfg, st_e)))
    np.testing.assert_array_equal(img_d, img_e)
    # a DEPTH state cannot be colorized as Gas
    with pytest.raises(ValueError, match="DEPTH"):
        colorize(cfg.replace(render=RenderKind.GAS), st_d)


def test_progressive_refinement_adds_new_samples_with_seed():
    """Seeded configs must not replay identical trajectories on progressive
    calls (render folds a per-call nonce into the key)."""
    cfg = presets.poisson_saturne(
        width=48, height=27, iterations=50_000, lanes=64, seed=123,
        bin_strategy=BinStrategy.EXACT,
    )
    s1 = render(cfg)
    s2 = render(cfg, s1)
    c1 = np.asarray(s1.count).astype(np.int64)
    c2 = np.asarray(s2.count).astype(np.int64)
    assert c2.sum() == 2 * c1.sum()
    # a pure replay would give exactly c2 == 2*c1 everywhere
    assert not np.array_equal(c2, 2 * c1)


def test_progressive_nonce_is_state_derived():
    """A seeded progressive render depends only on its starting state —
    interleaved unrelated renders must not perturb it (round-1 advisor
    finding: the old process-global nonce counter leaked call order)."""
    cfg = presets.poisson_saturne(
        width=32, height=18, iterations=20_000, lanes=64, seed=9,
        bin_strategy=BinStrategy.EXACT,
    )
    s1 = render(cfg)
    s2 = render(cfg, s1)
    # same sequence again, but with unrelated seeded progressive renders
    # interleaved (these would advance any global counter)
    other = cfg.replace(seed=77)
    render(other, render(other))
    t1 = render(cfg)
    t2 = render(cfg, t1)
    np.testing.assert_array_equal(np.asarray(s1.count), np.asarray(t1.count))
    np.testing.assert_array_equal(np.asarray(s2.count), np.asarray(t2.count))


def test_state_shape_mismatch_raises():
    cfg = presets.poisson_saturne(iterations=1000, width=32, height=18, lanes=32)
    st = render(cfg)
    with pytest.raises(ValueError, match="canvas"):
        render(cfg.replace(width=64, height=36), st)


def test_on_progress_callback():
    calls = []
    cfg = presets.poisson_saturne(
        width=32, height=18, iterations=32 * 64 * 40, lanes=32, chunk_steps=64,
        seed=2,
    )
    st = render(cfg, on_progress=lambda done, total, s: calls.append((done, total, int(s.count.sum()))))
    assert len(calls) >= 1
    dones = [c[0] for c in calls]
    assert dones == sorted(dones) and calls[-1][0] == calls[-1][1]
    # accumulation is monotone across progress reports
    sums = [c[2] for c in calls]
    assert sums == sorted(sums)
    assert int(st.count.sum()) == sums[-1]


def test_depth_kernel_render_matches_depth_scatter():
    """Full render pipeline: DEPTH_KERNEL zbuf == DEPTH scatter zbuf exactly
    (same emission stream, different accumulation path)."""
    from strange_attractor_tpu import render
    from strange_attractor_tpu.config import BinStrategy, RenderKind
    from strange_attractor_tpu.models import presets

    base = presets.poisson_saturne(
        width=64, height=36, iterations=40_000, lanes=64, chunk_steps=64,
        seed=11, render=RenderKind.DEPTH,
    )
    st_k = render(base.replace(bin_strategy=BinStrategy.DEPTH_KERNEL))
    st_s = render(base.replace(bin_strategy=BinStrategy.DEPTH))
    zk = np.asarray(st_k.zbuf)
    zs = np.asarray(st_s.zbuf)
    np.testing.assert_array_equal(zk, zs)
    assert (zk != -1.0).any()
