"""Research Pallas kernels for the sort-bin binning pipeline (round-2 work).

These are the validated-but-not-yet-integrated building blocks measured in
docs/KERNEL_NOTES.md. Both compile and produce exact results on TPU v5e; the
composition is not yet fast enough to replace the XLA scatter path
(ops/binning.py), so nothing in the production render uses this module.

- :func:`bitonic_sort_pairs`: full in-VMEM lexicographic bitonic sort of
  (key, payload) uint32 chunks laid out column-major as (R, 128).
  Measured: exact vs ``np.lexsort``; ~15.5 ns/pt at (2048, 128).
- :func:`window_apply`: MXU one-hot binning of sorted chunks into canvas
  count/packed planes: per column (2048 consecutive sorted points ≈ one
  16384-pixel window) build row/col one-hots and byte-plane matmuls, apply
  at a dynamic 128-row canvas window with add/max semantics.
  Measured: exact vs numpy add/max reference.

Known constraints (see KERNEL_NOTES for the full list): static roll shifts
only (dynamic shifts are ~1000x slower), no bool-valued selects, no
``maxui``, route u32<->f32 casts through i32, keep programs small or Mosaic
compile time explodes, and express cross-lane math as lane rolls or the
axis-1 crossbar gather — never 3D broadcasts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _sort_pair_body(f, p, R):
    """171-stage (for R*128 = 2^18) bitonic network on column-major layout:
    global index i = col * R + row; distances < R exchange along sublanes,
    larger distances along lanes."""
    C = LANES
    M = R * C
    logm = M.bit_length() - 1
    row_id = lax.broadcasted_iota(jnp.int32, (R, C), 0)
    col_id = lax.broadcasted_iota(jnp.int32, (R, C), 1)
    gidx = col_id * R + row_id

    for k in range(1, logm + 1):
        # all-true final-pass mask must be a constant: `gidx >= 0` sends the
        # Mosaic compiler into a multi-minute hang (KERNEL_NOTES)
        asc = ((gidx & (1 << k)) == 0) if k < logm else jnp.ones((R, C), jnp.bool_)
        for j in reversed(range(k)):
            d = 1 << j
            if d < R:
                axis, dl, bits = 0, d, row_id
            else:
                axis, dl, bits = 1, d // R, col_id
            size = R if axis == 0 else C
            fa = pltpu.roll(f, size - dl, axis)
            fb = pltpu.roll(f, dl, axis)
            pa = pltpu.roll(p, size - dl, axis)
            pb = pltpu.roll(p, dl, axis)
            bit_set = (bits & dl) != 0
            pf = jnp.where(bit_set, fb, fa)
            pp = jnp.where(bit_set, pb, pa)
            eq = pf == f
            p_less = (pf < f) | (eq & (pp < p))
            p_gt = (f < pf) | (eq & (p < pp))
            want_min = (~bit_set) == asc
            take = (want_min & p_less) | ((~want_min) & p_gt)
            f = jnp.where(take, pf, f)
            p = jnp.where(take, pp, p)
    return f, p


def bitonic_sort_pairs(flat, packed, *, vmem_mb: int = 100):
    """Sort (S, R, 128) uint32 chunks by (flat, packed) lexicographic.

    Layout: element ``i`` of a chunk lives at ``[i % R, i // R]``
    (column-major); each grid step sorts one chunk entirely in VMEM.
    """
    S, R, C = flat.shape
    assert C == LANES and (R & (R - 1)) == 0

    def kern(f_ref, p_ref, of_ref, op_ref):
        f, p = _sort_pair_body(f_ref[0], p_ref[0], R)
        of_ref[0] = f
        op_ref[0] = p

    return pl.pallas_call(
        kern,
        grid=(S,),
        in_specs=[pl.BlockSpec((1, R, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((S, R, C), jnp.uint32)] * 2,
        out_specs=[pl.BlockSpec((1, R, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)] * 2,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024),
    )(flat, packed)


def canvas_geometry(npix: int) -> tuple[int, int]:
    """(alloc_rows, sentinel_flat): canvas rows padded to a whole number of
    128-row windows plus one garbage window that absorbs out-of-bounds
    points (their one-hot rows fall only in that window)."""
    nrows = -(-npix // LANES)
    alloc_rows = -(-nrows // LANES) * LANES + LANES
    sentinel = (alloc_rows - LANES) * LANES
    return alloc_rows, sentinel


def window_apply(flat_sorted, packed_sorted, npix: int, *, vmem_mb: int = 100):
    """Apply sorted chunks to (count, packed) canvas planes via MXU one-hots.

    ``flat_sorted``/``packed_sorted`` are (S, R, 128) sorted chunks
    (column-major) from :func:`bitonic_sort_pairs` with out-of-bounds points
    mapped to ``canvas_geometry(npix)[1]``. Returns (alloc_rows, 128) uint32
    count and packed planes; rows beyond ``npix // 128`` are garbage.

    Exact: count adds every point; packed takes the per-pixel max via
    segment-end masking (sorted order makes the last point of each pixel's
    run the max) and 4 byte-plane matmuls (bf16 holds 0..255 exactly).
    """
    S, R, C = flat_sorted.shape
    assert C == LANES
    alloc_rows, _ = canvas_geometry(npix)
    nwin = alloc_rows // LANES

    def kern(f_ref, p_ref, count_ref, pk_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            count_ref[:, :] = jnp.zeros_like(count_ref)
            pk_ref[:, :] = jnp.zeros_like(pk_ref)

        f = f_ref[0]
        p = p_ref[0]
        row_id = lax.broadcasted_iota(jnp.int32, (R, C), 0)
        col_id = lax.broadcasted_iota(jnp.int32, (R, C), 1)
        # next element in column-major global order
        a_f = pltpu.roll(f, R - 1, 0)
        nf = jnp.where(row_id < R - 1, a_f, pltpu.roll(a_f, C - 1, 1))
        is_end = (f != nf) | ((row_id == R - 1) & (col_id == C - 1))
        lane = lax.broadcasted_iota(jnp.int32, (R, 128), 1)

        for c in range(C):
            fcol = f[:, c : c + 1]
            pcol = p[:, c : c + 1]
            endf = is_end[:, c : c + 1].astype(jnp.bfloat16)
            crow = (fcol >> 7).astype(jnp.int32)
            ccol = (fcol & 127).astype(jnp.int32)
            e_col = (ccol == lane).astype(jnp.bfloat16)
            ev = []
            for b in range(4):
                vb = ((pcol >> (8 * b)) & 255).astype(jnp.int32).astype(jnp.bfloat16)
                ev.append(e_col * (vb * endf))
            wid = crow >> 7
            dn = (((0,), (0,)), ((), ()))

            def win_body(state):
                w, _ = state
                base = w * 128
                e_row = ((crow - base) == lane).astype(jnp.bfloat16)
                cw = lax.dot_general(e_row, e_col, dn, preferred_element_type=jnp.float32)
                old = count_ref[pl.ds(base, 128), :]
                count_ref[pl.ds(base, 128), :] = old + cw.astype(jnp.int32).astype(jnp.uint32)
                wb = [
                    lax.dot_general(e_row, ev[b], dn, preferred_element_type=jnp.float32)
                    .astype(jnp.int32)
                    .astype(jnp.uint32)
                    for b in range(4)
                ]
                pk_new = (wb[3] << 24) | (wb[2] << 16) | (wb[1] << 8) | wb[0]
                oldp = pk_ref[pl.ds(base, 128), :]
                # no maxui in Mosaic: compare+select
                pk_ref[pl.ds(base, 128), :] = jnp.where(oldp < pk_new, pk_new, oldp)
                nxt = jnp.min(jnp.where(wid > w, wid, jnp.int32(nwin)))
                return nxt, 0

            lax.while_loop(lambda s: s[0] < nwin, win_body, (jnp.min(wid), 0))

    return pl.pallas_call(
        kern,
        grid=(S,),
        in_specs=[pl.BlockSpec((1, R, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((alloc_rows, 128), jnp.uint32)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024),
    )(flat_sorted, packed_sorted)
