"""BinStrategy.KERNEL: sort-bin canvas accumulation for TPU.

The reference's hot loop does per-point random-access writes into megapixel
buffers and names that as its own bottleneck (src/lib.rs:31-35). The XLA
scatter path (ops/binning.py) hits the TPU scalar-scatter floor of ~8 ns per
update (docs/KERNEL_NOTES.md). This module replaces the scatters with a
vectorized pipeline:

1. **Pair sort (XLA)**: each chunk of emitted points — (flat pixel u32,
   packed depth+value u32) — is split into sections of ``section`` points
   and lexicographically sorted by (flat, packed) with ``lax.sort``.
   Measured on v5e: 2.5-3.1 ns/pt (it beats the hand-rolled Pallas bitonic
   from round 1 by ~5x; see docs/KERNEL_NOTES.md round-2 table).
2. **Row apply (Pallas)**: the canvas lives in VMEM as (alloc_rows, 128)
   u32 planes (flat pixel p at [p // 128, p % 128]). Each 128 consecutive
   sorted points form one sublane row; a ``fori_loop`` walks rows with
   dynamic *sublane* slices (dynamic lane slicing is unsupported — this
   layout is what makes the loop legal and keeps the Mosaic program tiny:
   ~1 s compiles vs the 255-805 s of round 1's 128-column unroll).
   Per row, one-hot matrices are built by comparing a sublane iota against
   the lane-broadcast pixel rows, and a single stacked lane-contraction
   matmul ``dot_general(e_row, [e_col | 4 byte planes], ((1,), (1,)))``
   yields the window's count tile and the packed winner's four byte planes
   at once. Contributions accumulate in an f32 VMEM scratch tile and flush
   to the canvas only when the 16384-pixel window changes (sorted order
   visits windows monotonically), so canvas read-modify-write traffic is
   ~one sweep per section instead of one per row.

Winner correctness: within a section the points of one pixel form one
contiguous run whose *last* element has the maximal packed value (pair
sort); ``is_end`` marks exactly one point per pixel per row, so the byte
sums hold each winner's bytes exactly (<= 255 each, exact in bf16/f32).
Rows that conservatively mark their last lane as an end can only inject a
smaller-or-equal packed value, which the canvas ``max`` absorbs. Counts
count every point, ends or not — matching the reference's unconditional
``count[i,j] += 1`` (src/lib.rs:807-816) with the z-test applied only to
the packed plane (src/lib.rs:818-833).

Out-of-bounds points (``flat == npix`` from the step function) are remapped
to a sentinel pixel inside a garbage window appended after the canvas, so
they sort last and their bins land in rows that are sliced away — the
vectorized form of the bounds-check ``continue`` (src/lib.rs:789-795).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
WINDOW_ROWS = 128  # canvas rows per apply window (= 16384 pixels)
DEFAULT_SECTION = 1 << 16


def canvas_geometry(npix: int) -> tuple[int, int]:
    """(alloc_rows, sentinel_flat): canvas rows padded to whole windows plus
    one garbage window that absorbs out-of-bounds points."""
    nrows = -(-npix // LANES)
    alloc_rows = -(-nrows // WINDOW_ROWS) * WINDOW_ROWS + WINDOW_ROWS
    sentinel = (alloc_rows - WINDOW_ROWS) * LANES
    return alloc_rows, sentinel


def _apply_kernel(f_ref, p_ref, cnt_ref, pk_ref, acc_ref, nrows: int):
    """One sorted section -> delta-canvas accumulation (see module docstring).

    The kernel produces a per-chunk *delta* canvas (zeroed on the first grid
    step) that the caller folds into the persistent canvas with an XLA
    add/max — input/output aliasing of a carried canvas inside ``lax.scan``
    corrupted planes on real hardware (round-2 note in KERNEL_NOTES.md),
    and the delta merge costs only ~0.06 ns/pt of HBM traffic.
    """
    sub = lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    lane1 = lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    @pl.when(pl.program_id(0) == 0)
    def _():
        cnt_ref[:, :] = jnp.zeros_like(cnt_ref)
        pk_ref[:, :] = jnp.zeros_like(pk_ref)

    acc_ref[:, :] = jnp.zeros_like(acc_ref)

    def flush(cur):
        # write the accumulated window tile back to the canvas
        @pl.when(cur >= 0)
        def _():
            base = cur * WINDOW_ROWS
            a = acc_ref[:, :]
            cnt_w = a[:, :128].astype(jnp.int32).astype(jnp.uint32)
            b0 = a[:, 128:256].astype(jnp.int32).astype(jnp.uint32)
            b1 = a[:, 256:384].astype(jnp.int32).astype(jnp.uint32)
            b2 = a[:, 384:512].astype(jnp.int32).astype(jnp.uint32)
            b3 = a[:, 512:640].astype(jnp.int32).astype(jnp.uint32)
            pk_new = (b3 << 24) | (b2 << 16) | (b1 << 8) | b0
            cnt_ref[pl.ds(base, 128), :] += cnt_w
            old = pk_ref[pl.ds(base, 128), :]
            pk_ref[pl.ds(base, 128), :] = jnp.where(old < pk_new, pk_new, old)
            acc_ref[:, :] = jnp.zeros_like(acc_ref)

    def row_body(r, cur):
        f_row = f_ref[0, pl.ds(r, 1), :]  # (1, 128) u32, sorted
        p_row = p_ref[0, pl.ds(r, 1), :]
        # segment ends: the last point of each pixel's run holds its max
        # packed value (pair sort). Exactness matters — the window scratch
        # SUMS byte planes across rows, so each pixel must contribute at most
        # one end per section: lane 127 compares against the NEXT row's first
        # point (rolled into lane 127), and only the section's final row
        # forces an end (cross-section duplicates are absorbed by the canvas
        # max, not the sums).
        f_next = f_ref[0, pl.ds(jnp.minimum(r + 1, nrows - 1), 1), :]
        nxt = jnp.where(
            lane1 == 127, pltpu.roll(f_next, 127, 1), pltpu.roll(f_row, 127, 1)
        )
        is_end = (f_row != nxt) | ((lane1 == 127) & (r == nrows - 1))
        fi = f_row.astype(jnp.int32)
        crow = fi >> 7
        ccol = fi & 127
        wmin = jnp.min(crow) // WINDOW_ROWS
        wmax = jnp.max(crow) // WINDOW_ROWS

        endb = is_end.astype(jnp.bfloat16)
        e_col = (sub == ccol).astype(jnp.bfloat16)  # (128 pixcol, 128 pts)
        planes = [e_col]
        for b in range(4):
            vb = ((p_row >> (8 * b)) & 255).astype(jnp.int32).astype(jnp.bfloat16)
            planes.append(e_col * (vb * endb))
        stack = jnp.concatenate(planes, axis=0)  # (640, 128 pts)

        def win_body(state):
            w, cur = state

            @pl.when(cur != w)
            def _():
                flush(cur)

            e_row = (sub == (crow - w * WINDOW_ROWS)).astype(jnp.bfloat16)
            out = lax.dot_general(
                e_row, stack, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # (128 pixrow, 640)
            acc_ref[:, :] += out
            return w + 1, w

        _, cur = lax.while_loop(lambda s: s[0] <= wmax, win_body, (wmin, cur))
        return cur

    cur = lax.fori_loop(0, nrows, row_body, jnp.int32(-1))
    flush(cur)


@functools.partial(jax.jit, static_argnames=("npix", "section", "interpret"))
def bin_chunk_kernel(count, packed, flat, packed_update, *, npix: int,
                     section: int = DEFAULT_SECTION, interpret: bool = False):
    """Accumulate one point chunk into padded canvas planes.

    ``count``/``packed`` are flattened padded planes of ``padded_size(npix)``
    elements (see :func:`pad_planes`). ``flat`` is int32 with ``npix``
    marking out-of-bounds points (the step function's convention);
    ``packed_update`` is the uint32 (depth, value) packing of
    ``ops.binning.pack_zv``. Returns updated (count, packed).
    """
    alloc_rows, sentinel = canvas_geometry(npix)
    m = flat.size
    sec = min(section, _round_pow2(m))
    pad = (-m) % sec
    fu = jnp.where(flat == npix, jnp.uint32(sentinel), flat.astype(jnp.uint32))
    if pad:
        fu = jnp.concatenate([fu, jnp.full((pad,), sentinel, jnp.uint32)])
        packed_update = jnp.concatenate([packed_update, jnp.zeros((pad,), jnp.uint32)])
    S = fu.size // sec
    R_s = sec // LANES
    fs, ps = lax.sort((fu.reshape(S, sec), packed_update.reshape(S, sec)), dimension=1, num_keys=2)

    kern = functools.partial(_apply_kernel, nrows=R_s)
    dcnt, dpk = pl.pallas_call(
        kern,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, R_s, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R_s, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((alloc_rows, LANES), jnp.uint32)] * 2,
        out_specs=[
            pl.BlockSpec((alloc_rows, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM)
        ] * 2,
        scratch_shapes=[pltpu.VMEM((128, 640), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(fs.reshape(S, R_s, LANES), ps.reshape(S, R_s, LANES))
    count = count + dcnt.reshape(-1)
    packed = jnp.maximum(packed, dpk.reshape(-1))
    return count, packed


def _round_pow2(n: int) -> int:
    """Largest power of two <= n (sections must be 128-row pow2 blocks)."""
    return 1 << max(7, (n.bit_length() - 1))


def padded_size(npix: int) -> int:
    """Flat length of the padded canvas planes for ``npix`` pixels."""
    alloc_rows, _ = canvas_geometry(npix)
    return alloc_rows * LANES


def pad_planes(count, packed, npix: int):
    """Grow standard (npix,) planes to the padded kernel layout."""
    extra = padded_size(npix) - npix
    z = jnp.zeros((extra,), jnp.uint32)
    return jnp.concatenate([count, z]), jnp.concatenate([packed, z])


def slice_planes(count_pad, packed_pad, npix: int):
    """Back to standard (npix,) planes (drops padding + the garbage window)."""
    return count_pad[:npix], packed_pad[:npix]
