"""Pallas TPU kernel for the z-sorted-column (zcol) pair force pass.

The dense cell kernel (ops/pallas_pair) evaluates 14 * cell_cap ~ 504
candidate lanes per atom because candidates are quantized to whole cells
(cell size >= cutneigh) and every cell carries slot padding. This kernel
removes both quantizations: atoms are stored z-SORTED and COMPACTED per
xy-column (ops/zcolforce), so the candidates of a 16-row chunk are five
contiguous row windows (self column upward + 4 half-stencil neighbor
columns two-sided, ~336 lanes total) extracted at dynamic offsets with
lane rolls. That is ~1.7x less pair work per atom than the cell kernel at
LJ-melt density — the TPU analog of the reference's tight per-atom half
neighbor lists (ref: src/npair_half_bin_newton.cpp,
src/KOKKOS/pair_kokkos.h:53-185) without any per-pair gather.

Row space per column (built by ops/zcolforce._ext_arrays + an in-kernel
compaction): [gh bottom ghosts (top atoms, z-Lz) | fill real atoms,
z-ascending | gh top copies (bottom atoms, z+Lz, ids +idcap) | BIG junk].
The real region ends with padding rows in HBM; the kernel closes that gap
with ONE dynamic lane roll per column pair (the compaction), so every
window is a contiguous slice of a cyclic z-ordered row axis and the z
wrap needs no minimum-image arithmetic.

Newton's third law: each unordered COLUMN pair appears in exactly one
direction of the half stencil {(0,1),(1,-1),(1,0),(1,1)}, so cross-window
candidate ids are biased +idcap (always "greater"); z-wrap pairs are
visited only through the lower atom's window into the top copies (biased
+idcap at build); within the self column the row ordering IS the z
ordering, so `own_id < cand_id` both halves the work and kills self
pairs. Reactions accumulate into per-column buffers over the compacted
row axis; the XLA side folds ghost/copy rows back onto their sources.
The TPU grid executes SEQUENTIALLY, so cross-program += is race-free
(same idiom as ops/pallas_pair).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_pair import _terms_from_key

# half stencil in xy-column space: each unordered column pair is visited
# exactly once (requires nx, ny >= 3 so offsets are distinct under wrap)
_XYHALF = ((0, 1), (1, -1), (1, 0), (1, 1))


def _zcol_kernel(key, nx, ny, colcap, chunk, w_self, w_cross, gh, idcap,
                 prd_ref, starts_ref, fills_ref, ext_ref, extT_ref,
                 fT_ref, racc_ref, cblk):
    """Program = one xy-column. ext_ref: [ncol, 4, G] (x, y, z, id);
    extT_ref: per-column block [1, colcap, 4] (real rows on sublanes); starts_ref:
    SMEM [ncol, nchunk*5] window starts (slot 0 of each
    5-group = self; compacted row coords);
    fills_ref: SMEM [ncol] valid-atom counts; fT_ref out block
    [1, colcap, 3] own forces; racc_ref [ncol, 3, G] reaction accumulator
    (compacted row coords); cblk scratch [5, 4, G] compacted neighbor
    blocks."""
    c = pl.program_id(0)
    nyi = jnp.int32(ny)
    nxi = jnp.int32(nx)
    cx = c // nyi
    cy = c - cx * nyi
    cutsq = key[-1]
    G = ext_ref.shape[-1]
    nchunk = colcap // chunk
    dt = racc_ref.dtype

    @pl.when(c == 0)
    def _():
        racc_ref[...] = jnp.zeros(racc_ref.shape, dt)

    # neighbor column ids + xy wrap shifts (scalars)
    cols = [(c, jnp.zeros((), dt), jnp.zeros((), dt))]
    for dx, dy in _XYHALF:
        wx = cx + jnp.int32(dx)
        wy = cy + jnp.int32(dy)
        ncx = jax.lax.rem(wx + nxi, nxi)
        ncy = jax.lax.rem(wy + nyi, nyi)
        sx = jnp.where(wx < 0, -prd_ref[0],
                       jnp.where(wx >= nxi, prd_ref[0], 0.0)).astype(dt)
        sy = jnp.where(wy < 0, -prd_ref[1],
                       jnp.where(wy >= nyi, prd_ref[1], 0.0)).astype(dt)
        cols.append((ncx * nyi + ncy, sx, sy))

    # ---- per-column compaction: close the [fill, colcap) pad gap so the
    # row axis is contiguous z-order: [bot gh | real fill | top gh | junk]
    lane = jax.lax.broadcasted_iota(jnp.int32, (4, G), 1)
    big = jnp.asarray(1.0e8, dt)
    for k, (nc, _, _) in enumerate(cols):
        blk = ext_ref[nc]                                  # [4, G]
        fill = fills_ref[nc]
        rolled = pltpu.roll(blk, fill - colcap, 1)
        out = jnp.where(lane < gh + fill, blk,
                        jnp.where(lane < gh + fill + gh, rolled, big))
        cblk[k] = out

    # window k occupies lanes [offs[k], offs[k] + w_k) of the full-G pair
    # block; assembly is masked full-width rolls (Mosaic dislikes
    # sub-tile-aligned stores), the tail lanes [wtot, G) stay BIG
    offs = [0, w_self]
    for _ in range(3):
        offs.append(offs[-1] + w_cross)
    widths = [w_self] + [w_cross] * 4
    zero = jnp.zeros((), dt)
    bias = jnp.asarray(idcap, dt)
    lane4 = lane  # [4, G] lane iota from the compaction above
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (3, G), 1)

    def _do_chunk(t, r0):
        # ---- candidate assembly: win [4, G] via masked rolls ----
        w = jnp.full((4, G), big, dt)
        for k in range(5):
            o = offs[k]
            s = starts_ref[c, t * 5 + k]
            part = pltpu.roll(cblk[k], o - s, 1)
            if k:
                _, sx, sy = cols[k]
                part = part + jnp.stack([sx, sy, zero, bias])[:, None]
            inwin = jnp.logical_and(lane4 >= o, lane4 < o + widths[k])
            w = jnp.where(inwin, part, w)

        # ---- own chunk (sublane-major read: [chunk, 1]; extT holds the
        # real rows only, no ghost offset) ----
        q0 = t * chunk
        own_x = extT_ref[0, q0:q0 + chunk, 0:1]            # [chunk, 1]
        own_y = extT_ref[0, q0:q0 + chunk, 1:2]
        own_z = extT_ref[0, q0:q0 + chunk, 2:3]
        own_i = extT_ref[0, q0:q0 + chunk, 3:4]

        cx_ = w[0][None, :]                                # [1, G]
        cy_ = w[1][None, :]
        cz_ = w[2][None, :]
        ci_ = w[3][None, :]

        dxv = own_x - cx_                                  # [chunk, G]
        dyv = own_y - cy_
        dzv = own_z - cz_
        r2 = dxv * dxv + dyv * dyv + dzv * dzv
        valid = jnp.logical_and(own_i < ci_, r2 < cutsq)
        fpair = jnp.where(valid, _terms_from_key(key, r2), 0.0)

        fij_x = dxv * fpair
        fij_y = dyv * fpair
        fij_z = dzv * fpair

        # own forces -> output block (rows on sublanes, xyz on lanes)
        fsum = jnp.concatenate([
            jnp.sum(fij_x, axis=1, keepdims=True),
            jnp.sum(fij_y, axis=1, keepdims=True),
            jnp.sum(fij_z, axis=1, keepdims=True),
        ], axis=1)                                          # [chunk, 3]
        fT_ref[0, t * chunk:(t + 1) * chunk, :] = fsum

        # reactions: -sum over own rows, rolled back to window positions
        rmat = jnp.stack([
            jnp.sum(fij_x, axis=0),
            jnp.sum(fij_y, axis=0),
            jnp.sum(fij_z, axis=0),
        ])                                                  # [3, G]
        for k in range(5):
            o = offs[k]
            s = starts_ref[c, t * 5 + k]
            nc = cols[k][0]
            inwin = jnp.logical_and(lane3 >= o, lane3 < o + widths[k])
            rk = jnp.where(inwin, rmat, 0.0)
            racc_ref[nc] -= pltpu.roll(rk, s - o, 1)

    fill_c = fills_ref[c]
    for t in range(nchunk):
        # all-pad chunks beyond this column's fill do no pair work (their
        # own rows can never validate) — predicate the whole chunk body,
        # but their output rows still need zeroing
        @pl.when(t * chunk < fill_c)
        def _(t=t):
            _do_chunk(t, gh + t * chunk)

        @pl.when(t * chunk >= fill_c)
        def _(t=t):
            fT_ref[0, t * chunk:(t + 1) * chunk, :] = jnp.zeros(
                (chunk, 3), dt)


@functools.partial(jax.jit, static_argnames=(
    "key", "nx", "ny", "colcap", "chunk", "w_self", "w_cross", "gh",
    "idcap"))
def zcol_half_force_pallas(key, nx, ny, colcap, chunk, w_self, w_cross,
                           gh, idcap, ext, extT, starts, fills, prd):
    """ext: [ncol, 4, G], extT: [ncol, colcap, 4], starts: [ncol, nchunk*5]
    int32, fills: [ncol] int32, prd: [3]. Returns
    (fT [ncol, colcap, 3], racc [ncol, 3, G])."""
    ncol, _, G = ext.shape
    dt = ext.dtype
    kern = functools.partial(
        _zcol_kernel, key, nx, ny, colcap, chunk, w_self, w_cross, gh,
        idcap)
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        kern,
        grid=(ncol,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # prd
            pl.BlockSpec(memory_space=pltpu.SMEM),   # starts
            pl.BlockSpec(memory_space=pltpu.SMEM),   # fills
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ext (full)
            pl.BlockSpec((1, colcap, 4), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),   # extT (per-column)
        ],
        out_specs=[
            pl.BlockSpec((1, colcap, 3), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),   # fT (per-column)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # racc (full)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ncol, colcap, 3), dt),
            jax.ShapeDtypeStruct((ncol, 3, G), dt),
        ],
        scratch_shapes=[pltpu.VMEM((5, 4, G), dt)],
        interpret=interpret,
    )(prd, starts, fills, ext, extT)
