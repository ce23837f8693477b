"""Pallas TPU kernel for the cell-dense pair force pass.

The XLA cell-dense path (ops/cellforce.py) materializes the [cells, cc,
27cc] displacement/force intermediates in HBM (~0.5 GB/step at 32k atoms),
capping it at a fraction of VPU speed-of-light. This kernel performs the
whole per-cell pair evaluation — displacement, minimum image, cutoff mask,
pair closure, force reduction — inside VMEM with zero HBM intermediates
(the Kokkos PairComputeFunctor analog, ref: src/KOKKOS/pair_kokkos.h:53-185,
consuming the dense buckets of src/KOKKOS/nbin_kokkos.cpp).

Layout: SoA blocks with the 27*cc candidate axis as TPU lanes
([B, cc, 27cc] tiles as (8,128) for cc a multiple of 8) — own-block rows
gather once per step outside the kernel; candidates arrive as one
contiguous [ntot, 27cc] tensor.

Validity encoding (no separate mask tensors):
  - invalid atoms sit at BIG (1e8): any pair with one is beyond cutoff;
  - self pairs / invalid-invalid pairs are killed by id equality
    (invalid id = -1 on both sides);
  - padded own rows have scatter id = cap, dropped by the final
    `.at[].set(mode="drop")`.

Styles opt in via `kernel_key()` returning a hashable scalar-coefficient
tuple (single-type only today); box lengths are runtime SMEM scalars so
NPT box changes stay correct. The kernel serves the force-only pass —
energy/virial evaluations (output steps) take the XLA path, matching the
reference's eflag specialization (SURVEY.md §A.7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

BIG = 1.0e8


def _recip(r2):
    """Fast reciprocal: hardware approximate reciprocal (~2^-14 rel err)
    + one Newton-Raphson pass -> ~2^-27 rel err, i.e. f32-exact to the
    last ulp, at a fraction of the full-divide latency. Falls back to the
    exact divide off-TPU (interpret mode) and in f64."""
    if jax.default_backend() == "tpu" and r2.dtype == jnp.float32:
        y = pl.reciprocal(r2, approx=True)
        return y * (2.0 - r2 * y)
    return 1.0 / r2


def _terms_from_key(key, r2):
    """fpair(r2) = F/r for the keyed style (scalar coeffs baked in)."""
    kind = key[0]
    if kind == "lj":
        _, lj1, lj2, _ = key
        r2inv = _recip(r2)
        r6inv = r2inv * r2inv * r2inv
        return r6inv * (lj1 * r6inv - lj2) * r2inv
    raise NotImplementedError(kind)


def _pair_kernel(key, prd_ref,
                 xox, xoy, xoz, io,
                 cax, cay, caz, ic,
                 fx, fy, fz):
    """One block: own [B, cc] vs candidates [B, NJ]."""
    cutsq = key[-1]

    def axis(o, c, prd):
        d = o[:, :, None] - c[:, None, :]  # [B, cc, NJ]
        # minimum image (orthogonal box; candidates are <= 1 wrap away)
        return d - prd * jnp.round(d * (1.0 / prd))

    dx = axis(xox[...], cax[...], prd_ref[0])
    dy = axis(xoy[...], cay[...], prd_ref[1])
    dz = axis(xoz[...], caz[...], prd_ref[2])
    r2 = dx * dx + dy * dy + dz * dz

    icv = ic[...]
    ids_eq = io[...][:, :, None] == icv[:, None, :]
    # invalid candidates (id -1) must be masked by ID, not distance — the
    # minimum image would wrap their BIG sentinel back into the box
    valid = jnp.logical_and(
        jnp.logical_and(jnp.logical_not(ids_eq), (icv >= 0)[:, None, :]),
        r2 < cutsq,
    )
    r2s = jnp.where(valid, r2, 1.0)
    fpair = jnp.where(valid, _terms_from_key(key, r2s), 0.0)

    fx[:, :] = jnp.sum(dx * fpair, axis=-1)
    fy[:, :] = jnp.sum(dy * fpair, axis=-1)
    fz[:, :] = jnp.sum(dz * fpair, axis=-1)


@functools.partial(jax.jit, static_argnames=("key", "block"))
def cell_force_pallas(key, xo, io, ca, ic, prd, block: int = 8):
    """Dense per-cell force pass (see module docstring for the encoding).

    xo: [NC, cc, 3], io: [NC, cc] int32, ca: [NC, NJ, 3], ic: [NC, NJ],
    prd: [3]. NC must be a multiple of `block`. Returns f_own [NC, cc, 3].
    """
    nc, cc, _ = xo.shape
    nj = ca.shape[1]
    dt = xo.dtype

    def bs(w):
        return pl.BlockSpec((block, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    out_shape = [jax.ShapeDtypeStruct((nc, cc), dt) for _ in range(3)]
    kern = functools.partial(_pair_kernel, key)
    interpret = jax.default_backend() != "tpu"
    fx, fy, fz = pl.pallas_call(
        kern,
        grid=(nc // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # prd scalars
            bs(cc), bs(cc), bs(cc), bs(cc),
            bs(nj), bs(nj), bs(nj), bs(nj),
        ],
        out_specs=[bs(cc), bs(cc), bs(cc)],
        out_shape=out_shape,
        interpret=interpret,
    )(prd,
      xo[:, :, 0], xo[:, :, 1], xo[:, :, 2], io,
      ca[:, :, 0], ca[:, :, 1], ca[:, :, 2], ic)
    return jnp.stack([fx, fy, fz], axis=-1)


def _column_kernel(key, nx, ny, nz, cc, prd_ref,
                   gx, gy, gz, gi, fx, fy, fz, cand_scratch):
    """One program per (cx, cy) z-column. The WHOLE cell grid lives in
    VMEM ([nxy, nz, cc] SoA); the 27-cell candidate window [nz, 27cc] is
    assembled in-kernel from 9 neighbor columns x 3 z-rolls — zero HBM
    intermediates, zero XLA gathers."""
    pid = pl.program_id(0)
    nxi, nyi = jnp.int32(nx), jnp.int32(ny)
    cx = pid // nyi
    cy = pid - cx * nyi
    cutsq = key[-1]

    # assemble candidate windows into scratch: [4, nz, 27cc] (x,y,z,id).
    # Periodic wraps are resolved HERE with per-block shifts (a scalar per
    # wrapped x/y column, a per-row vector for the z roll seam), so the hot
    # pair block below needs no minimum-image arithmetic at all.
    zrow = jax.lax.broadcasted_iota(jnp.int32, (nz, 1), 0)
    k = 0
    for dx in (-1, 0, 1):
        wx = cx + jnp.int32(dx)
        ncx = jax.lax.rem(wx + nxi, nxi)
        sx = jnp.where(wx < 0, -prd_ref[0],
                       jnp.where(wx >= nxi, prd_ref[0], 0.0))
        for dy in (-1, 0, 1):
            wy = cy + jnp.int32(dy)
            ncy = jax.lax.rem(wy + nyi, nyi)
            sy = jnp.where(wy < 0, -prd_ref[1],
                           jnp.where(wy >= nyi, prd_ref[1], 0.0))
            ncol = ncx * nyi + ncy
            for ci, (ref, sh) in enumerate(((gx, sx), (gy, sy), (gz, None),
                                            (gi, None))):
                col = ref[ncol]  # [nz, cc]
                if sh is not None:
                    col = col + sh
                for dz in (-1, 0, 1):
                    blk = pltpu.roll(col, (-dz) % nz, axis=0) if dz else col
                    if ci == 2 and dz != 0:
                        # the roll seam row wrapped around the z boundary
                        seam = (zrow == (nz - 1 if dz > 0 else 0))
                        blk = blk + jnp.where(
                            seam, jnp.float32(dz) * prd_ref[2], 0.0
                        ).astype(blk.dtype)
                    cand_scratch[ci, :, (k + dz + 1) * cc:(k + dz + 2) * cc] = blk
            k += 3

    own_x = gx[pid][:, :, None]  # [nz, cc, 1]
    own_y = gy[pid][:, :, None]
    own_z = gz[pid][:, :, None]
    own_i = gi[pid][:, :, None]

    dxv = own_x - cand_scratch[0][:, None, :]  # [nz, cc, 27cc]
    dyv = own_y - cand_scratch[1][:, None, :]
    dzv = own_z - cand_scratch[2][:, None, :]
    r2 = dxv * dxv + dyv * dyv + dzv * dzv

    ic = cand_scratch[3]  # float ids
    # pads sit at PAD_POS (pad-real pairs fail by distance; pad-pad share
    # id -1 and fail the != compare)
    valid = jnp.logical_and(own_i != ic[:, None, :], r2 < cutsq)
    r2s = jnp.where(valid, r2, 1.0)
    fpair = jnp.where(valid, _terms_from_key(key, r2s), 0.0)

    fx[pid] = jnp.sum(dxv * fpair, axis=-1)
    fy[pid] = jnp.sum(dyv * fpair, axis=-1)
    fz[pid] = jnp.sum(dzv * fpair, axis=-1)


# Newton-halved column kernel: the 14 j-blocks per column are the self
# cell (i<j ordering) plus the 13 lexicographically-positive offsets; each
# pair is evaluated ONCE and the reaction is accumulated into the target
# column's output rows. Safe without atomics because the TPU Pallas grid
# executes SEQUENTIALLY (the structural analog of the reference's Newton
# half lists + reverse accumulation, src/npair_half_bin_newton.cpp, with
# the scatter replaced by in-VMEM block adds).
_HALF = [(0, 0, 0), (0, 0, 1),
         (0, 1, -1), (0, 1, 0), (0, 1, 1),
         (1, -1, -1), (1, -1, 0), (1, -1, 1),
         (1, 0, -1), (1, 0, 0), (1, 0, 1),
         (1, 1, -1), (1, 1, 0), (1, 1, 1)]


def _column_half_kernel(key, nx, ny, nz, cc, idcap, prd_ref,
                        gx, gy, gz, fx, fy, fz, cand_scratch,
                        rev_scratch, zb: int = 2):
    """v2 Newton-half column kernel (see benchmarks/prof/prof_halfv2.py
    for the ablation): z-chunked pair math (register-resident
    intermediates instead of whole-column VMEM sweeps), ZERO id lanes —
    Newton i<j in the self block is a STATIC lane>sublane mask, non-self
    blocks are always-valid by half-stencil construction, self pairs and
    pad-pad pairs die on r2>0 (pads share the PAD_POS sentinel), pad-real
    pairs die on distance — and reactions folded per (dx,dy) target in
    registers (5 VMEM += instead of 42)."""
    pid = pl.program_id(0)
    nxi, nyi = jnp.int32(nx), jnp.int32(ny)
    cx = pid // nyi
    cy = pid - cx * nyi
    cutsq = key[-1]
    NB = len(_HALF)

    @pl.when(pid == 0)
    def _():
        z = jnp.zeros_like(fx)
        fx[...] = z
        fy[...] = z
        fz[...] = z

    zrow = jax.lax.broadcasted_iota(jnp.int32, (nz, 1), 0)
    cols = sorted({(dx, dy) for dx, dy, _ in _HALF})
    ncols = {}
    for dx, dy in cols:
        wx = cx + jnp.int32(dx)
        wy = cy + jnp.int32(dy)
        ncx = jax.lax.rem(wx + nxi, nxi)
        ncy = jax.lax.rem(wy + nyi, nyi)
        sx = jnp.where(wx < 0, -prd_ref[0],
                       jnp.where(wx >= nxi, prd_ref[0], 0.0))
        sy = jnp.where(wy < 0, -prd_ref[1],
                       jnp.where(wy >= nyi, prd_ref[1], 0.0))
        ncols[(dx, dy)] = (ncx * nyi + ncy, sx, sy)

    for s, (dx, dy, dz) in enumerate(_HALF):
        ncol, sx, sy = ncols[(dx, dy)]
        for ci, (ref, sh) in enumerate(((gx, sx), (gy, sy), (gz, None))):
            col = ref[ncol]
            if sh is not None:
                col = col + sh
            blk = pltpu.roll(col, (-dz) % nz, axis=0) if dz else col
            if ci == 2 and dz != 0:
                seam = (zrow == (nz - 1 if dz > 0 else 0))
                blk = blk + jnp.where(
                    seam, jnp.float32(dz) * prd_ref[2], 0.0
                ).astype(blk.dtype)
            cand_scratch[ci, :, s * cc:(s + 1) * cc] = blk

    # static Newton bias: the self block (lanes [0, cc)) needs
    # cand_sublane > own_sublane; non-self blocks are unconditionally
    # valid (each cell pair appears exactly once in the half stencil).
    # Folding the mask as an additive BIG bias on r2 collapses the
    # newton/cutoff/self tests into ONE compare — pad rows need no test
    # at all (distinct sentinels: sortedforce.PAD_STEP), and out-of-range
    # r2 feeds _terms_from_key safely (large r2 -> fpair underflows to 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cc, NB * cc), 2)
    own_sub = jax.lax.broadcasted_iota(jnp.int32, (1, cc, NB * cc), 1)
    nbias = jnp.where(
        jnp.logical_and(lane < cc, lane <= own_sub), 1.0e8, 0.0
    ).astype(gx.dtype)

    for z0 in range(0, nz, zb):
        zs = slice(z0, min(z0 + zb, nz))
        own_x = gx[pid, zs][:, :, None]
        own_y = gy[pid, zs][:, :, None]
        own_z = gz[pid, zs][:, :, None]
        dxv = own_x - cand_scratch[0, zs][:, None, :]
        dyv = own_y - cand_scratch[1, zs][:, None, :]
        dzv = own_z - cand_scratch[2, zs][:, None, :]
        r2 = dxv * dxv + dyv * dyv + dzv * dzv + nbias
        valid = r2 < cutsq
        fpair = jnp.where(valid, _terms_from_key(key, r2), 0.0)
        fij_x = dxv * fpair
        fij_y = dyv * fpair
        fij_z = dzv * fpair
        fx[pid, zs] += jnp.sum(fij_x, axis=-1)
        fy[pid, zs] += jnp.sum(fij_y, axis=-1)
        fz[pid, zs] += jnp.sum(fij_z, axis=-1)
        rev_scratch[0, zs] = jnp.sum(fij_x, axis=-2)
        rev_scratch[1, zs] = jnp.sum(fij_y, axis=-2)
        rev_scratch[2, zs] = jnp.sum(fij_z, axis=-2)

    # fold reactions per (dx,dy) target column in registers
    tacc = {}
    for s, (dx, dy, dz) in enumerate(_HALF):
        for ci in range(3):
            blk = -rev_scratch[ci, :, s * cc:(s + 1) * cc]
            if dz:
                blk = pltpu.roll(blk, dz % nz, axis=0)
            a = tacc.setdefault((dx, dy), [None, None, None])
            a[ci] = blk if a[ci] is None else a[ci] + blk
    for (dx, dy), (bx, by, bz) in tacc.items():
        ncol = ncols[(dx, dy)][0]
        fx[ncol] += bx
        fy[ncol] += by
        fz[ncol] += bz


@functools.partial(jax.jit, static_argnames=("key", "ncells", "idcap"))
def column_half_force_pallas(key, ncells, idcap, gx, gy, gz, gi, prd):
    """Newton-halved whole-grid-in-VMEM column kernel (id-free v2:
    `gi`/`idcap` are accepted for interface compatibility but unused —
    validity comes from the static Newton mask + the PAD_POS sentinel)."""
    del gi, idcap
    nx, ny, nz = ncells
    nxy, _, cc = gx.shape
    dt = gx.dtype
    kern = functools.partial(_column_half_kernel, key, nx, ny, nz, cc, 0)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    interpret = jax.default_backend() != "tpu"
    out_shape = [jax.ShapeDtypeStruct((nxy, nz, cc), dt) for _ in range(3)]
    return pl.pallas_call(
        kern,
        grid=(nxy,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [full] * 3,
        out_specs=[full] * 3,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((3, nz, len(_HALF) * cc), dt),
                        pltpu.VMEM((3, nz, len(_HALF) * cc), dt)],
        interpret=interpret,
    )(prd, gx, gy, gz)


@functools.partial(jax.jit, static_argnames=("key", "ncells"))
def column_force_pallas(key, ncells, gx, gy, gz, gi, prd):
    """Whole-grid-in-VMEM column kernel. g*: [nxy, nz, cc] f32 (gi: float
    ids, -1 invalid). Returns (fx, fy, fz) in the same layout."""
    nx, ny, nz = ncells
    nxy, _, cc = gx.shape
    dt = gx.dtype
    kern = functools.partial(_column_kernel, key, nx, ny, nz, cc)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    interpret = jax.default_backend() != "tpu"
    out_shape = [jax.ShapeDtypeStruct((nxy, nz, cc), dt) for _ in range(3)]
    return pl.pallas_call(
        kern,
        grid=(nxy,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [full] * 4,
        out_specs=[full] * 3,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((4, nz, 27 * cc), dt)],
        interpret=interpret,
    )(prd, gx, gy, gz, gi)


# grids whose SoA copies fit comfortably in VMEM take the column kernel
_VMEM_ROW_LIMIT = 300_000


# reaction targets that leave the own column: (dx, dy) with z-rolls
# folded in-kernel; (0,0) reactions fold directly into the forward output
_RTARGETS = [(0, 1), (1, -1), (1, 0), (1, 1)]


def _plane_half_kernel(key, nz, cc, idcap, prd_ref,
                       *refs):
    """Newton-halved big-N kernel: grid (nx, ny), program (px, py) owns
    z-column (px, py). The caller pads the grid in BOTH x and y with
    pre-shifted periodic wrap images, so the 5 stencil column views
    ((0,0),(0,1),(1,-1),(1,0),(1,1) — the half stencil has dx in {0,+1})
    are plain BlockSpec windows: no dynamic indexing, no wrap arithmetic
    in-kernel, and VMEM use independent of the grid size (multi-million-
    atom capable). Reactions to the own column fold into the forward
    output; the 4 cross-column targets are written ONCE per program to the
    rc output, which the caller folds with periodic jnp.roll adds — the
    XLA-side analog of the reference's reverse communication (ref:
    src/comm_brick.cpp:598 reverse_comm; Newton pair halving
    src/npair_half_bin_newton.cpp:36)."""
    views = refs[:20]          # 5 stencil columns x (x, y, z, id)
    fx, fy, fz, rc = refs[20:24]
    cand_scratch = refs[24]
    cutsq = key[-1]

    cols = {t: views[4 * k:4 * (k + 1)]
            for k, t in enumerate([(0, 0), (0, 1), (1, -1), (1, 0), (1, 1)])}

    zrow = jax.lax.broadcasted_iota(jnp.int32, (nz, 1), 0)
    for s, (dx, dy, dz) in enumerate(_HALF):
        prefs = cols[(dx, dy)]
        for ci in range(4):
            col = prefs[ci][0, 0]  # [nz, cc]
            if ci == 3 and s > 0:
                col = jnp.where(col >= 0.0, col + float(idcap), -1.0)
            blk = pltpu.roll(col, (-dz) % nz, axis=0) if dz else col
            if ci == 2 and dz != 0:
                seam = (zrow == (nz - 1 if dz > 0 else 0))
                blk = blk + jnp.where(
                    seam, jnp.float32(dz) * prd_ref[2], 0.0
                ).astype(blk.dtype)
            cand_scratch[ci, :, s * cc:(s + 1) * cc] = blk

    o = cols[(0, 0)]

    # z-chunked pair math: the [nzb, cc, 14cc] displacement/product
    # intermediates stay register-sized instead of materializing three
    # [nz, cc, 14cc] arrays in VMEM for the dual (forward + reverse)
    # reductions — the pair structure is z-diagonal, so chunks are local
    NZB = 8
    fwd_c, rev_c = [[], [], []], [[], [], []]
    for z0 in range(0, nz, NZB):
        zb = min(NZB, nz - z0)
        zs = slice(z0, z0 + zb)
        own_x = o[0][0, 0, zs][:, :, None]
        own_y = o[1][0, 0, zs][:, :, None]
        own_z = o[2][0, 0, zs][:, :, None]
        own_i = o[3][0, 0, zs][:, :, None]

        dxv = own_x - cand_scratch[0, zs][:, None, :]
        dyv = own_y - cand_scratch[1, zs][:, None, :]
        dzv = own_z - cand_scratch[2, zs][:, None, :]
        r2 = dxv * dxv + dyv * dyv + dzv * dzv

        ic = cand_scratch[3, zs]
        valid = jnp.logical_and(own_i < ic[:, None, :], r2 < cutsq)
        r2s = jnp.where(valid, r2, 1.0)
        fpair = jnp.where(valid, _terms_from_key(key, r2s), 0.0)

        for ci, dv in enumerate((dxv, dyv, dzv)):
            fij = dv * fpair
            fwd_c[ci].append(jnp.sum(fij, axis=-1))
            rev_c[ci].append(jnp.sum(fij, axis=-2))
    fwd = [jnp.concatenate(c, axis=0) for c in fwd_c]
    rx, ry, rz = (jnp.concatenate(c, axis=0) for c in rev_c)
    # fold the dz variants per (dx, dy) target in registers (5 targets vs
    # 14 raw blocks); (0,0) goes straight into the forward output
    tacc = {}
    for s, (dx, dy, dz) in enumerate(_HALF):
        for ci, r in enumerate((rx, ry, rz)):
            blk = -r[:, s * cc:(s + 1) * cc]
            if dz:
                blk = pltpu.roll(blk, dz % nz, axis=0)
            a = tacc.setdefault((dx, dy), [None, None, None])
            a[ci] = blk if a[ci] is None else a[ci] + blk
    fx[0, 0] = fwd[0] + tacc[(0, 0)][0]
    fy[0, 0] = fwd[1] + tacc[(0, 0)][1]
    fz[0, 0] = fwd[2] + tacc[(0, 0)][2]
    for t, tgt in enumerate(_RTARGETS):
        for ci in range(3):
            rc[0, 0, t, ci] = tacc[tgt][ci]


def plane_half_fits(params) -> bool:
    """The v3 plane-half kernel streams per-column blocks, so its VMEM
    footprint (~2-3 MB) is independent of the grid size; it applies
    whenever the grid is big enough to have distinct x and y neighbors."""
    nx, ny, nz = params.ncells
    return nx >= 2 and ny >= 2 and nz >= 3


@functools.partial(jax.jit, static_argnames=("key", "ncells", "idcap"))
def plane_half_force_pallas(key, ncells, idcap, gx, gy, gz, gi, prd):
    """Newton-halved big-N force pass. g*: [nx, ny, nz, cc] planar grids
    (gi float ids, -1 invalid; pads at the PAD_POS sentinel). Returns
    (fx, fy, fz) in the same layout. Requires nx, ny >= 2."""
    nx, ny, nz, cc = gx.shape
    dt = gx.dtype

    # pad x and y with pre-shifted periodic images: [nx+1, ny+2, nz, cc];
    # padded column (i, j) = unpadded (i % nx, (j-1) % ny) + box shifts
    Lx, Ly = prd[0], prd[1]
    parts = []
    for a, arr in enumerate((gx, gy, gz, gi)):
        p = jnp.concatenate([arr, arr[:1] + (Lx if a == 0 else 0.0)],
                            axis=0)
        lo = p[:, -1:] - (Ly if a == 1 else 0.0)
        hi = p[:, :1] + (Ly if a == 1 else 0.0)
        parts.append(jnp.concatenate([lo, p, hi], axis=1))
    quad = tuple(parts)  # [nx+1, ny+2, nz, cc]

    kern = functools.partial(_plane_half_kernel, key, nz, cc, idcap)

    def view(di, dj):
        return pl.BlockSpec((1, 1, nz, cc),
                            lambda i, j, di=di, dj=dj: (i + di, j + dj, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    for (dxs, dys) in ((0, 1), (0, 2), (1, 0), (1, 1), (1, 2)):
        in_specs.extend([view(dxs, dys)] * 4)
    outp = pl.BlockSpec((1, 1, nz, cc), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    outr = pl.BlockSpec((1, 1, len(_RTARGETS), 3, nz, cc),
                        lambda i, j: (i, j, 0, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    interpret = jax.default_backend() != "tpu"
    out_shape = ([jax.ShapeDtypeStruct((nx, ny, nz, cc), dt)] * 3
                 + [jax.ShapeDtypeStruct((nx, ny, len(_RTARGETS), 3, nz, cc),
                                         dt)])
    operands = []
    for _ in range(5):
        operands.extend(quad)
    fx, fy, fz, rcv = pl.pallas_call(
        kern,
        grid=(nx, ny),
        in_specs=in_specs,
        out_specs=[outp] * 3 + [outr],
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((4, nz, len(_HALF) * cc), dt)],
        interpret=interpret,
    )(prd, *operands)
    # fold the cross-column reactions: rc[i, j, t] belongs to column
    # (i+dx, j+dy) with periodic wrap — forces are translation-invariant,
    # so the wrap needs no value correction
    f = [fx, fy, fz]
    for t, (dx, dy) in enumerate(_RTARGETS):
        blk = jnp.roll(rcv[:, :, t], (dx, dy), axis=(0, 1))
        for ci in range(3):
            f[ci] = f[ci] + blk[:, :, ci]
    return f[0], f[1], f[2]


def _slab_half_kernel(key, S, ny, nz, cc, nx_real, prd_ref, base_ref,
                      gx, gy, gz, fx, fy, fz, cand_scratch, rev_scratch,
                      zb: int = 2):
    """Newton-half big-N kernel, slab-streamed: one x-slab of S interior
    planes + 1 (+x) halo plane lives in VMEM ([S+1, ny, nz, cc] per
    component). Program (sx, cy) evaluates its column with the same
    z-chunked half-stencil math as _column_half_kernel; reactions fold
    in-VMEM — dx=+1 targets land on plane sx+1 (possibly the halo row,
    which the caller adds onto the next slab's first plane). The absolute
    plane index (base + sx) gates wrap-copy / padding planes: their own
    pair evaluation is skipped (they exist only to RECEIVE reactions /
    provide candidates), preventing double counting
    (ref: src/comm_brick.cpp:598 reverse_comm over ghost planes)."""
    pid = pl.program_id(0)
    nyi = jnp.int32(ny)
    sx = pid // nyi
    cy = pid - sx * nyi
    cutsq = key[-1]
    NB = len(_HALF)

    @pl.when(pid == 0)
    def _():
        z = jnp.zeros_like(fx)
        fx[...] = z
        fy[...] = z
        fz[...] = z

    live = (base_ref[0] + sx) < nx_real

    zrow = jax.lax.broadcasted_iota(jnp.int32, (nz, 1), 0)
    cols = sorted({(dx, dy) for dx, dy, _ in _HALF})
    ncols = {}
    for dx, dy in cols:
        wy = cy + jnp.int32(dy)
        ncy = jax.lax.rem(wy + nyi, nyi)
        sy = jnp.where(wy < 0, -prd_ref[1],
                       jnp.where(wy >= nyi, prd_ref[1], 0.0))
        ncols[(dx, dy)] = (sx + dx, ncy, sy)

    @pl.when(live)
    def _():
        for s, (dx, dy, dz) in enumerate(_HALF):
            px, ncy, sy = ncols[(dx, dy)]
            for ci, (ref, sh) in enumerate(((gx, None), (gy, sy),
                                            (gz, None))):
                col = ref[px, ncy]
                if sh is not None:
                    col = col + sh
                blk = pltpu.roll(col, (-dz) % nz, axis=0) if dz else col
                if ci == 2 and dz != 0:
                    seam = (zrow == (nz - 1 if dz > 0 else 0))
                    blk = blk + jnp.where(
                        seam, jnp.float32(dz) * prd_ref[2], 0.0
                    ).astype(blk.dtype)
                cand_scratch[ci, :, s * cc:(s + 1) * cc] = blk

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, cc, NB * cc), 2)
        own_sub = jax.lax.broadcasted_iota(jnp.int32, (1, cc, NB * cc), 1)
        nbias = jnp.where(
            jnp.logical_and(lane < cc, lane <= own_sub), 1.0e8, 0.0
        ).astype(gx.dtype)

        for z0 in range(0, nz, zb):
            zs = slice(z0, min(z0 + zb, nz))
            own_x = gx[sx, cy, zs][:, :, None]
            own_y = gy[sx, cy, zs][:, :, None]
            own_z = gz[sx, cy, zs][:, :, None]
            dxv = own_x - cand_scratch[0, zs][:, None, :]
            dyv = own_y - cand_scratch[1, zs][:, None, :]
            dzv = own_z - cand_scratch[2, zs][:, None, :]
            r2 = dxv * dxv + dyv * dyv + dzv * dzv + nbias
            valid = r2 < cutsq
            fpair = jnp.where(valid, _terms_from_key(key, r2), 0.0)
            fij_x = dxv * fpair
            fij_y = dyv * fpair
            fij_z = dzv * fpair
            fx[sx, cy, zs] += jnp.sum(fij_x, axis=-1)
            fy[sx, cy, zs] += jnp.sum(fij_y, axis=-1)
            fz[sx, cy, zs] += jnp.sum(fij_z, axis=-1)
            rev_scratch[0, zs] = jnp.sum(fij_x, axis=-2)
            rev_scratch[1, zs] = jnp.sum(fij_y, axis=-2)
            rev_scratch[2, zs] = jnp.sum(fij_z, axis=-2)

        # fold reactions per (dx, dy) target in registers, then 5 VMEM
        # adds (the dx=+1 targets may land on the halo row sx+1 == S)
        tacc = {}
        for s, (dx, dy, dz) in enumerate(_HALF):
            for ci in range(3):
                blk = -rev_scratch[ci, :, s * cc:(s + 1) * cc]
                if dz:
                    blk = pltpu.roll(blk, dz % nz, axis=0)
                a = tacc.setdefault((dx, dy), [None, None, None])
                a[ci] = blk if a[ci] is None else a[ci] + blk
        for (dx, dy), (bx, by, bz) in tacc.items():
            px, ncy, _ = ncols[(dx, dy)]
            fx[px, ncy] += bx
            fy[px, ncy] += by
            fz[px, ncy] += bz


def _slab_half_call(key, S, nx_real, gx, gy, gz, base, prd):
    """gx..gz: [S+1, ny, nz, cc] slab (halo plane last, pre-shifted).
    base: [1] int32 absolute plane index of the slab's first plane.
    Returns (fx, fy, fz) [S+1, ny, nz, cc] (halo row = reactions to
    fold onto the next plane)."""
    _, ny, nz, cc = gx.shape
    dt = gx.dtype
    kern = functools.partial(_slab_half_kernel, key, S, ny, nz, cc,
                             nx_real)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    interpret = jax.default_backend() != "tpu"
    out_shape = [jax.ShapeDtypeStruct((S + 1, ny, nz, cc), dt)
                 for _ in range(3)]
    return pl.pallas_call(
        kern,
        grid=(S * ny,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)] + [full] * 3,
        out_specs=[full] * 3,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((3, nz, len(_HALF) * cc), dt),
                        pltpu.VMEM((3, nz, len(_HALF) * cc), dt)],
        interpret=interpret,
    )(prd, base, gx, gy, gz)


@functools.partial(jax.jit, static_argnames=("key", "ncells"))
def slab_half_force_pallas(key, ncells, gx, gy, gz, gi, prd):
    """Newton-halved big-N force pass with slab streaming and in-kernel
    reaction folds (successor of plane_half_force_pallas, whose separate
    reaction output cost 12 grid-sized HBM arrays + roll-folds per step).
    g*: [nx, ny, nz, cc] planar grids. `gi` accepted for interface
    compatibility (validity = distinct pad sentinels + Newton bias)."""
    del gi
    nx, ny, nz, cc = gx.shape
    dt = gx.dtype

    # slab size: largest S with the slab resident in VMEM (6 slab arrays
    # of (S+1) planes + ~2.6 MB scratch; bigger slabs amortize the halo
    # re-read and the per-chunk launch); nx need not be divisible — the
    # ext grid is padded with sentinel planes and the kernel skips
    # own-evaluation of planes >= nx
    plane_rows = ny * nz * cc
    Smax = max(1, 400_000 // plane_rows - 1)
    S = min(nx, Smax)
    nchunk = -(-nx // S)
    npad = nchunk * S - nx

    Lx = prd[0]
    from .sortedforce import PAD_POS, PAD_STEP

    def ext_of(arr, is_x):
        wrap = arr[:1] + (Lx if is_x else 0.0)
        if npad:
            # sentinel range [2*PAD_POS, ...) stays disjoint from the
            # state rows' own [PAD_POS, PAD_POS + cap*PAD_STEP) sentinels
            pads = (jnp.asarray(2 * PAD_POS, dt)
                    + jnp.arange(npad * plane_rows, dtype=dt)
                    * jnp.asarray(PAD_STEP, dt)).reshape(npad, ny, nz, cc)
            return jnp.concatenate([arr, wrap, pads], axis=0)
        return jnp.concatenate([arr, wrap], axis=0)

    # ext planes: [0..nx) real, nx = wrap copy of plane 0 (+Lx), then pads
    gxp = ext_of(gx, True)
    gyp = ext_of(gy, False)
    gzp = ext_of(gz, False)

    def one_chunk(k):
        sl = [jax.lax.dynamic_slice_in_dim(p, k * S, S + 1, axis=0)
              for p in (gxp, gyp, gzp)]
        base = (k * S)[None].astype(jnp.int32)
        return _slab_half_call(key, S, nx, *sl, base, prd)

    fx, fy, fz = jax.lax.map(one_chunk, jnp.arange(nchunk))
    # [nchunk, S+1, ...]: interior rows tile the ext planes; halo row k
    # carries reactions for ext plane (k+1)*S
    outs = []
    for f in (fx, fy, fz):
        interior = f[:, :S].reshape(nchunk * S, ny, nz, cc)
        halo_tgt = (jnp.arange(nchunk) + 1) * S
        interior = interior.at[halo_tgt % (nchunk * S)].add(
            jnp.where((halo_tgt < nchunk * S)[:, None, None, None],
                      f[:, S], 0.0))
        # wrap-copy plane nx accumulated reactions belong to plane 0;
        # halo rows targeting plane nx do too
        wrap_halo = jnp.sum(
            jnp.where((halo_tgt == nx)[:, None, None, None], f[:, S], 0.0),
            axis=0)
        out = interior[:nx]
        extra = jnp.where(nx < nchunk * S,
                          interior[jnp.minimum(nx, nchunk * S - 1)], 0.0)
        out = out.at[0].add(extra + wrap_halo)
        outs.append(out)
    return outs[0], outs[1], outs[2]


def _slab_kernel(key, S, ny, nz, cc, prd_ref,
                 gx, gy, gz, gi, fx, fy, fz, cand_scratch):
    """Big-N variant: one x-slab of the grid ([S+2, ny, nz, cc] with halo
    planes) lives in VMEM; program (sx, cy) evaluates its column with the
    full 27-stencil. x wrap shifts were pre-applied to the halo planes by
    the caller (XLA side), y/z wraps are handled in-kernel. Output planes
    cover only the S interior planes."""
    pid = pl.program_id(0)
    nyi = jnp.int32(ny)
    sx = pid // nyi  # 0..S-1 -> interior plane sx+1
    cy = pid - sx * nyi
    cutsq = key[-1]

    zrow = jax.lax.broadcasted_iota(jnp.int32, (nz, 1), 0)
    k = 0
    for dxp in (-1, 0, 1):
        px = sx + jnp.int32(dxp + 1)  # halo offset: interior planes at +1
        for dy in (-1, 0, 1):
            wy = cy + jnp.int32(dy)
            ncy = jax.lax.rem(wy + nyi, nyi)
            sy = jnp.where(wy < 0, -prd_ref[1],
                           jnp.where(wy >= nyi, prd_ref[1], 0.0))
            for a, ref in enumerate((gx, gy, gz, gi)):
                col = ref[px, ncy]  # [nz, cc]
                if a == 1:
                    col = col + sy
                for dz in (-1, 0, 1):
                    blk = pltpu.roll(col, (-dz) % nz, axis=0) if dz else col
                    if a == 2 and dz != 0:
                        seam = (zrow == (nz - 1 if dz > 0 else 0))
                        blk = blk + jnp.where(
                            seam, jnp.float32(dz) * prd_ref[2], 0.0
                        ).astype(blk.dtype)
                    cand_scratch[a, :, (k + dz + 1) * cc:(k + dz + 2) * cc] = blk
            k += 3

    # evaluate in z-chunks: the [nzb, cc, 27cc] pair block and its
    # temporaries must fit VMEM alongside the slab planes
    NZB = 8
    for z0 in range(0, nz, NZB):
        zb = min(NZB, nz - z0)
        own_x = gx[sx + 1, cy, z0:z0 + zb][:, :, None]
        own_y = gy[sx + 1, cy, z0:z0 + zb][:, :, None]
        own_z = gz[sx + 1, cy, z0:z0 + zb][:, :, None]
        own_i = gi[sx + 1, cy, z0:z0 + zb][:, :, None]

        cwin = [cand_scratch[a, z0:z0 + zb] for a in range(4)]
        dxv = own_x - cwin[0][:, None, :]
        dyv = own_y - cwin[1][:, None, :]
        dzv = own_z - cwin[2][:, None, :]
        r2 = dxv * dxv + dyv * dyv + dzv * dzv
        ic = cwin[3]
        # pads sit at PAD_POS: pad-real pairs fail by distance, pad-pad
        # pairs share id -1 and fail the != compare
        valid = jnp.logical_and(own_i != ic[:, None, :], r2 < cutsq)
        r2s = jnp.where(valid, r2, 1.0)
        fpair = jnp.where(valid, _terms_from_key(key, r2s), 0.0)
        fx[sx, cy, z0:z0 + zb] = jnp.sum(dxv * fpair, axis=-1)
        fy[sx, cy, z0:z0 + zb] = jnp.sum(dyv * fpair, axis=-1)
        fz[sx, cy, z0:z0 + zb] = jnp.sum(dzv * fpair, axis=-1)


def _slab_call(key, S, gx, gy, gz, gi, prd):
    """gx..gi: [S+2, ny, nz, cc] (halo planes pre-shifted). Returns
    (fx, fy, fz) [S, ny, nz, cc]."""
    _, ny, nz, cc = gx.shape
    dt = gx.dtype
    kern = functools.partial(_slab_kernel, key, S, ny, nz, cc)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    interpret = jax.default_backend() != "tpu"
    out_shape = [jax.ShapeDtypeStruct((S, ny, nz, cc), dt) for _ in range(3)]
    return pl.pallas_call(
        kern,
        grid=(S * ny,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [full] * 4,
        out_specs=[full] * 3,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((4, nz, 27 * cc), dt)],
        interpret=interpret,
    )(prd, gx, gy, gz, gi)


@functools.partial(jax.jit, static_argnames=("key", "ncells"))
def plane_force_pallas(key, ncells, gx, gy, gz, gi, prd):
    """Big-N force pass: the grid streams through VMEM one x-slab at a
    time (lax.map over chunks; XLA stages the contiguous halo slices), the
    slab kernel does the dense evaluation. g*: [nx, ny, nz, cc]."""
    nx, ny, nz, cc = gx.shape
    dt = gx.dtype
    plane_rows = ny * nz * cc
    S = max(1, min(nx, (_VMEM_ROW_LIMIT // 2) // plane_rows))
    while nx % S:
        S -= 1
    nchunk = nx // S

    # pre-shift the wrap seams once: plane 0's left halo is plane nx-1
    # shifted by -Lx, plane nx-1's right halo is plane 0 shifted by +Lx
    def halo(arr, shift_val, is_x):
        lo = arr[-1:]
        hi = arr[:1]
        if is_x:
            lo = lo - shift_val
            hi = hi + shift_val
        return lo, hi

    Lx = prd[0]
    parts = []
    for a, arr in enumerate((gx, gy, gz, gi)):
        lo, hi = halo(arr, Lx, a == 0)
        parts.append(jnp.concatenate([lo, arr, hi], axis=0))
    gxp, gyp, gzp, gip = parts  # [nx+2, ...]

    def one_chunk(i):
        sl = [jax.lax.dynamic_slice_in_dim(p, i * S, S + 2, axis=0)
              for p in (gxp, gyp, gzp, gip)]
        return _slab_call(key, S, *sl, prd)

    fx, fy, fz = jax.lax.map(one_chunk, jnp.arange(nchunk))
    # [nchunk, S, ny, nz, cc] -> [nx, ny, nz, cc]
    reshape = lambda a: a.reshape(nx, ny, nz, cc)
    return reshape(fx), reshape(fy), reshape(fz)


def compute_force(key, state, cl, block: int = 8):
    """Force-only cell-dense pass via the Pallas kernel.

    key: hashable scalar-coeff tuple from style.kernel_key().
    cl: CellListDense (ops/cellforce). Orthogonal boxes.
    Returns f [cap, 3].
    """
    p = cl.params
    cap = state.capacity
    ntot = p.total_cells
    cc = p.cell_cap
    dt = state.dtype

    bidx = jnp.clip(cl.buckets, 0, cap - 1)
    valid_b = cl.buckets < cap
    xb = jnp.where(valid_b[..., None], state.x[bidx],
                   jnp.asarray(BIG, dt))  # [ntot+1, cc, 3]
    ids = jnp.where(valid_b, cl.buckets, -1)

    own_x = xb[:ntot]
    own_id = ids[:ntot]

    nx, ny, nz = p.ncells

    # whole-grid-in-VMEM column kernel: no candidate tensor at all
    if all(state.box.periodic) and ntot * cc <= _VMEM_ROW_LIMIT:
        ids_f = ids[:ntot].astype(dt)
        g = own_x.reshape(nx * ny, nz, cc, 3)
        prd = state.box.prd.astype(dt)
        fx, fy, fz = column_half_force_pallas(
            key, p.ncells, cap,
            g[..., 0], g[..., 1], g[..., 2],
            ids_f.reshape(nx * ny, nz, cc), prd,
        )
        f_own = jnp.stack(
            [fx.reshape(ntot, cc), fy.reshape(ntot, cc),
             fz.reshape(ntot, cc)], axis=-1)
        scatter_idx = cl.buckets[:ntot].reshape(-1)
        f = jnp.zeros_like(state.x)
        f = f.at[scatter_idx].set(f_own.reshape(-1, 3), mode="drop")
        return f

    # candidate assembly: cell ids are grid-major ((cx*ny+cy)*nz+cz), so the
    # 27 stencil blocks are whole-grid ROLLS — contiguous copies instead of
    # the (slow on TPU) 27-block random gather. Non-periodic faces fall
    # back to the gather path (dead-cell handling lives in the stencil).
    if all(state.box.periodic):
        xg = own_x.reshape(nx, ny, nz, cc, 3)
        ig = own_id.reshape(nx, ny, nz, cc)
        cxs, cis = [], []
        for ox in (-1, 0, 1):
            for oy in (-1, 0, 1):
                for oz in (-1, 0, 1):
                    sh = (-ox, -oy, -oz)
                    cxs.append(jnp.roll(xg, sh, axis=(0, 1, 2)))
                    cis.append(jnp.roll(ig, sh, axis=(0, 1, 2)))
        cand_x = jnp.concatenate(cxs, axis=3).reshape(ntot, 27 * cc, 3)
        cand_id = jnp.concatenate(cis, axis=3).reshape(ntot, 27 * cc)
    else:
        cand_x = xb[cl.stencil].reshape(ntot, 27 * cc, 3)
        cand_id = ids[cl.stencil].reshape(ntot, 27 * cc)

    npad = -(-ntot // block) * block
    if npad != ntot:
        pad = npad - ntot
        own_x = jnp.pad(own_x, ((0, pad), (0, 0), (0, 0)),
                        constant_values=BIG)
        own_id = jnp.pad(own_id, ((0, pad), (0, 0)), constant_values=-1)
        cand_x = jnp.pad(cand_x, ((0, pad), (0, 0), (0, 0)),
                         constant_values=BIG)
        cand_id = jnp.pad(cand_id, ((0, pad), (0, 0)), constant_values=-1)

    prd = state.box.prd.astype(dt)
    f_own = cell_force_pallas(key, own_x, own_id, cand_x, cand_id, prd,
                              block=block)

    scatter_idx = cl.buckets[:ntot].reshape(-1)  # cap where padded -> drop
    f = jnp.zeros_like(state.x)
    f = f.at[scatter_idx].set(f_own[:ntot].reshape(-1, 3), mode="drop")
    return f
