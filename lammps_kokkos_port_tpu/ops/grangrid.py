"""Dense cell-grid granular contact engine (gran/hooke[/history]).

The granular TPU fast path: instead of the [N, K] matrix engine's
per-step gathers (random-access gathers are the slowest primitive on
TPU), atoms are evaluated in dense cell buckets with the 27-stencil
expressed as whole-grid rolls — contiguous copies XLA fuses well (the
same layout the LJ grid path uses, ops/gridforce). Granular cutoffs are
contact distances (~1 diameter), so cells are tiny and cc (atoms/cell) is
small: the dense [cell, cc_i, cc_j] blocks stay register-friendly.

Per-contact shear history lives in DIRECTED slot space
[ntot, cc, 27, cc, 3]: entry (c, a, s, b) belongs to the directed edge
(atom a of cell c) -> (atom b of the s-th stencil neighbor of c). Bucket
assignments are frozen between rebuilds, so the addressing is stable
exactly when the reference's neighbor-list slots are (FixNeighHistory
semantics, ref: src/fix_neigh_history.cpp). Directed copies evolve
antisymmetrically-consistent, as in models/pair_gran (same math per
directed edge, ref: src/GRANULAR/pair_gran_hooke_history.cpp).

At a rebuild the history is carried over by DERIVING each new slot's old
address elementwise (row -> old (cell, slot) via the inverse bucket map,
stencil offset from the old cell coordinates) and doing ONE gather — no
K x K matching (cf. models/pair_gran.remap_shear).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from . import gridforce, neighbor as nbr

Array = jax.Array

# full directed stencil: all 27 offsets (self block masks a == b)
OFFSETS = [(i, j, k)
           for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)]


def compute_gran_grid(style, state, cl: gridforce.GridCells, shear: Array,
                      shearupdate: bool):
    """(f [cap,3], torque [cap,3], new_shear) on the dense grid.

    shear: [ntot, cc, 27, cc, 3] directed slot-space history."""
    p = cl.params
    cap = state.capacity
    nx, ny, nz = p.ncells
    ntot = p.total_cells
    cc = p.cell_cap
    dt_ = state.dtype
    periodic = state.box.periodic

    bidx = jnp.clip(cl.buckets[:ntot], 0, cap - 1)
    vgl = (cl.buckets[:ntot] < cap)
    g5 = lambda a: a[bidx].reshape(nx, ny, nz, cc, 3)
    g4 = lambda a: a[bidx].reshape(nx, ny, nz, cc)
    xg = g5(state.x)
    vg = g5(state.v)
    og3 = g5(state.aux["omega"])
    radg = g4(state.aux["radius"])
    mg = g4(state.per_atom_mass)
    maskg = g4(state.mask)
    valg = vgl.reshape(nx, ny, nz, cc)

    kn, kt = style.kn, style.kt
    gamman, gammat = style.gamman, style.gammat
    xmu, dtv = style.xmu, style.dt
    fz_bit = jnp.int32(style.freeze_groupbit)

    sh5 = shear.reshape(nx, ny, nz, cc, 27, cc, 3)

    f_acc = jnp.zeros((nx, ny, nz, cc, 3), dt_)
    tq_acc = jnp.zeros((nx, ny, nz, cc, 3), dt_)
    new_sh = []

    lane = jnp.arange(cc, dtype=jnp.int32)
    notself = lane[:, None] != lane[None, :]

    for s, off in enumerate(OFFSETS):
        roll = (lambda a: a) if off == (0, 0, 0) else (
            lambda a: gridforce._roll3(a, off, -1))
        xj = roll(xg)
        vj = roll(vg)
        oj = roll(og3)
        radj_g = roll(radg)
        mj_g = roll(mg)
        mskj = roll(maskg)
        vj_ok = roll(valg)

        dx = state.box.min_image(xg[..., :, None, :] - xj[..., None, :, :])
        r2 = jnp.sum(dx * dx, axis=-1)  # [nx,ny,nz,cc,cc]
        radi = radg[..., :, None]
        radj = radj_g[..., None, :]
        radsum = radi + radj
        touching = (valg[..., :, None] & vj_ok[..., None, :]
                    & (r2 < radsum * radsum) & (r2 > 0.0))
        if off == (0, 0, 0):
            touching = touching & notself
        em = gridforce._edge_mask(p, periodic, off)
        if em is not None:
            touching = touching & jnp.asarray(em)[..., None]

        r2s = jnp.where(touching, r2, 1.0)
        rinv = 1.0 / jnp.sqrt(r2s)
        r = r2s * rinv
        rsqinv = 1.0 / r2s

        vr = vg[..., :, None, :] - vj[..., None, :, :]
        vnnr = jnp.sum(vr * dx, axis=-1)
        vn = dx * (vnnr * rsqinv)[..., None]
        vt = vr - vn
        w = (radi[..., None] * og3[..., :, None, :]
             + radj[..., None] * oj[..., None, :, :]) * rinv[..., None]
        vtr = vt + jnp.cross(dx, w)

        mi = mg[..., :, None]
        mj = mj_g[..., None, :]
        meff = mi * mj / (mi + mj)
        if style.freeze_groupbit:
            fzi = (maskg[..., :, None] & fz_bit) != 0
            fzj = (mskj[..., None, :] & fz_bit) != 0
            meff = jnp.where(fzi, mj, meff)
            meff = jnp.where(fzj, mi, meff)

        damp = meff * gamman * vnnr * rsqinv
        ccel = kn * (radsum - r) * rinv - damp

        sh = sh5[..., s, :, :]
        if style.history:
            if shearupdate:
                sh = sh + vtr * dtv
            shrmag = jnp.sqrt(jnp.sum(sh * sh, axis=-1))
            if shearupdate:
                rsht = jnp.sum(sh * dx, axis=-1) * rsqinv
                sh = sh - rsht[..., None] * dx
            fs_v = -(kt * sh + (meff * gammat)[..., None] * vtr)
            fs = jnp.sqrt(jnp.sum(fs_v * fs_v, axis=-1))
            fn = xmu * jnp.abs(ccel * r)
            over = fs > fn
            ratio = fn / jnp.where(fs > 0.0, fs, 1.0)
            gv = (meff * gammat)[..., None] * vtr / kt
            sh_rescaled = jnp.where(
                (over & (shrmag > 0.0))[..., None],
                ratio[..., None] * (sh + gv) - gv, sh)
            fs_v = jnp.where(over[..., None],
                             jnp.where((shrmag > 0.0)[..., None],
                                       fs_v * ratio[..., None], 0.0),
                             fs_v)
            sh = sh_rescaled
            new_sh.append(jnp.where(touching[..., None], sh, 0.0))
        else:
            vrel = jnp.sqrt(jnp.sum(vtr * vtr, axis=-1))
            fn = xmu * jnp.abs(ccel * r)
            fsd = meff * gammat * vrel
            ft = jnp.where(vrel != 0.0,
                           jnp.minimum(fn, fsd)
                           / jnp.where(vrel != 0.0, vrel, 1.0), 0.0)
            fs_v = -ft[..., None] * vtr
            new_sh.append(sh5[..., s, :, :])

        fe = dx * ccel[..., None] + fs_v
        fe = jnp.where(touching[..., None], fe, 0.0)
        f_acc = f_acc + jnp.sum(fe, axis=-2)

        tor = jnp.cross(dx, fs_v) * rinv[..., None]
        tor = jnp.where(touching[..., None], tor, 0.0)
        tq_acc = tq_acc - jnp.sum(radi[..., None] * tor, axis=-2)

    new_shear = jnp.stack(new_sh, axis=-3).reshape(ntot, cc, 27, cc, 3)

    # scatter back to atom rows
    rows = cl.buckets[:ntot].reshape(-1)
    f = jnp.zeros_like(state.x)
    f = f.at[rows].set(f_acc.reshape(-1, 3), mode="drop")
    tq = jnp.zeros_like(state.x)
    tq = tq.at[rows].set(tq_acc.reshape(-1, 3), mode="drop")
    return f, tq, new_shear


def remap_shear_grid(shear_old: Array, buckets_old: Array,
                     buckets_new: Array, p: nbr.NeighborParams,
                     cap: int) -> Array:
    """Carry slot-space shear across a rebuild: derive each new directed
    slot's OLD address elementwise (inverse bucket maps + old stencil
    offset from old cell coords) and gather once."""
    nx, ny, nz = p.ncells
    ntot = p.total_cells
    cc = p.cell_cap
    offs = jnp.asarray(OFFSETS, dtype=jnp.int32)  # [27, 3]
    dims = jnp.asarray([nx, ny, nz], dtype=jnp.int32)

    def inv_map(buckets):
        rows = buckets[:ntot].reshape(-1)
        inv = jnp.full((cap + 1,), ntot * cc, dtype=jnp.int32)
        pos = jnp.arange(ntot * cc, dtype=jnp.int32)
        safe = jnp.where(rows < cap, rows, cap)
        return inv.at[safe].set(pos, mode="drop")

    inv1 = inv_map(buckets_old)

    # new pair (c2, a2, s, b2): i_row, j_row
    cell2 = jnp.arange(ntot, dtype=jnp.int32)
    cx = cell2 // (ny * nz)
    rem = cell2 - cx * (ny * nz)
    cyz = jnp.stack([cx, rem // nz, rem - (rem // nz) * nz], axis=1)
    ncell2 = jnp.mod(cyz[:, None, :] + offs[None, :, :] + dims, dims)
    ncell2_id = ((ncell2[..., 0] * ny + ncell2[..., 1]) * nz
                 + ncell2[..., 2])  # [ntot, 27]

    i_row = buckets_new[:ntot][:, :, None, None]  # [ntot, cc, 1, 1]
    j_row = buckets_new[ncell2_id][:, None, :, :]  # [ntot, 1, 27, cc]
    i_row, j_row = jnp.broadcast_to(
        i_row, (ntot, cc, 27, cc)), jnp.broadcast_to(
        j_row, (ntot, cc, 27, cc))

    pos1_i = inv1[jnp.minimum(i_row, cap)]  # flat old pos or ntot*cc
    pos1_j = inv1[jnp.minimum(j_row, cap)]
    ok = (i_row < cap) & (j_row < cap) & (pos1_i < ntot * cc) \
        & (pos1_j < ntot * cc)

    c1_i = pos1_i // cc
    a1 = pos1_i - c1_i * cc
    c1_j = pos1_j // cc
    b1 = pos1_j - c1_j * cc

    def coords(c):
        x = c // (ny * nz)
        r = c - x * (ny * nz)
        return jnp.stack([x, r // nz, r - (r // nz) * nz], axis=-1)

    d = coords(c1_j) - coords(c1_i)  # [ntot, cc, 27, cc, 3]
    half = dims // 2
    d = jnp.where(d > half, d - dims, jnp.where(d < -half, d + dims, d))
    in_sten = jnp.all(jnp.abs(d) <= 1, axis=-1)
    s1 = ((d[..., 0] + 1) * 9 + (d[..., 1] + 1) * 3 + (d[..., 2] + 1))
    s1 = jnp.clip(s1, 0, 26)
    ok = ok & in_sten

    flat_old = ((c1_i * cc + a1) * 27 + s1) * cc + b1
    flat_old = jnp.where(ok, flat_old, 0)
    gathered = shear_old.reshape(-1, 3)[flat_old.reshape(-1)]
    gathered = gathered.reshape(ntot, cc, 27, cc, 3)
    return jnp.where(ok[..., None], gathered, 0.0)
