"""Grid-roll force path: cell-major layout + whole-grid rolls, zero gathers.

The cell-dense path (ops/cellforce.py) still pays one 27-block random
gather per cell per step (`xb[ncells27]`). This module removes ALL
per-pair and per-cell gathers from the hot loop, the TPU-native answer to
the Kokkos team-over-bins pair functor (ref: src/KOKKOS/pair_kokkos.h
team variants, src/KOKKOS/nbin_kokkos.cpp dense bins):

  - positions are gathered ONCE per step into the cell-major grid
    `xg [nx, ny, nz, cc, 3]` (the dense buckets reshaped);
  - each of the 27 stencil interactions is a ROLL of the whole grid:
    `roll(xg, -off)` aligns every cell with its off-neighbor — contiguous
    VPU work, no index lists, periodic wrap for free (min_image fixes the
    box-length offset at the wrap seam);
  - Newton's 3rd law, TPU-style: only the 13 lexicographically-positive
    offsets are evaluated; the reaction force on the neighbor cell is
    accumulated by rolling the summed contribution BACK (+off) — a roll,
    not a scatter (ref: half stencils + reverse comm in
    src/npair_half_bin_newton.cpp, done here without any atomics);
  - one scatter writes forces back to atom order.

This halves the pair FLOPs of the cell-dense path and converts its random
block gathers into sequential full-array traffic.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import State
from . import neighbor as nbr

Array = jax.Array

# 13 lexicographically-positive offsets (half stencil) — the self cell
# (0,0,0) is handled separately with i<j-free double-count weighting
HALF_OFFSETS = [
    (i, j, k)
    for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)
    if (i, j, k) > (0, 0, 0)
]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["buckets", "xhold", "ago", "nbuilds", "ndanger", "overflow"],
    meta_fields=["params"],
)
@dataclasses.dataclass(frozen=True)
class GridCells:
    """Dense cell buckets (grid-major) + rebuild bookkeeping."""

    buckets: Array  # [ntot+1, cc] int32 atom indices (cap = padding)
    xhold: Array
    ago: Array
    nbuilds: Array
    ndanger: Array
    overflow: Array
    params: nbr.NeighborParams

    @property
    def sb(self):
        return None

    @property
    def shift(self):
        return None


def build_cell(state: State, p: nbr.NeighborParams) -> GridCells:
    _, buckets, cell_overflow = nbr._bin_atoms(state, p)
    return GridCells(
        buckets=buckets,
        xhold=state.x,
        ago=jnp.asarray(0, jnp.int32),
        nbuilds=jnp.asarray(1, jnp.int32),
        ndanger=jnp.asarray(0, jnp.int32),
        overflow=cell_overflow,
        params=p,
    )


def rebuild_merge(state: State, old: GridCells, special=None) -> GridCells:
    new = build_cell(state, old.params)
    return dataclasses.replace(
        new,
        nbuilds=old.nbuilds + 1,
        ndanger=old.ndanger,
        overflow=old.overflow | new.overflow,
    )


def tick(cl: GridCells) -> GridCells:
    return dataclasses.replace(cl, ago=cl.ago + 1)


def needs_rebuild(state: State, cl: GridCells) -> Array:
    p = cl.params
    ago = cl.ago + 1
    cadence = (ago >= p.delay) & (jnp.mod(ago, max(p.every, 1)) == 0)
    if not p.check:
        return cadence
    half_skin_sq = (0.5 * p.skin) ** 2
    disp = state.x - cl.xhold
    d2 = jnp.sum(disp * disp, axis=-1)
    d2 = jnp.where(state.valid_mask, d2, 0.0)
    return cadence & (jnp.max(d2) > half_skin_sq)


def _roll3(a: Array, off, sign: int) -> Array:
    return jnp.roll(a, shift=(sign * off[0], sign * off[1], sign * off[2]),
                    axis=(0, 1, 2))


def _edge_mask(p: nbr.NeighborParams, periodic, off) -> np.ndarray | None:
    """[nx,ny,nz,1] False where the off-neighbor crosses a non-periodic
    face (those rolled-in cells are dead)."""
    if all(periodic) or off == (0, 0, 0):
        return None
    nx, ny, nz = p.ncells
    ok = np.ones((nx, ny, nz), dtype=bool)
    dims = (nx, ny, nz)
    for d in range(3):
        if periodic[d] or off[d] == 0:
            continue
        idx = [slice(None)] * 3
        idx[d] = slice(dims[d] - off[d], None) if off[d] > 0 else slice(
            None, -off[d])
        ok[tuple(idx)] = False
    return ok[..., None]


def compute(style, state: State, cl: GridCells, eflag: bool, vflag: bool):
    """Half-stencil grid-roll pair evaluation for pair_terms styles.

    Returns (f, pe, virial) like cellforce.compute.
    """
    p = cl.params
    cap = state.capacity
    nx, ny, nz = p.ncells
    ntot = p.total_cells
    cc = p.cell_cap
    dt = state.dtype
    single = style.ntypes == 1
    cutsq_tab = style.cutsq_table()
    periodic = state.box.periodic

    # one gather into the cell-major grid
    bidx = jnp.clip(cl.buckets[:ntot], 0, cap - 1)  # [ntot, cc]
    own_idx = cl.buckets[:ntot].reshape(nx, ny, nz, cc)
    xg = state.x[bidx].reshape(nx, ny, nz, cc, 3)
    vg = (cl.buckets[:ntot] < cap).reshape(nx, ny, nz, cc)
    og = state.owned_mask[bidx].reshape(nx, ny, nz, cc) & vg
    tg = None if single else state.type[bidx].reshape(nx, ny, nz, cc)

    half = jnp.asarray(0.5, dt)

    def pair_block(xi, xj, vi, vj, ti, tj, oi, oj, pair_mask, once):
        """Dense cc_i x cc_j evaluation. once=True: each pair appears once
        (full tally weight split by ownership); False: both orders appear
        (0.5 weight)."""
        dx = state.box.min_image(xi[..., :, None, :] - xj[..., None, :, :])
        r2 = jnp.sum(dx * dx, axis=-1)  # [..., cc, cc]
        if single:
            cutsq = cutsq_tab[1, 1]
            tii = tjj = None
        else:
            tii = ti[..., :, None]
            tjj = tj[..., None, :]
            cutsq = cutsq_tab[tii, tjj]
        valid = (vi[..., :, None] & vj[..., None, :] & (r2 < cutsq))
        if pair_mask is not None:
            valid = valid & pair_mask
        r2s = jnp.where(valid, r2, jnp.ones((), dt))
        fpair, evdwl = style.pair_terms(r2s, tii, tjj, eflag)
        fpair = jnp.where(valid, fpair, 0.0)
        fij = dx * fpair[..., None]  # force ON i FROM j
        fi = jnp.sum(fij, axis=-2)  # [..., cc_i, 3]
        fj = -jnp.sum(fij, axis=-3)  # [..., cc_j, 3]

        pe = vir = None
        w = None
        if eflag or vflag:
            wi = oi[..., :, None].astype(dt)
            wj = oj[..., None, :].astype(dt)
            w = (wi + wj) * half if once else (wi + wj) * half * half
        if eflag:
            pe = jnp.sum(jnp.where(valid, evdwl * w, 0.0))
        if vflag:
            wf = fpair * w
            vir = jnp.stack([
                jnp.sum(wf * dx[..., 0] * dx[..., 0]),
                jnp.sum(wf * dx[..., 1] * dx[..., 1]),
                jnp.sum(wf * dx[..., 2] * dx[..., 2]),
                jnp.sum(wf * dx[..., 0] * dx[..., 1]),
                jnp.sum(wf * dx[..., 0] * dx[..., 2]),
                jnp.sum(wf * dx[..., 1] * dx[..., 2]),
            ])
        return fi, fj, pe, vir

    z = jnp.zeros((), dt)
    pe_tot = z
    vir_tot = jnp.zeros(6, dt)

    # self cell: both (i,j) and (j,i) orders appear; mask the diagonal
    lane = jnp.arange(cc, dtype=jnp.int32)
    notself = (lane[:, None] != lane[None, :])
    fi, _, pe, vir = pair_block(xg, xg, vg, vg, tg, tg, og, og,
                                notself, once=False)
    f_grid = fi
    if eflag:
        pe_tot = pe_tot + pe
    if vflag:
        vir_tot = vir_tot + vir

    # 13 half-stencil offsets: evaluate once, roll the reaction back
    for off in HALF_OFFSETS:
        xj = _roll3(xg, off, -1)
        vj = _roll3(vg, off, -1)
        oj = _roll3(og, off, -1)
        tj = None if single else _roll3(tg, off, -1)
        em = _edge_mask(p, periodic, off)
        pair_mask = None
        if em is not None:
            pair_mask = jnp.asarray(em)[..., None]  # [nx,ny,nz,1,1]
        fi, fj, pe, vir = pair_block(xg, xj, vg, vj, tg, tj, og, oj,
                                     pair_mask, once=True)
        f_grid = f_grid + fi + _roll3(fj, off, +1)
        if eflag:
            pe_tot = pe_tot + pe
        if vflag:
            vir_tot = vir_tot + vir

    f = jnp.zeros_like(state.x)
    f = f.at[own_idx.reshape(-1)].set(f_grid.reshape(-1, 3), mode="drop")
    return f, (pe_tot if eflag else None), (vir_tot if vflag else None)
