"""Cell-major (sorted) state mode: zero per-step gathers or scatters.

The cell-dense paths still pay one bucket gather (state -> cell layout)
and one scatter (forces -> atom layout) every step. This mode stores the
SIMULATION STATE ITSELF in cell-major order — the TPU analog of the
reference's spatial atom sort (ref: src/atom.cpp:2246 Atom::sort, done
every sortfreq steps for locality; here it IS the layout):

  - state capacity = ncells * cell_cap; every cell owns a fixed row slab,
    padded rows have mask 0;
  - at every neighbor rebuild the whole per-atom pytree is permuted into
    the new cell assignment (one gather per ~20 steps, inside the step);
  - the force pass consumes state.x directly in grid layout via the
    Newton-halved Pallas column kernel (ops/pallas_pair) and writes forces
    in the same layout — the hot loop has no indexed memory ops at all.

Used automatically for bare scalarizable pair styles on periodic
orthogonal boxes (the bench decks); everything else takes the grid/cell/
matrix paths.
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

# padding rows carry DISTINCT position sentinels (PAD_POS + row*PAD_STEP
# on the space diagonal): pad-real pairs fail the cutoff by distance, and
# pad-pad pairs do too (rows differ by >= PAD_STEP in every component), so
# the hot kernels need no per-candidate validity lanes at all — not even
# the r2 > 0 self/pad-pair guard (f32 note: ulp(1e8) = 8, so steps of 16
# stay exactly representable across multi-million-row capacities)
PAD_POS = 1.0e8
PAD_STEP = 16.0


def _pad_x(cap: int, dtype) -> Array:
    """[cap] distinct diagonal pad sentinel per row."""
    return (jnp.asarray(PAD_POS, dtype)
            + jnp.arange(cap, dtype=dtype) * jnp.asarray(PAD_STEP, dtype))


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["xhold", "ago", "nbuilds", "ndanger", "overflow"],
    meta_fields=["params"],
)
@dataclasses.dataclass(frozen=True)
class SortedCells:
    """Rebuild bookkeeping; the cell buckets are the state layout itself."""

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


def expand_state(state: State, p: nbr.NeighborParams) -> State:
    """Host-side: compact the valid rows and re-pad to capacity
    ncells*cell_cap (sorted mode owns its capacity; rows beyond the atoms
    are mask-0 padding). Accepts any incoming layout, including an
    already-sorted one with a different capacity (restart resume)."""
    cap2 = p.total_cells * p.cell_cap
    cap = state.capacity
    valid = np.asarray(jax.device_get(state.valid_mask))
    rows = np.flatnonzero(valid)
    if len(rows) > cap2:
        raise ValueError(
            f"sorted capacity {cap2} cannot hold {len(rows)} atoms")

    def repack(a, fill=0):
        if a is None or a.ndim == 0:
            return a
        if a.shape[0] != cap:
            return a  # not per-atom
        host = np.asarray(jax.device_get(a))
        out = np.full((cap2,) + host.shape[1:], fill, dtype=host.dtype)
        out[:len(rows)] = host[rows]
        return jnp.asarray(out)

    xr = np.array(jax.device_get(repack(state.x, fill=PAD_POS)))
    pr = np.arange(len(rows), cap2)
    xr[len(rows):] = (PAD_POS + pr[:, None] * PAD_STEP)
    return state.replace(
        x=jnp.asarray(xr), v=repack(state.v),
        f=repack(state.f),
        type=repack(state.type), tag=repack(state.tag),
        image=repack(state.image),
        q=repack(state.q), molecule=repack(state.molecule),
        mask=repack(state.mask),
        owned_all=True,  # rows scatter across cells; every valid row owned
    )


def _local_perm(state: State, p: nbr.NeighborParams):
    """Sort-free re-binning for an ALREADY cell-major state.

    A TPU argsort over the whole capacity costs milliseconds; but between
    rebuilds atoms move at most ~skin, i.e. at most one cell. Each row's
    OLD cell is implied by its position in the layout (row // cell_cap),
    so the new slot assignment reduces to 27 "streams" (one per cell-offset)
    with tiny per-cell cumsums — no sort anywhere. If any atom moved more
    than one cell (or a cell overflows), the sticky overflow flag makes the
    host redo the build via the full-sort path (the usual grow-retry idiom,
    ref: src/KOKKOS/npair_kokkos.cpp:225-330).

    Returns (newpos [cap] int32 forward destinations, >= cap for padding
    rows, overflow) — consumed by the forward-scatter _apply_perm, so the
    permutation never needs inverting.
    """
    cap = state.capacity
    cc = p.cell_cap
    ntot = p.total_cells
    nx, ny, nz = p.ncells
    dims = jnp.asarray([nx, ny, nz], dtype=jnp.int32)

    # new cell coords from positions (same mapping as nbr._bin_atoms)
    lamda = state.box.to_lamda(state.x)
    frac = lamda - jnp.floor(lamda)
    frac = jnp.clip(frac, 0.0, 1.0 - 1e-7)
    c_new = jnp.floor(frac * dims.astype(frac.dtype)).astype(jnp.int32)
    c_new = jnp.clip(c_new, 0, dims - 1)  # [cap, 3]

    # old cell coords are static per row
    row = jnp.arange(cap, dtype=jnp.int32)
    oldcell = row // cc
    ox = oldcell // (ny * nz)
    rem = oldcell - ox * (ny * nz)
    c_old = jnp.stack([ox, rem // nz, rem - (rem // nz) * nz], axis=1)

    d = c_new - c_old
    half = dims // 2
    d = jnp.where(d > half, d - dims, jnp.where(d < -half, d + dims, d))
    valid = state.valid_mask
    moved_far = jnp.any(jnp.where(valid[:, None], jnp.abs(d) > 1, False))

    o = (d[:, 0] + 1) * 9 + (d[:, 1] + 1) * 3 + (d[:, 2] + 1)  # 0..26
    o = jnp.clip(o, 0, 26)

    # rank of each slot among same-(cell, stream) slots: a pairwise
    # lower-triangular compare on the cc lane axis (no cumsum, no gather);
    # per-(cell, stream) counts: one-hot sum over the cc sublane axis.
    o_rs = o.reshape(ntot, cc)
    v_rs = valid.reshape(ntot, cc)
    ltri = (jnp.arange(cc, dtype=jnp.int32)[:, None]
            > jnp.arange(cc, dtype=jnp.int32)[None, :])
    oeq = ((o_rs[:, :, None] == o_rs[:, None, :])
           & ltri[None, :, :] & v_rs[:, None, :]).astype(jnp.int8)
    rank = jnp.sum(oeq, axis=-1, dtype=jnp.int32).reshape(cap)
    oh = ((o_rs[:, :, None] == jnp.arange(27, dtype=jnp.int32)[None, None, :])
          & v_rs[:, :, None]).astype(jnp.int8)  # [ntot, cc, 27]
    counts = jnp.sum(oh, axis=1, dtype=jnp.int32)  # [ntot, 27]

    # arrivals at dest cell from stream o originate at dest - offset_o
    counts3 = counts.reshape(nx, ny, nz, 27)
    # offs[k] = (dx, dy, dz) for k = (dx+1)*9 + (dy+1)*3 + (dz+1)
    offs = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)]
    arr = jnp.stack(
        [jnp.roll(counts3[..., k], offs[k], axis=(0, 1, 2))
         for k in range(27)], axis=-1)  # [nx, ny, nz, 27]
    total = jnp.sum(arr, axis=-1)
    cell_overflow = jnp.max(total) > cc
    base = (jnp.cumsum(arr, axis=-1) - arr).reshape(ntot, 27)

    dcell = (c_new[:, 0] * ny + c_new[:, 1]) * nz + c_new[:, 2]
    slot = base.reshape(-1)[dcell * 27 + o] + rank
    newpos = dcell * cc + jnp.minimum(slot, cc - 1)
    return jnp.where(valid, newpos, cap), moved_far | cell_overflow


def _apply_gather_perm(state: State, perm, overflow):
    """Permute by a dst->src gather permutation (`perm` [cap] source rows,
    >= cap entries -> padding). Used by layouts that compute the inverse
    permutation directly (cell-major argsort); the local re-binning path uses
    the forward-scatter `_apply_perm` instead."""
    cap = state.capacity
    valid = perm < cap
    safe = jnp.minimum(perm, cap - 1)

    def g(a, fill=0):
        if a is None:
            return None
        out = a[safe]
        return jnp.where(valid.reshape([-1] + [1] * (a.ndim - 1)), out, fill)

    x = g(state.x)
    x = jnp.where(valid[:, None], x, _pad_x(cap, x.dtype)[:, None])
    return state.replace(
        x=x, v=g(state.v), f=g(state.f),
        type=g(state.type), tag=g(state.tag), image=g(state.image),
        q=g(state.q), molecule=g(state.molecule), mask=g(state.mask),
    ), overflow


def _apply_perm(state: State, newpos, overflow):
    """Move every row to its destination slot (`newpos` [cap], entries
    >= cap are dropped). TPU scatters are far slower than gathers per row
    (measured ~5x on wide rows), so the move inverts the permutation with
    ONE narrow int scatter and then applies it as row gathers over the
    per-atom pytree packed into ONE float and ONE int matrix.
    `f` is NOT moved — every rebuild is followed by a force evaluation in
    both the fused and generic steps (Verlet order: rebuild, force, kick),
    so permuting stale forces is pure waste."""
    cap = state.capacity
    row = jnp.arange(cap, dtype=jnp.int32)
    perm = jnp.full((cap,), cap, dtype=jnp.int32)
    perm = perm.at[newpos].set(row, mode="drop", unique_indices=True)
    valid = perm < cap
    safe = jnp.minimum(perm, cap - 1)

    def pack(arrs):
        cols = []
        for a in arrs:
            if a is not None:
                cols.append(a[:, None] if a.ndim == 1 else a)
        return jnp.concatenate(cols, axis=1) if cols else None

    def unpack(mat, arrs):
        out, i = [], 0
        for a in arrs:
            if a is None:
                out.append(None)
                continue
            w = 1 if a.ndim == 1 else a.shape[1]
            piece = mat[:, i:i + w]
            out.append(piece[:, 0] if a.ndim == 1 else piece)
            i += w
        return out

    farrs = [state.x, state.v, state.q]
    iarrs = [state.type, state.tag, state.image, state.molecule, state.mask]
    fp = pack(farrs)
    ip = pack(iarrs)
    # NOTE: do NOT bitcast the int matrix to f32 to merge the two gathers —
    # small ints (mask=1, type=1) are f32 denormals and the TPU flushes
    # denormals to zero in the select, silently invalidating every atom.
    fm = jnp.where(valid[:, None], fp[safe], 0.0)
    im = jnp.where(valid[:, None], ip[safe], 0)
    x, v, q = unpack(fm, farrs)
    x = jnp.where(valid[:, None], x, _pad_x(cap, x.dtype)[:, None])
    typ, tag, image, molecule, mask = unpack(im, iarrs)
    state = state.replace(
        x=x, v=v, q=q, type=typ, tag=tag, image=image,
        molecule=molecule, mask=mask,
    )
    return state, overflow


def _permute(state: State, p: nbr.NeighborParams):
    """Permute all per-atom arrays into cell-major order (jit-compatible).

    Returns (state_sorted, cell_overflow)."""
    cap = state.capacity  # == ntot * cc
    _, buckets, overflow = nbr._bin_atoms(state, p)
    perm = buckets[:p.total_cells].reshape(-1)  # [cap]; >= cap -> padding
    valid = perm < cap
    safe = jnp.minimum(perm, cap - 1)

    def g(a, fill=0):
        if a is None:
            return None
        out = a[safe]
        return jnp.where(valid.reshape([-1] + [1] * (a.ndim - 1)), out, fill)

    x = g(state.x)
    x = jnp.where(valid[:, None], x, _pad_x(cap, x.dtype)[:, None])
    state = state.replace(
        x=x, v=g(state.v), f=g(state.f),
        type=g(state.type), tag=g(state.tag), image=g(state.image),
        q=g(state.q), molecule=g(state.molecule), mask=g(state.mask),
    )
    return state, overflow


def build(state: State, p: nbr.NeighborParams):
    """Sort the (already expanded) state; returns (state, SortedCells)."""
    state, overflow = _permute(state, p)
    return state, SortedCells(
        xhold=state.x,
        ago=jnp.asarray(0, jnp.int32),
        nbuilds=jnp.asarray(1, jnp.int32),
        ndanger=jnp.asarray(0, jnp.int32),
        overflow=overflow,
        params=p,
    )


def rebuild_state(state: State, old: SortedCells, special=None):
    """In-step rebuild: the sort-free local re-binning (atoms move <= one
    cell between rebuilds; violations raise the sticky overflow flag and
    the host replays the segment through the full-sort `build`)."""
    perm, overflow = _local_perm(state, old.params)
    state, overflow = _apply_perm(state, perm, overflow)
    return state, SortedCells(
        xhold=state.x,
        ago=jnp.asarray(0, jnp.int32),
        nbuilds=old.nbuilds + 1,
        ndanger=old.ndanger,
        overflow=old.overflow | overflow,
        params=old.params,
    )


def tick(cl: SortedCells) -> SortedCells:
    return dataclasses.replace(cl, ago=cl.ago + 1)


def needs_rebuild(state: State, cl: SortedCells) -> Array:
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


def compute(style, state: State, cl: SortedCells, eflag: bool, vflag: bool):
    """(f, pe, virial) in the sorted layout."""
    p = cl.params
    cap = state.capacity
    ntot = p.total_cells
    cc = p.cell_cap
    nx, ny, nz = p.ncells
    dt = state.dtype

    if not eflag and not vflag:
        kk = getattr(style, "kernel_key", None)
        key = kk() if kk is not None else None
        if key is not None:
            from . import pallas_pair

            ids = jnp.where(state.valid_mask,
                            jnp.arange(cap, dtype=jnp.int32), -1).astype(dt)
            prd = state.box.prd.astype(dt)
            if cap <= pallas_pair._VMEM_ROW_LIMIT:
                g = state.x.reshape(nx * ny, nz, cc, 3)
                fx, fy, fz = pallas_pair.column_half_force_pallas(
                    key, p.ncells, cap,
                    g[..., 0], g[..., 1], g[..., 2],
                    ids.reshape(nx * ny, nz, cc), prd,
                )
            elif nx >= 2 and pallas_pair.plane_half_fits(p):
                g = state.x.reshape(nx, ny, nz, cc, 3)
                fx, fy, fz = pallas_pair.slab_half_force_pallas(
                    key, p.ncells,
                    g[..., 0], g[..., 1], g[..., 2],
                    ids.reshape(nx, ny, nz, cc), prd,
                )
            else:
                g = state.x.reshape(nx, ny, nz, cc, 3)
                fx, fy, fz = pallas_pair.plane_force_pallas(
                    key, p.ncells,
                    g[..., 0], g[..., 1], g[..., 2],
                    ids.reshape(nx, ny, nz, cc), prd,
                )
            f = jnp.stack([fx.reshape(-1), fy.reshape(-1),
                           fz.reshape(-1)], axis=-1).reshape(cap, 3)
            return f, None, None

    # energy/virial evaluations: reuse the grid-roll XLA path with the
    # identity buckets the sorted layout implies
    from . import gridforce

    arange = jnp.arange(cap, dtype=jnp.int32).reshape(ntot, cc)
    buckets = jnp.where(state.mask.reshape(ntot, cc) != 0, arange, cap)
    buckets = jnp.concatenate(
        [buckets, jnp.full((1, cc), cap, dtype=jnp.int32)], axis=0
    )
    gc = gridforce.GridCells(
        buckets=buckets, xhold=cl.xhold, ago=cl.ago, nbuilds=cl.nbuilds,
        ndanger=cl.ndanger, overflow=cl.overflow, params=p,
    )
    return gridforce.compute(style, state, gc, eflag, vflag)
