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

    return state.replace(
        x=repack(state.x), v=repack(state.v), f=repack(state.f),
        type=repack(state.type), tag=repack(state.tag),
        image=repack(state.image),
        q=repack(state.q), molecule=repack(state.molecule),
        mask=repack(state.mask),
        owned_all=True,  # rows scatter across cells; every valid row owned
    )


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

    state = state.replace(
        x=g(state.x), v=g(state.v), f=g(state.f),
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
    state, nl = build(state, old.params)
    return state, dataclasses.replace(
        nl,
        nbuilds=old.nbuilds + 1,
        ndanger=old.ndanger,
        overflow=old.overflow | nl.overflow,
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
