"""Cell-dense force path: bucketed all-candidate evaluation, no [N,K] lists.

The [N, K] neighbor-matrix path (ops/neighbor.py) pays one random row
gather per pair per step — the dominant cost on TPU, where gathers run far
below HBM speed-of-light. This module is the TPU-native alternative,
mirroring how the reference's Kokkos GPU path teams over BINS
(ref: src/KOKKOS/npair_kokkos.cpp team/shared-memory binned variants and
the Kokkos pair functors consuming them):

  - rebuild: bin atoms into dense buckets [ncells+1, cap_c] (sort-based,
    ref: src/KOKKOS/nbin_kokkos.cpp dense 2D bins) — no candidate
    compaction at all;
  - force: for each cell, gather its OWN rows once ([N] total rows) and its
    27 stencil cells' rows as contiguous blocks, then evaluate ALL
    candidate pairs densely with masks. ~7x more pair FLOPs than a
    compacted list, but they are dense VPU work instead of random gathers
    — a large net win. One scatter writes each atom's force exactly once.

Used automatically for pair styles expressing per-pair closures
(pair_terms) when no special-bond masking or kspace is active (the
bench-deck hot path); the matrix path remains for everything else.
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
    data_fields=["buckets", "stencil", "xhold", "ago", "nbuilds", "ndanger",
                 "overflow"],
    meta_fields=["params"],
)
@dataclasses.dataclass(frozen=True)
class CellListDense:
    """Dense cell buckets + the same rebuild bookkeeping as NeighborList."""

    buckets: Array  # [ntot+1, cap_c] int32 atom indices (cap = empty)
    stencil: Array  # [ntot, 27] int32 neighbor cell ids (ntot = dead)
    xhold: Array
    ago: Array
    nbuilds: Array
    ndanger: Array
    overflow: Array
    params: nbr.NeighborParams

    # API parity with NeighborList for the step loop
    @property
    def sb(self):
        return None

    @property
    def shift(self):
        return None


def _stencil_table(p: nbr.NeighborParams, periodic) -> np.ndarray:
    nx, ny, nz = p.ncells
    ntot = p.total_cells
    offs = np.array([(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1)
                     for k in (-1, 0, 1)])
    cx, cy, cz = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                             indexing="ij")
    cells = np.stack([cx.ravel(), cy.ravel(), cz.ravel()], axis=1)
    out = np.zeros((ntot, 27), dtype=np.int32)
    dims = np.array([nx, ny, nz])
    for s, off in enumerate(offs):
        nc = cells + off
        dead = np.zeros(len(cells), dtype=bool)
        for d in range(3):
            if not periodic[d]:
                dead |= (nc[:, d] < 0) | (nc[:, d] >= dims[d])
        ncw = np.mod(nc, dims)
        cid = (ncw[:, 0] * ny + ncw[:, 1]) * nz + ncw[:, 2]
        out[:, s] = np.where(dead, ntot, cid)
    return out


def build_cell(state: State, p: nbr.NeighborParams,
               stencil: Array | None = None) -> CellListDense:
    """Bin atoms into dense buckets (jit-compatible)."""
    _, buckets, cell_overflow = nbr._bin_atoms(state, p)
    if stencil is None:
        stencil = jnp.asarray(_stencil_table(p, state.box.periodic))
    return CellListDense(
        buckets=buckets,
        stencil=stencil,
        xhold=state.x,
        ago=jnp.asarray(0, jnp.int32),
        nbuilds=jnp.asarray(1, jnp.int32),
        ndanger=jnp.asarray(0, jnp.int32),
        overflow=cell_overflow,
        params=p,
    )


def rebuild_merge(state: State, old: CellListDense, special=None) -> CellListDense:
    new = build_cell(state, old.params, stencil=old.stencil)
    return dataclasses.replace(
        new,
        nbuilds=old.nbuilds + 1,
        ndanger=old.ndanger,
        overflow=old.overflow | new.overflow,
    )


def tick(cl: CellListDense) -> CellListDense:
    return dataclasses.replace(cl, ago=cl.ago + 1)


def needs_rebuild(state: State, cl: CellListDense) -> Array:
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


def compute(style, state: State, cl: CellListDense, eflag: bool, vflag: bool,
            cell_chunk: int = 128):
    """Dense per-cell pair evaluation for pair_terms styles.

    Returns (f, pe, virial) like models.pair.compute.
    """
    # force-only pass on TPU: take the fused Pallas kernel when the style
    # scalarizes (ops/pallas_pair; interpret-mode on CPU exercises the same
    # code in tests)
    if not eflag and not vflag and not state.box.triclinic:
        kk = getattr(style, "kernel_key", None)
        key = kk() if kk is not None else None
        if key is not None:
            from . import pallas_pair

            f = pallas_pair.compute_force(key, state, cl)
            return f, None, None

    p = cl.params
    cap = state.capacity
    ntot = p.total_cells
    cc = p.cell_cap
    dt = state.dtype
    single = style.ntypes == 1
    cutsq_tab = style.cutsq_table()
    cutsq_scalar = cutsq_tab[1, 1] if single else None
    owned = state.owned_mask

    chunk = min(cell_chunk, ntot)
    # pad cell count to a multiple of chunk with dead cells
    nchunk = -(-ntot // chunk)
    npad = nchunk * chunk
    cell_ids = jnp.arange(npad, dtype=jnp.int32)
    cell_ids = jnp.where(cell_ids < ntot, cell_ids, ntot)

    # ONE row gather of all atoms into the dense bucket layout; everything
    # downstream reads whole [cc,3] cell blocks (contiguous), never random
    # atom rows — the structural point of this path.
    bidx = jnp.clip(cl.buckets, 0, cap - 1)
    xb = state.x[bidx]  # [ntot+1, cc, 3]
    valid_b = cl.buckets < cap
    tb = None if single else state.type[bidx]

    def one_chunk(cids):
        own_idx = cl.buckets[cids]  # [chunk, cc]
        own_x = xb[cids]
        own_valid = valid_b[cids]

        ncells27 = cl.stencil[jnp.minimum(cids, ntot - 1)]  # [chunk, 27]
        ncells27 = jnp.where((cids < ntot)[:, None], ncells27, ntot)
        cc27 = 27 * cc
        cand_idx = cl.buckets[ncells27].reshape(cids.shape[0], cc27)
        cand_x = xb[ncells27].reshape(cids.shape[0], cc27, 3)
        cand_valid = valid_b[ncells27].reshape(cids.shape[0], cc27)

        dx = state.box.min_image(own_x[:, :, None, :] - cand_x[:, None, :, :])
        r2 = jnp.sum(dx * dx, axis=-1)  # [chunk, cc, 27cc]

        if single:
            ti = tj = None
            cutsq = cutsq_scalar
        else:
            ti = tb[cids][:, :, None]
            tj = tb[ncells27].reshape(cids.shape[0], cc27)[:, None, :]
            cutsq = cutsq_tab[ti, tj]

        self_mask = own_idx[:, :, None] == cand_idx[:, None, :]
        valid = (own_valid[:, :, None] & cand_valid[:, None, :]
                 & ~self_mask & (r2 < cutsq))
        r2s = jnp.where(valid, r2, jnp.ones((), dt))
        fpair, evdwl = style.pair_terms(r2s, ti, tj, eflag)
        fpair = jnp.where(valid, fpair, 0.0)
        fch = jnp.sum(dx * fpair[..., None], axis=2)  # [chunk, cc, 3]

        own_owned = owned[jnp.clip(own_idx, 0, cap - 1)] & own_valid
        pe_ch = vir_ch = None
        if eflag:
            pe_ch = 0.5 * jnp.sum(
                jnp.where(valid & own_owned[:, :, None], evdwl, 0.0)
            )
        if vflag:
            w = 0.5 * jnp.where(own_owned[:, :, None], fpair, 0.0)
            vir_ch = jnp.stack([
                jnp.sum(w * dx[..., 0] * dx[..., 0]),
                jnp.sum(w * dx[..., 1] * dx[..., 1]),
                jnp.sum(w * dx[..., 2] * dx[..., 2]),
                jnp.sum(w * dx[..., 0] * dx[..., 1]),
                jnp.sum(w * dx[..., 0] * dx[..., 2]),
                jnp.sum(w * dx[..., 1] * dx[..., 2]),
            ])
        z = jnp.zeros((), dt)
        return (own_idx, fch,
                pe_ch if eflag else z,
                vir_ch if vflag else jnp.zeros(6, dt))

    cids_chunks = cell_ids.reshape(nchunk, chunk)
    if nchunk == 1:
        own_idx, fch, pe, vir = one_chunk(cids_chunks[0])
        own_idx = own_idx[None]
        fch = fch[None]
    else:
        own_idx, fch, pe_c, vir_c = jax.lax.map(one_chunk, cids_chunks)
        pe = jnp.sum(pe_c)
        vir = jnp.sum(vir_c, axis=0)

    f = jnp.zeros_like(state.x)
    f = f.at[own_idx.reshape(-1)].set(
        fch.reshape(-1, 3), mode="drop"
    )
    return f, (pe if eflag else None), (vir if vflag else None)
