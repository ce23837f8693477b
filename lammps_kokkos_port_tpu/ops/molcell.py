"""Molecular dense cell force path: charges + special bonds, no per-pair
gathers.

The [N, K] matrix engine pays ~6 random row gathers per pair per step;
on TPU those gathers run far below HBM speed-of-light and dominated the
rhodo-class molecular step (1.66 s of a 1.72 s force eval at 32k atoms).
This engine is the molecular twin of ops/cellforce:

  - rebuild: bin atoms into dense sub-cutoff buckets (binsize ~ cutneigh/2,
    stencil reach ceil(cut/bin) cells per axis) — one sort, no candidate
    compaction, no [N,K] list at all;
  - force: per cell block, read the OWN rows and the stencil cells' rows as
    contiguous [cc, 8]-lane packed blocks (x, q, sqrt(eps), sigma — built
    once per step with ONE row gather), evaluate every candidate pair
    densely, and resolve special-bond weights by comparing candidate row
    ids against each atom's special table (an ms-length Python loop of
    dense int compares — VPU work, not gathers);
  - one scatter writes each atom's force exactly once.

Used for pair styles exposing `make_packed` + `packed_pair_terms`
(the mixable CHARMM/lj-cut coulomb family, models/pair_charmm.py) under
`special_bonds` masking — the bench/in.rhodo hot path. Mirrors how the
reference's Kokkos GPU path teams over bins (src/KOKKOS/npair_kokkos.cpp)
rather than building host-style half lists.
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


@dataclasses.dataclass(frozen=True)
class MolCellParams:
    cutneigh: float
    skin: float
    ncells: tuple          # (nx, ny, nz)
    cell_cap: int
    reach: int             # stencil radius in cells per axis
    every: int = 1
    delay: int = 0
    check: bool = True

    @property
    def total_cells(self) -> int:
        nx, ny, nz = self.ncells
        return nx * ny * nz

    @property
    def stencil_size(self) -> int:
        return (2 * self.reach + 1) ** 3


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["buckets", "stencil", "xhold", "ago", "nbuilds", "ndanger",
                 "overflow"],
    meta_fields=["params"],
)
@dataclasses.dataclass(frozen=True)
class MolCells:
    buckets: Array  # [ntot+1, cc] int32 atom rows (cap = padding)
    stencil: Array  # [ntot, S] int32 neighbor cell ids (ntot = dead)
    xhold: Array
    ago: Array
    nbuilds: Array
    ndanger: Array
    overflow: Array
    params: MolCellParams

    @property
    def sb(self):
        return None

    @property
    def shift(self):
        return None


def size_for_system(state: State, cutneigh: float, skin: float,
                    every: int = 1, delay: int = 0, check: bool = True,
                    cap_mult: float = 2.0) -> MolCellParams | None:
    """Sub-cutoff binning: target binsize cutneigh/2 (reach 2). Requires
    >= 2*reach+1 cells per dim so the wrapped stencil never aliases."""
    heights = nbr.box_heights(state.box)
    target = cutneigh / 2.0
    nc = np.maximum(1, np.floor(np.asarray(heights) / target).astype(int))
    reach = int(np.max(np.ceil(cutneigh / (np.asarray(heights) / nc))))
    if np.any(nc < 2 * reach + 1):
        return None
    n = int(jax.device_get(state.nlocal))
    vol = float(jax.device_get(state.box.volume))
    dens = max(n / vol, 1e-12)
    cellvol = vol / float(np.prod(nc))
    cc = int(np.ceil(dens * cellvol * cap_mult / 8) * 8)
    cc = max(cc, 8)
    return MolCellParams(cutneigh=cutneigh, skin=skin,
                         ncells=tuple(int(v) for v in nc), cell_cap=cc,
                         reach=reach, every=every, delay=delay, check=check)


def _stencil_table(p: MolCellParams, periodic) -> np.ndarray:
    nx, ny, nz = p.ncells
    ntot = p.total_cells
    r = p.reach
    rng = np.arange(-r, r + 1)
    offs = np.stack(np.meshgrid(rng, rng, rng, indexing="ij"),
                    axis=-1).reshape(-1, 3)
    cids = np.arange(ntot)
    cx = cids // (ny * nz)
    cy = (cids // nz) % ny
    cz = cids % nz
    coords = np.stack([cx, cy, cz], axis=-1)  # [ntot, 3]
    nc = coords[:, None, :] + offs[None, :, :]
    dims = np.array([nx, ny, nz])
    wrapped = np.mod(nc, dims)
    dead = np.zeros(nc.shape[:2], dtype=bool)
    for d in range(3):
        if not periodic[d]:
            dead |= (nc[:, :, d] < 0) | (nc[:, :, d] >= dims[d])
    ncid = (wrapped[:, :, 0] * ny + wrapped[:, :, 1]) * nz + wrapped[:, :, 2]
    return np.where(dead, ntot, ncid).astype(np.int32)


def build_cell(state: State, p: MolCellParams, special=None) -> MolCells:
    cap = state.capacity
    nx, ny, nz = p.ncells
    ntot = p.total_cells

    lamda = state.box.to_lamda(state.x)
    frac = lamda - jnp.floor(lamda)
    frac = jnp.clip(frac, 0.0, 1.0 - 1e-7)
    ncells_f = jnp.asarray([nx, ny, nz], dtype=frac.dtype)
    c = jnp.floor(frac * ncells_f).astype(jnp.int32)
    c = jnp.clip(c, 0, jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.int32))
    cid = (c[:, 0] * ny + c[:, 1]) * nz + c[:, 2]
    cid = jnp.where(state.valid_mask, cid, ntot)

    order = jnp.argsort(cid, stable=True).astype(jnp.int32)
    sorted_cid = cid[order]
    first = jnp.searchsorted(sorted_cid, sorted_cid,
                             side="left").astype(jnp.int32)
    rank = jnp.arange(cap, dtype=jnp.int32) - first
    buckets = jnp.full((ntot + 1, p.cell_cap), cap, dtype=jnp.int32)
    buckets = buckets.at[sorted_cid, rank].set(order, mode="drop")
    overflow = jnp.any(rank >= p.cell_cap)

    stencil = jnp.asarray(_stencil_table(p, state.box.periodic))
    return MolCells(
        buckets=buckets, stencil=stencil, xhold=state.x,
        ago=jnp.asarray(0, jnp.int32), nbuilds=jnp.asarray(1, jnp.int32),
        ndanger=jnp.asarray(0, jnp.int32), overflow=overflow, params=p)


def rebuild_merge(state: State, old: MolCells, special=None) -> MolCells:
    new = build_cell(state, old.params, special=special)
    return dataclasses.replace(
        new, nbuilds=old.nbuilds + 1, ndanger=old.ndanger,
        overflow=old.overflow | new.overflow)


def tick(cl: MolCells) -> MolCells:
    return dataclasses.replace(cl, ago=cl.ago + 1)


def needs_rebuild(state: State, cl: MolCells) -> Array:
    p = cl.params
    due = (cl.ago + 1 >= p.delay) & (jnp.mod(cl.ago + 1, p.every) == 0)
    if not p.check:
        return due
    half = 0.5 * p.skin
    d = state.box.min_image(state.x - cl.xhold)
    moved = jnp.max(jnp.where(state.valid_mask[:, None], jnp.abs(d), 0.0))
    return due & (moved > half * 0.5)  # conservative: per-component


def grow(p: MolCellParams) -> MolCellParams:
    return dataclasses.replace(
        p, cell_cap=int(np.ceil(p.cell_cap * 1.4 / 8) * 8))


def compute(style, state: State, cl: MolCells, eflag: bool, vflag: bool,
            special=None, cell_chunk: int = 32):
    """Dense molecular pair evaluation for packed styles.

    Returns (f, evdwl, ecoul, virial) like compute_detailed.
    """
    p = cl.params
    cap = state.capacity
    ntot = p.total_cells
    cc = p.cell_cap
    S = p.stencil_size
    dt = state.dtype
    from ..utils.units import get_units

    qqrd2e = get_units(state.units_name).qqr2e
    owned = state.owned_mask

    packed = style.make_packed(state)            # [cap, L]
    L = packed.shape[1]
    bidx = jnp.clip(cl.buckets, 0, cap - 1)
    pb = packed[bidx]                            # ONE gather [ntot+1, cc, L]
    valid_b = cl.buckets < cap
    pb = jnp.where(valid_b[..., None], pb, 0.0)
    owned_b = owned[bidx] & valid_b

    ms = 0
    if special is not None:
        ms = special.idx.shape[1]
        sidx_b = special.idx[bidx]               # [ntot+1, cc, ms]
        scls_b = special.cls[bidx]
        wlj_t = jnp.asarray(special.weights_lj, dt)
        wcl_t = jnp.asarray(special.weights_coul, dt)

    chunk = min(cell_chunk, ntot)
    nchunk = -(-ntot // chunk)
    npad = nchunk * chunk
    cell_ids = jnp.arange(npad, dtype=jnp.int32)
    cell_ids = jnp.where(cell_ids < ntot, cell_ids, ntot)

    def one_chunk(cids):
        B = cids.shape[0]
        own_idx = cl.buckets[cids]               # [B, cc]
        own_pk = pb[cids]                        # [B, cc, L]
        own_valid = valid_b[cids]
        own_owned = owned_b[cids]

        ncS = cl.stencil[jnp.minimum(cids, ntot - 1)]   # [B, S]
        ncS = jnp.where((cids < ntot)[:, None], ncS, ntot)
        Scc = S * cc
        cand_idx = cl.buckets[ncS].reshape(B, Scc)
        cand_pk = pb[ncS].reshape(B, Scc, L)
        cand_valid = valid_b[ncS].reshape(B, Scc)

        dx = state.box.min_image(own_pk[:, :, None, :3]
                                 - cand_pk[:, None, :, :3])
        r2 = jnp.sum(dx * dx, axis=-1)           # [B, cc, Scc]

        self_mask = own_idx[:, :, None] == cand_idx[:, None, :]
        valid = (own_valid[:, :, None] & cand_valid[:, None, :]
                 & ~self_mask)

        flj = fcoul = None
        if special is not None:
            # special weights by candidate-row comparison against each
            # atom's special table (ms dense compares, no gathers)
            flj = jnp.ones(r2.shape, dt)
            fcoul = jnp.ones(r2.shape, dt)
            own_sidx = sidx_b[cids]              # [B, cc, ms]
            own_scls = scls_b[cids]
            for m in range(ms):
                match = cand_idx[:, None, :] == own_sidx[:, :, m][:, :, None]
                wl = wlj_t[own_scls[:, :, m]][:, :, None]
                wc = wcl_t[own_scls[:, :, m]][:, :, None]
                flj = jnp.where(match, wl, flj)
                fcoul = jnp.where(match, wc, fcoul)

        r2s = jnp.where(valid, r2, jnp.ones((), dt))
        fpair, ev, ec = style.packed_pair_terms(
            r2s, own_pk, cand_pk, flj, fcoul, qqrd2e, eflag)
        fpair = jnp.where(valid, fpair, 0.0)
        fch = jnp.sum(dx * fpair[..., None], axis=2)  # [B, cc, 3]

        pe_v = pe_c = vir_ch = None
        if eflag:
            ow = valid & own_owned[:, :, None]
            pe_v = 0.5 * jnp.sum(jnp.where(ow, ev, 0.0))
            pe_c = 0.5 * jnp.sum(jnp.where(ow, ec, 0.0))
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
        return (own_idx, fch, pe_v if eflag else z, pe_c if eflag else z,
                vir_ch if vflag else jnp.zeros(6, dt))

    cids_chunks = cell_ids.reshape(nchunk, chunk)
    if nchunk == 1:
        own_idx, fch, pe_v, pe_c, vir = one_chunk(cids_chunks[0])
        own_idx = own_idx[None]
        fch = fch[None]
    else:
        own_idx, fch, pv_c, pc_c, vir_c = jax.lax.map(one_chunk,
                                                      cids_chunks)
        pe_v = jnp.sum(pv_c)
        pe_c = jnp.sum(pc_c)
        vir = jnp.sum(vir_c, axis=0)

    f = jnp.zeros_like(state.x)
    f = f.at[own_idx.reshape(-1)].set(fch.reshape(-1, 3), mode="drop")
    return (f, (pe_v if eflag else None), (pe_c if eflag else None),
            (vir if vflag else None))
