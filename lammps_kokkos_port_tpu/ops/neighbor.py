"""Neighbor engine: cell binning + fixed-width padded neighbor matrix.

TPU-native re-design of the reference's neighbor subsystem
(ref: src/neighbor.cpp, src/nbin_standard.cpp, src/npair_half_bin_newton.cpp,
and especially the Kokkos variant src/KOKKOS/npair_kokkos.cpp whose dense
`d_neighbors(nmax, maxneighs)` array + overflow-grow-retry loop is the model).

Design (SURVEY.md §7):
  - FULL lists, Newton off: every atom sees all its neighbors and accumulates
    its own force — no scatter races, the exact mode the reference's GPU path
    prefers (ref: src/KOKKOS/kokkos.cpp:260, pair_kokkos.h FULL).
  - Minimum-image convention instead of ghost atoms on a single chip: valid
    whenever cutneigh < half the box height (the multi-chip path in
    parallel/ owns real halo exchange).
  - Everything is static-shape: the cell grid dims, the per-cell capacity,
    and the neighbor width K are compile-time constants. Overflow is
    *detected* on device (a sticky flag in the list) and *resolved* on the
    host by re-padding and re-running the segment — the XLA analog of the
    Kokkos clamp/count/grow(×1.2)/rerun idiom
    (ref: src/KOKKOS/npair_kokkos.cpp:225-330,536-540).
  - Atom binning is sort-based (argsort by cell id + rank-in-cell scatter)
    instead of atomics (ref: src/KOKKOS/nbin_kokkos.cpp uses atomic_fetch_add;
    sorting is the TPU-friendly equivalent).

Padded (invalid) atoms are binned into a dead overflow cell that no stencil
ever reads, so they can never appear as neighbor candidates.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import State

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class NeighborParams:
    """Static neighbor configuration (compile-time constants).

    `cutneigh` = max force cutoff + skin (ref: neighbor->cutneighmax).
    Rebuild policy mirrors `neigh_modify every E delay D check yes/no`
    (ref: src/neighbor.cpp:2309-2404 Neighbor::decide).
    """

    cutneigh: float
    skin: float
    every: int = 1
    delay: int = 0
    check: bool = True
    K: int = 64  # neighbor matrix width
    cell_cap: int = 32  # max atoms per cell
    ncells: tuple[int, int, int] = (0, 0, 0)  # (0,0,0) => all-pairs mode
    # explicit periodic-image range per dim (all-pairs mode only): when the
    # cutoff exceeds half the cell height, minimum-image undercounts — the
    # reference's ghost atoms see MULTIPLE images of the same neighbor. A
    # nonzero range enumerates (j, image-shift) candidate pairs instead,
    # recording the shift in NeighborList.shift.
    images: tuple[int, int, int] = (0, 0, 0)

    @property
    def all_pairs(self) -> bool:
        return self.ncells[0] == 0

    @property
    def use_shifts(self) -> bool:
        return any(i > 0 for i in self.images)

    @property
    def nshift(self) -> int:
        ix, iy, iz = self.images
        return (2 * ix + 1) * (2 * iy + 1) * (2 * iz + 1)

    @property
    def total_cells(self) -> int:
        nx, ny, nz = self.ncells
        return nx * ny * nz


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["idx", "sb", "shift", "nneigh", "xhold", "ago", "nbuilds",
                 "ndanger", "overflow"],
    meta_fields=["params"],
)
@dataclasses.dataclass(frozen=True)
class NeighborList:
    """Fixed-width neighbor matrix + rebuild bookkeeping.

    `idx[i, k]` is the local index of the k-th neighbor of atom i; entries
    >= capacity are padding. The matrix is FULL (both (i,j) and (j,i) stored).
    `sb[i, k]` (optional) is the special-bond class of the pair (0 plain,
    1/2/3 = 1-2/1-3/1-4) — the unpacked analog of the reference's SBBITS
    packing (ref: src/npair_half_bin_newton.cpp `j ^ (which << SBBITS)`).
    """

    idx: Array  # [cap, K] int32
    sb: Array | None  # [cap, K] int32 special classes, or None
    shift: Array | None  # [cap, K] int32 image-shift codes, or None
    nneigh: Array  # [cap] int32 true neighbor counts (may exceed K on overflow)
    xhold: Array  # [cap, 3] positions at last build (distance check)
    ago: Array  # scalar int32: steps since last build
    nbuilds: Array  # scalar int32
    ndanger: Array  # scalar int32 ("dangerous" builds: triggered by distance)
    overflow: Array  # scalar bool: any capacity overflow since last reset
    params: NeighborParams

    @property
    def K(self) -> int:
        return self.idx.shape[1]


def box_heights(box) -> np.ndarray:
    """Perpendicular distances between periodic lattice planes, per dim.

    For orthogonal boxes this is just prd; for triclinic it is the true
    plane spacing (what the reference measures via rows of h_inv,
    ref: src/comm_brick.cpp:243-266). Host-side (concrete box only).
    """
    h = np.asarray(jax.device_get(box.h))
    vol = abs(np.linalg.det(h))
    a, b, c = h[:, 0], h[:, 1], h[:, 2]
    return np.array([
        vol / np.linalg.norm(np.cross(b, c)),
        vol / np.linalg.norm(np.cross(a, c)),
        vol / np.linalg.norm(np.cross(a, b)),
    ])


def choose_grid(box, cutneigh: float) -> tuple[int, int, int]:
    """Static cell-grid dims: largest grid whose cells span >= cutneigh
    along each perpendicular plane direction.

    Falls back to all-pairs (0,0,0) when any dim has fewer than 3 cells
    (the 27-stencil would alias periodic images).
    """
    nc = np.maximum(1, np.floor(box_heights(box) / cutneigh).astype(int))
    if np.any(nc < 3):
        return (0, 0, 0)
    return (int(nc[0]), int(nc[1]), int(nc[2]))


def _stencil_offsets() -> np.ndarray:
    """27 relative cell offsets, [27, 3]."""
    r = np.arange(-1, 2)
    k, j, i = np.meshgrid(r, r, r, indexing="ij")
    return np.stack([i.ravel(), j.ravel(), k.ravel()], axis=1)


def _bin_atoms(state: State, p: NeighborParams):
    """Assign atoms to cells and build dense per-cell buckets.

    Returns (cell_coords [cap,3] int32, buckets [ntot+1, cell_cap] int32,
    cell_overflow bool). Bucket entries >= cap are padding.
    """
    cap = state.capacity
    nx, ny, nz = p.ncells
    ntot = p.total_cells

    lamda = state.box.to_lamda(state.x)
    frac = lamda - jnp.floor(lamda)  # wrap periodic dims into [0,1)
    # non-periodic dims: clamp (atoms outside the box bind to edge cells)
    frac = jnp.clip(frac, 0.0, 1.0 - 1e-7)

    ncells_f = jnp.asarray([nx, ny, nz], dtype=frac.dtype)
    c = jnp.floor(frac * ncells_f).astype(jnp.int32)
    c = jnp.clip(c, 0, jnp.asarray([nx - 1, ny - 1, nz - 1], dtype=jnp.int32))

    cid = (c[:, 0] * ny + c[:, 1]) * nz + c[:, 2]
    # padded atoms go to the dead cell `ntot`
    cid = jnp.where(state.valid_mask, cid, ntot)

    # sort-based binning: stable argsort by cell id, rank within cell
    order = jnp.argsort(cid, stable=True).astype(jnp.int32)
    sorted_cid = cid[order]
    first = jnp.searchsorted(sorted_cid, sorted_cid, side="left").astype(jnp.int32)
    rank = jnp.arange(cap, dtype=jnp.int32) - first

    buckets = jnp.full((ntot + 1, p.cell_cap), cap, dtype=jnp.int32)
    buckets = buckets.at[sorted_cid, rank].set(order, mode="drop")

    counts = jnp.zeros(ntot + 1, dtype=jnp.int32).at[cid].add(1, mode="drop")
    cell_overflow = jnp.max(counts[:ntot]) > p.cell_cap
    return c, buckets, cell_overflow


def _neighbor_cell_ids(state: State, p: NeighborParams, ci: Array) -> Array:
    """27 stencil cell ids for each atom in a chunk: [chunk, 27]."""
    nx, ny, nz = p.ncells
    ntot = p.total_cells
    offs = jnp.asarray(_stencil_offsets(), dtype=jnp.int32)  # [27,3]
    nc = ci[:, None, :] + offs[None, :, :]  # [chunk, 27, 3]
    dims = jnp.asarray([nx, ny, nz], dtype=jnp.int32)
    wrapped = jnp.mod(nc, dims)
    # non-periodic dims: out-of-range neighbor cells are dead
    dead = jnp.zeros(nc.shape[:2], dtype=bool)
    for d in range(3):
        if not state.box.periodic[d]:
            dead = dead | (nc[:, :, d] < 0) | (nc[:, :, d] >= dims[d])
    ncid = (wrapped[:, :, 0] * ny + wrapped[:, :, 1]) * nz + wrapped[:, :, 2]
    return jnp.where(dead, ntot, ncid)  # dead cell is all-padding


def shift_offsets(images: tuple) -> np.ndarray:
    """[nshift, 3] integer image offsets; code 0 is always (0,0,0)."""
    ix, iy, iz = images
    offs = [
        (sx, sy, sz)
        for sx in range(-ix, ix + 1)
        for sy in range(-iy, iy + 1)
        for sz in range(-iz, iz + 1)
    ]
    offs.sort(key=lambda o: (o != (0, 0, 0), o))  # (0,0,0) first
    return np.asarray(offs, dtype=np.int64)


def _chunk_size(cap: int, target: int = 4096) -> int:
    """Largest divisor of cap that is <= target (cap is a multiple of 8)."""
    if cap <= target:
        return cap
    best = 1
    d = 1
    while d * d <= cap:
        if cap % d == 0:
            if d <= target:
                best = max(best, d)
            q = cap // d
            if q <= target:
                best = max(best, q)
        d += 1
    return best


def _special_plan(special):
    """Static decisions from special-bond weights.

    Returns (excluded_classes, need_sb): classes dropped from the list
    entirely (weight 0 in exclude mode — ref: Neighbor::special_flag == 0)
    and whether a per-pair class array must be carried for fractional or
    kspace-masked weights (special_flag == 2).
    """
    if special is None:
        return (), False
    excluded = []
    need_sb = False
    for c in (1, 2, 3):
        wl = special.weights_lj[c]
        wc = special.weights_coul[c]
        if special.mode == "exclude" and wl == 0.0 and wc == 0.0:
            excluded.append(c)
        elif wl != 1.0 or wc != 1.0:
            need_sb = True
    return tuple(excluded), need_sb


def _pair_classes(cand, ai, special):
    """Special class of each (i=ai, j=cand) pair: [chunk, C] int32."""
    sidx = special.idx[ai]  # [chunk, ms]
    scls = special.cls[ai]  # [chunk, ms]
    match = cand[:, :, None] == sidx[:, None, :]  # [chunk, C, ms]
    return jnp.max(jnp.where(match, scls[:, None, :], 0), axis=-1)


def build(state: State, p: NeighborParams, special=None) -> NeighborList:
    """Build the neighbor matrix (jit-compatible; static shapes from `p`).

    The candidate gather + distance filter + fixed-width compaction runs in
    sequential chunks of atoms (lax.map) so peak HBM is one chunk's
    [chunk, 27*cell_cap] intermediates — the rebuild is off the hot path
    (every ~10-20 steps), so memory matters more than a few extra kernel
    launches. `special` (core.topology.SpecialBonds) applies 1-2/1-3/1-4
    exclusion/masking.
    """
    cap = state.capacity
    cutsq = jnp.asarray(p.cutneigh * p.cutneigh, dtype=state.dtype)
    arange_cap = jnp.arange(cap, dtype=jnp.int32)
    excluded, need_sb = _special_plan(special)
    use_shifts = p.all_pairs and p.use_shifts
    nsh = p.nshift if use_shifts else 1

    if use_shifts:
        # image shift vectors in box coords: S @ h^T
        offs = jnp.asarray(shift_offsets(p.images), dtype=state.dtype)
        shift_vecs = offs @ state.box.h.T  # [nsh, 3]

    if p.all_pairs:
        cell_overflow = jnp.asarray(False)
        buckets = None
        cell_coords = None
    else:
        cell_coords, buckets, cell_overflow = _bin_atoms(state, p)

    # bound one chunk's [chunk, candidates] intermediates (~6 live f32
    # copies) — molecular systems reach 27*cell_cap ~ 15k candidates/row
    width = cap * nsh if p.all_pairs else 27 * p.cell_cap
    chunk = _chunk_size(cap, target=max(64, 12 * 2 ** 20 // max(width, 1)))
    nchunk = cap // chunk

    def one_chunk(args):
        xi, ci, ai, vm = args  # [chunk,3], [chunk,3] int32, [chunk], [chunk]
        if use_shifts:
            # candidates are (atom j, image shift) combos: combo = j*nsh + code
            combo = jnp.arange(cap * nsh, dtype=jnp.int32)[None, :]
            combo = jnp.broadcast_to(combo, (chunk, cap * nsh))
            cand = combo // nsh
            code = combo % nsh
            base_valid = state.valid_mask[cand]
            xj = state.x[cand] + shift_vecs[code]
            dx = xi[:, None, :] - xj
            # self excluded only in the home image: interaction with one's
            # own periodic image is real (the reference sees it via ghosts)
            self_mask = (cand == ai[:, None]) & (code == 0)
        elif p.all_pairs:
            cand = jnp.broadcast_to(arange_cap[None, :], (chunk, cap))
            base_valid = jnp.broadcast_to(state.valid_mask[None, :], (chunk, cap))
            dx = state.box.min_image(xi[:, None, :] - state.x[cand])
            self_mask = cand == ai[:, None]
        else:
            ncid = _neighbor_cell_ids(state, p, ci)  # [chunk, 27]
            cand = buckets[ncid].reshape(chunk, 27 * p.cell_cap)
            base_valid = cand < cap
            xj = state.x[jnp.clip(cand, 0, cap - 1)]
            dx = state.box.min_image(xi[:, None, :] - xj)
            self_mask = cand == ai[:, None]
        r2 = jnp.sum(dx * dx, axis=-1)
        valid = base_valid & ~self_mask & (r2 < cutsq) & vm[:, None]
        if excluded:
            cls = _pair_classes(cand, ai, special)
            drop = jnp.zeros_like(valid)
            for c in excluded:
                drop = drop | (cls == c)
            valid = valid & ~drop
        if use_shifts:
            key = jnp.where(valid, combo, cap * nsh)
            key = jnp.sort(key, axis=-1)[:, : p.K]
            idx_c = jnp.minimum(key // nsh, cap)
            shift_c = jnp.where(idx_c < cap, key % nsh, 0)
        else:
            # (a cumsum+scatter compaction was tried here: TPU scatters
            # are 2.4x SLOWER than the sort network at this width)
            key = jnp.where(valid, cand, cap)
            key = jnp.sort(key, axis=-1)
            idx_c = key[:, : p.K]
            shift_c = jnp.zeros((chunk, 1), dtype=jnp.int32)  # placeholder
        if need_sb:
            sb_c = _pair_classes(idx_c, ai, special)
            sb_c = jnp.where(idx_c < cap, sb_c, 0)
        else:
            sb_c = jnp.zeros((chunk, 1), dtype=jnp.int32)  # placeholder
        return idx_c, sb_c, shift_c, jnp.sum(valid, axis=-1).astype(jnp.int32)

    args = (
        state.x.reshape(nchunk, chunk, 3),
        (cell_coords.reshape(nchunk, chunk, 3) if cell_coords is not None
         else jnp.zeros((nchunk, chunk, 3), dtype=jnp.int32)),
        arange_cap.reshape(nchunk, chunk),
        state.valid_mask.reshape(nchunk, chunk),
    )
    if nchunk == 1:
        idx, sb, shift, nneigh = one_chunk(jax.tree.map(lambda a: a[0], args))
    else:
        idx, sb, shift, nneigh = jax.lax.map(one_chunk, args)
        idx = idx.reshape(cap, p.K)
        sb = sb.reshape(cap, -1)
        shift = shift.reshape(cap, -1)
        nneigh = nneigh.reshape(cap)

    k_overflow = jnp.max(nneigh) > p.K
    overflow = cell_overflow | k_overflow

    return NeighborList(
        idx=idx,
        sb=sb if need_sb else None,
        shift=shift if use_shifts else None,
        nneigh=jnp.minimum(nneigh, p.K),
        xhold=state.x,
        ago=jnp.asarray(0, dtype=jnp.int32),
        nbuilds=jnp.asarray(1, dtype=jnp.int32),
        ndanger=jnp.asarray(0, dtype=jnp.int32),
        overflow=overflow,
        params=p,
    )


def poison_on_overflow(state: State, nl):
    """Make capacity overflow impossible to ignore: if the segment ends
    with the sticky overflow flag set, the returned positions are NaN, so
    a caller that bypasses the grow-retry contract gets loud non-finite
    thermo/forces instead of silently corrupt physics. Simulation's own
    retry loop checks nl.overflow FIRST and discards this state, so the
    healed path never observes the poison (the Kokkos analog is the
    resize-retry while-loop contract, ref:
    src/KOKKOS/npair_kokkos.cpp:225-330,536-540 — results from an
    overflowed build are never consumed)."""
    x = jnp.where(nl.overflow, jnp.asarray(jnp.nan, state.x.dtype), state.x)
    return state.replace(x=x)


def rebuild_merge(state: State, old: NeighborList, special=None) -> NeighborList:
    """Rebuild, accumulating bookkeeping from the previous list."""
    new = build(state, old.params, special=special)
    return dataclasses.replace(
        new,
        nbuilds=old.nbuilds + 1,
        ndanger=old.ndanger,
        overflow=old.overflow | new.overflow,
    )


def needs_rebuild(state: State, nl: NeighborList) -> Array:
    """Jittable Neighbor::decide: every/delay cadence + half-skin trigger.

    ref: src/neighbor.cpp:2309-2404 — `ago` counts steps since the last
    build; with `check` the rebuild additionally requires some atom to have
    moved more than half the skin since the last build.
    """
    p = nl.params
    ago = nl.ago + 1  # decide() runs after the position update
    cadence = (ago >= p.delay) & (jnp.mod(ago, max(p.every, 1)) == 0)
    if not p.check:
        return cadence
    half_skin_sq = (0.5 * p.skin) ** 2
    disp = state.x - nl.xhold
    d2 = jnp.sum(disp * disp, axis=-1)
    d2 = jnp.where(state.valid_mask, d2, 0.0)
    moved = jnp.max(d2) > half_skin_sq
    return cadence & moved


def tick(nl: NeighborList) -> NeighborList:
    """Advance the `ago` counter by one step (no rebuild this step)."""
    return dataclasses.replace(nl, ago=nl.ago + 1)


# ---------------------------------------------------------------------------
# Host-side capacity management (the grow-and-retry loop)
# ---------------------------------------------------------------------------


def size_for_system(
    state: State,
    cutneigh: float,
    skin: float,
    every: int = 1,
    delay: int = 0,
    check: bool = True,
    k_pad: float = 1.25,
    cell_pad: float = 1.6,
    k_round: int = 8,
    cell_round: int = 4,
    ncells: tuple[int, int, int] | None = None,
) -> NeighborParams:
    """Pick initial padded capacities from host-side counting + density.

    cell_cap comes from exact numpy bin counts (cheap); K from the local
    density estimate. Any underestimate is healed by the overflow-retry loop
    in the runner (the Kokkos clamp/count/grow idiom,
    ref: src/KOKKOS/npair_kokkos.cpp:225-330) — so these only need to be
    good first guesses, never giant trial builds.
    """
    prd = np.asarray(jax.device_get(state.box.prd))
    if ncells is None:
        ncells = choose_grid(state.box, cutneigh)
    n = int(jax.device_get(state.nlocal))

    def round_up(v, m):
        return ((v + m - 1) // m) * m

    if ncells == (0, 0, 0):
        # small box: enumerate explicit periodic images out to the cutoff
        # (minimum-image undercounts once cutneigh > height/2)
        heights = box_heights(state.box)
        images = tuple(
            int(np.ceil(cutneigh / heights[d])) if state.box.periodic[d] else 0
            for d in range(3)
        )
        nsh = 1
        for im in images:
            nsh *= 2 * im + 1
        return NeighborParams(
            cutneigh=cutneigh, skin=skin, every=every, delay=delay, check=check,
            K=min(max(n - 1, 4) * min(nsh, 4), state.capacity * nsh),
            cell_cap=max(n, 1),
            ncells=ncells, images=images,
        )

    # exact per-cell occupancy on the host
    counts = np.bincount(
        _cell_ids_host(state, ncells),
        minlength=ncells[0] * ncells[1] * ncells[2] + 1,
    )
    max_cell = int(counts[:-1].max()) if len(counts) > 1 else int(counts.max())
    cell_cap = round_up(max(int(max_cell * cell_pad) + 1, 4), cell_round)

    # density-based neighbor estimate (max cell occupancy bounds local density)
    vol = float(np.prod(box_heights(state.box)))
    vol_cell = vol / (ncells[0] * ncells[1] * ncells[2])
    dens = max(n / vol, max_cell / vol_cell * 0.7)
    est = 4.0 / 3.0 * np.pi * cutneigh**3 * dens
    K = round_up(max(int(est * k_pad) + 1, 8), k_round)
    K = min(K, state.capacity)

    return NeighborParams(
        cutneigh=cutneigh, skin=skin, every=every, delay=delay, check=check,
        K=K, cell_cap=cell_cap, ncells=ncells,
    )


def _cell_ids_host(state: State, ncells) -> np.ndarray:
    """Numpy cell ids for sizing (padded atoms -> dead cell)."""
    nx, ny, nz = ncells
    x = np.asarray(jax.device_get(state.x))
    hinv = np.asarray(jax.device_get(state.box.h_inv))
    lo = np.asarray(jax.device_get(state.box.lo))
    lam = (x - lo) @ hinv.T
    frac = lam - np.floor(lam)
    frac = np.clip(frac, 0.0, 1.0 - 1e-7)
    c = np.floor(frac * np.array([nx, ny, nz])).astype(np.int64)
    c = np.minimum(c, np.array([nx - 1, ny - 1, nz - 1]))
    cid = (c[:, 0] * ny + c[:, 1]) * nz + c[:, 2]
    valid = np.asarray(jax.device_get(state.valid_mask))
    return np.where(valid, cid, nx * ny * nz)


def grow(p: NeighborParams, factor: float = 1.3) -> NeighborParams:
    """Grow capacities after an overflow (ref: npair_kokkos.cpp grow ×1.2)."""
    return dataclasses.replace(
        p,
        K=int(p.K * factor) + 8,
        cell_cap=int(p.cell_cap * factor) + 4,
    )
