"""Quantile-column z-window pair engine ("zwin"): the static-shape TPU
answer to the dense cell kernel's candidate waste.

The cell-dense paths (ops/sortedforce + ops/pallas_pair) evaluate
14 * cell_cap ~ 448 candidate lanes per atom against ~19 real half
neighbors: the half-stencil VOLUME (13.5 cells of cutoff^3) plus the
max-occupancy cell padding cost ~27x the physical pair count
(VERDICT r4 weak #1; ref economics: src/npair_half_bin_newton.cpp:36-160
touches ~55 candidates per atom). This engine cuts the candidate set
~2.8x by replacing cubic cells with EQUAL-COUNT columns + z-sorted slots:

  - the box is partitioned into nx x ny xy-columns by a 2-level QUANTILE
    split (x-slabs of equal atom count, then y-quantiles inside each
    slab) so every column holds the same number of atoms (+/-1). Atoms
    within a column are sorted by z and stored in slots [0, S);
  - because counts are equal, slot index ~ z is aligned ACROSS columns
    (to +/- a couple of slots), so the candidate window for the k-th
    8-atom chunk of any column is a STATIC slot range [8k-OFF,
    8k-OFF+WN) of the neighbor column: no per-chunk dynamic indexing,
    no gathers, no per-cell max-occupancy padding — the lanes are the
    columns themselves (ncol ~ 121 -> one padded 128 lane tile);
  - Newton halving over the 5-column half set {self-forward, (0,+1),
    (+1,-1), (+1,0), (+1,+1)} with reverse contributions accumulated by
    static shifted adds (the structural analog of half lists + reverse
    communication, ref: src/comm_brick.cpp:598);
  - z periodicity via G ghost rows at both ends of the slot axis
    (bottom atoms +Lz appended, top atoms -Lz prepended — both STATIC
    slices because counts are equal); x/y periodicity via whole-grid
    lane rolls with seam-corrected +/-L shifts;
  - window sufficiency, quantile-width validity (every column strip must
    stay wider than the capture radius), and slot-capacity are all
    CHECKED in-graph at every rebuild into the sticky overflow flag: the
    host heals by growing windows / slots and re-running the segment —
    the same clamp-detect-grow-retry idiom as the neighbor matrix
    (ref: src/KOKKOS/npair_kokkos.cpp:225-330).

Everything in the hot path is static slices, static lane rolls, and
elementwise math over [npc, 8, W, ncol] blocks — XLA-fusable with
near-zero padding waste ((128/121) * slot rounding ~ 6%).
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

# pad rows carry DISTINCT far-away sentinel positions (base + row*step on
# the space diagonal): pad-real and pad-pad pairs all fail the cutoff by
# plain distance, so the hot loop needs no validity lanes at all
PAD_BASE = 4.0e4
PAD_STEP = 16.0
# sort key for invalid rows (beyond any coordinate or pad sentinel)
_SORT_BIG = 3.0e18


@dataclasses.dataclass(frozen=True)
class ZwinParams:
    """Static geometry + rebuild policy (hashable; baked into the jit)."""

    nx: int            # x-quantile slabs
    ny: int            # y-quantiles per slab
    S: int             # slots per column (multiple of 8)
    G: int             # ghost rows per end (multiple of 8)
    WS: int            # self-forward window (multiple of 8)
    WN: int            # near-column window (multiple of 8)
    OFF: int           # near-window back-offset (multiple of 8)
    cutneigh: float    # capture radius (force cutoff + skin)
    skin: float
    every: int = 1
    delay: int = 0
    check: bool = True

    @property
    def ncol(self) -> int:
        return self.nx * self.ny

    @property
    def npc(self) -> int:
        return self.S // 8

    @property
    def capacity(self) -> int:
        return self.S * self.ncol


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["xhold", "ago", "nbuilds", "ndanger", "overflow"],
    meta_fields=["params"],
)
@dataclasses.dataclass(frozen=True)
class ZwinCells:
    """Rebuild bookkeeping; the column layout is the state itself."""

    xhold: Array
    ago: Array
    nbuilds: Array
    ndanger: Array
    overflow: Array
    params: ZwinParams

    @property
    def sb(self):
        return None

    @property
    def shift(self):
        return None


# the 4 cross-column offsets of the Newton half set (dx, dy); self-forward
# is handled separately with the static lane>sublane mask
_HALF_COLS = ((0, 1), (1, -1), (1, 0), (1, 1))


# -- partition ----------------------------------------------------------


def _partition_dest(state: State, p: ZwinParams):
    """Per-row destination slots of the geometric-column layout: column
    by xy cell (widths >= cutneigh by construction, so +/-1 column
    adjacency is always complete), slot = z-rank within the column.

    Returns (dest [cap] int32 — slot*ncol + col, or >= cap to drop,
    slot_overflow bool). Pure jnp; positions must already be
    box-wrapped."""
    cap = state.capacity
    nx, ny, ncol = p.nx, p.ny, p.ncol
    valid = state.valid_mask
    rows = jnp.arange(cap, dtype=jnp.int32)
    x = state.x
    fbig = jnp.asarray(_SORT_BIG, x.dtype)

    # geometric xy columns from fractional coordinates (triclinic-safe)
    lam = state.box.to_lamda(x)
    frac = lam - jnp.floor(lam)
    frac = jnp.clip(frac, 0.0, 1.0 - 1e-7)
    gx = jnp.clip((frac[:, 0] * nx).astype(jnp.int32), 0, nx - 1)
    gy = jnp.clip((frac[:, 1] * ny).astype(jnp.int32), 0, ny - 1)
    col = gx * ny + gy

    # z-rank within each column via one stable 2-key sort
    kz = jnp.where(valid, x[:, 2], fbig)
    ckey = jnp.where(valid, col, ncol)
    _, _, sorted_rows = jax.lax.sort((ckey, kz, rows), num_keys=2)
    rank3 = jnp.zeros(cap, jnp.int32).at[sorted_rows].set(rows,
                                                          mode="drop")
    counts = jnp.zeros(ncol + 1, jnp.int32).at[
        jnp.where(valid, col, ncol)].add(1, mode="drop")
    cstart = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts[:ncol])])
    rank_in = rank3 - cstart[jnp.minimum(col, ncol)]
    # STRETCHED-RANK slots: rank r of an nc-atom column lands at slot
    # r*S//nc — interspersing the pad rows so slot ~ per-column z-quantile
    # stays aligned ACROSS columns whatever their counts (injective while
    # nc <= S; commensurate-lattice count disparity and equilibrium
    # density fluctuation both stop inflating the static windows)
    nc = jnp.maximum(counts[:ncol][jnp.minimum(col, ncol - 1)], 1)
    slot = rank_in * p.S // nc
    slot_overflow = jnp.any(counts[:ncol] > p.S)
    dest = jnp.where(valid & (slot < p.S), slot * ncol + col, cap)
    return dest, slot_overflow


def _apply_dest(state: State, dest, p: ZwinParams):
    """Move rows to their destination slots (forward permutation with one
    narrow int scatter + packed row gathers — same trick as
    sortedforce._apply_perm), then stamp DISTINCT pad sentinels."""
    cap = state.capacity
    row = jnp.arange(cap, dtype=jnp.int32)
    perm = jnp.full((cap,), cap, dtype=jnp.int32)
    perm = perm.at[dest].set(row, mode="drop", unique_indices=True)
    valid = perm < cap
    safe = jnp.minimum(perm, cap - 1)

    def pack(arrs):
        cols = [a[:, None] if a.ndim == 1 else a
                for a in arrs if a is not None]
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
    fm = jnp.where(valid[:, None], fp[safe], 0.0)
    im = jnp.where(valid[:, None], ip[safe], 0)
    x, v, q = unpack(fm, farrs)
    typ, tag, image, molecule, mask = unpack(im, iarrs)
    # distinct diagonal pad sentinels (see module docstring)
    pad = (PAD_BASE + row.astype(x.dtype) * PAD_STEP)[:, None]
    x = jnp.where(valid[:, None], x, pad)
    return state.replace(x=x, v=v, q=q, type=typ, tag=tag, image=image,
                         molecule=molecule, mask=mask)


# -- neighbor-column assembly -------------------------------------------


def _lane_maps(p: ZwinParams):
    """Static per-offset lane source maps + seam shift masks.

    For offset (dx, dy): lane c = (s, j) reads data of column
    ((s+dx) % nx, (j+dy) % ny); returns (src [ncol] int lane permutation,
    shift_x [ncol] in {-1,0,1} * Lx units, shift_y likewise).
    Pure numpy — consumed at trace time as constant index arrays for
    jnp.take along lanes.
    """
    nx, ny = p.nx, p.ny
    c = np.arange(nx * ny)
    s, j = c // ny, c % ny
    maps = {}
    for dx, dy in _HALF_COLS:
        s2 = s + dx
        j2 = j + dy
        shift_x = np.where(s2 >= nx, 1.0, np.where(s2 < 0, -1.0, 0.0))
        shift_y = np.where(j2 >= ny, 1.0, np.where(j2 < 0, -1.0, 0.0))
        src = (s2 % nx) * ny + (j2 % ny)
        maps[(dx, dy)] = (src.astype(np.int32), shift_x.astype(np.float32),
                          shift_y.astype(np.float32))
    return maps


def _ext_grids(state: State, p: ZwinParams):
    """[SE, ncol] component grids with z ghost rows; SE = S + 2G."""
    S, G, ncol = p.S, p.G, p.ncol
    dt = state.dtype
    prd = state.box.prd.astype(dt)
    X = state.x[:, 0].reshape(S, ncol)
    Y = state.x[:, 1].reshape(S, ncol)
    Z = state.x[:, 2].reshape(S, ncol)
    ex = jnp.concatenate([X[S - G:], X, X[:G]], axis=0)
    ey = jnp.concatenate([Y[S - G:], Y, Y[:G]], axis=0)
    ez = jnp.concatenate([Z[S - G:] - prd[2], Z, Z[:G] + prd[2]], axis=0)
    return ex, ey, ez


def _rolled(ex, ey, ez, src, shift_x, shift_y, prd):
    """Neighbor-column view: lane permutation + seam-corrected L shifts."""
    rx = jnp.take(ex, src, axis=1) + shift_x * prd[0]
    ry = jnp.take(ey, src, axis=1) + shift_y * prd[1]
    rz = jnp.take(ez, src, axis=1)
    return rx, ry, rz


def _window_view(g: Array, p: ZwinParams, off: int, W: int) -> Array:
    """[SE, ncol] -> [npc, W, ncol]: the static sliding window — chunk k's
    rows are ext rows [G + 8k - off, G + 8k - off + W)."""
    G, S, npc, ncol = p.G, p.S, p.npc, p.ncol
    blocks = [
        jax.lax.slice_in_dim(g, G - off + 8 * d, G - off + 8 * d + S,
                             axis=0).reshape(npc, 8, ncol)
        for d in range(W // 8)
    ]
    return jnp.concatenate(blocks, axis=1)


def _fold_windows(r: Array, p: ZwinParams, off: int, W: int) -> Array:
    """Inverse of _window_view for accumulation: [npc, W, ncol] summed
    back into [SE, ncol] (overlap-add of the W//8 shifted block lanes)."""
    G, S, npc, ncol = p.G, p.S, p.npc, p.ncol
    SE = S + 2 * G
    out = jnp.zeros((SE, ncol), r.dtype)
    for d in range(W // 8):
        blk = r[:, 8 * d:8 * (d + 1), :].reshape(S, ncol)
        start = G - off + 8 * d
        out = jax.lax.dynamic_update_slice_in_dim(
            out, jax.lax.dynamic_slice_in_dim(out, start, S, axis=0) + blk,
            start, axis=0)
    return out


def _unroll_lanes(fr: Array, src: np.ndarray) -> Array:
    """Scatter reverse forces from the rolled frame back to true lanes:
    lane c of the rolled frame holds column src[c]'s atoms, so its
    reaction belongs at lane src[c]. src is a permutation -> use its
    inverse as a gather."""
    inv = np.empty_like(src)
    inv[src] = np.arange(len(src), dtype=src.dtype)
    return jnp.take(fr, inv, axis=1)


# -- force/energy evaluation --------------------------------------------


def compute(style, state: State, cl: ZwinCells, eflag: bool, vflag: bool):
    """(f [cap,3], pe, virial6) — the SortedCells-compatible interface.

    Newton-halved: every pair evaluated once; forward forces accumulate
    into the own rows, reactions via static shifted adds (+ ghost and
    lane-roll folds)."""
    p = cl.params
    cap = state.capacity
    S, G, ncol, npc = p.S, p.G, p.ncol, p.npc
    dt = state.dtype
    prd = state.box.prd.astype(dt)
    cutsq = jnp.asarray(style.cutsq_table()[1, 1], dt)

    ex, ey, ez = _ext_grids(state, p)
    own_x = state.x[:, 0].reshape(npc, 8, 1, ncol)
    own_y = state.x[:, 1].reshape(npc, 8, 1, ncol)
    own_z = state.x[:, 2].reshape(npc, 8, 1, ncol)

    fwd = [jnp.zeros((npc, 8, ncol), dt) for _ in range(3)]
    rev_ext = jnp.zeros((S + 2 * G, ncol), dt)
    pe = jnp.zeros((), dt) if eflag else None
    vir = jnp.zeros(6, dt) if vflag else None

    maps = _lane_maps(p)

    def pair_block(cx, cy, cz, W, selfmask):
        """One offset class: candidates [npc, W, ncol]."""
        nonlocal pe, vir
        dx = own_x - cx[:, None]
        dy = own_y - cy[:, None]
        dz = own_z - cz[:, None]
        r2 = dx * dx + dy * dy + dz * dz
        ok = r2 < cutsq
        if selfmask is not None:
            ok = jnp.logical_and(ok, selfmask)
        r2s = jnp.where(ok, r2, 1.0)
        ti = jnp.ones((), jnp.int32)
        fpair, evdwl = style.pair_terms(r2s, ti, ti, eflag)
        fpair = jnp.where(ok, fpair, 0.0)
        fx = dx * fpair
        fy = dy * fpair
        fz = dz * fpair
        if eflag:
            pe = pe + jnp.sum(jnp.where(ok, evdwl, 0.0))
        if vflag:
            vir = vir + jnp.stack([
                jnp.sum(dx * fx), jnp.sum(dy * fy), jnp.sum(dz * fz),
                jnp.sum(dx * fy), jnp.sum(dx * fz), jnp.sum(dy * fz)])
        return ((jnp.sum(fx, axis=2), jnp.sum(fy, axis=2),
                 jnp.sum(fz, axis=2)),
                (jnp.sum(fx, axis=1), jnp.sum(fy, axis=1),
                 jnp.sum(fz, axis=1)))

    # self-forward block: window rows [8k, 8k+WS), mask cand_slot>own_slot
    lane = np.arange(p.WS)[None, :]
    sub = np.arange(8)[:, None]
    smask = jnp.asarray((lane > sub)[None, :, :, None])  # [1, 8, WS, 1]
    cx = _window_view(ex, p, 0, p.WS)
    cy = _window_view(ey, p, 0, p.WS)
    cz = _window_view(ez, p, 0, p.WS)
    f3, r3 = pair_block(cx, cy, cz, p.WS, smask)
    for i in range(3):
        fwd[i] = fwd[i] + f3[i]
    rev_self = [_fold_windows(r, p, 0, p.WS) for r in r3]
    rev_by_lane = rev_self  # self block: lanes are true columns already

    # 4 cross-column blocks
    rev_cross = [jnp.zeros_like(rev_ext) for _ in range(3)]
    for key in _HALF_COLS:
        src, sx, sy = maps[key]
        rx, ry, rz = _rolled(ex, ey, ez, jnp.asarray(src),
                             jnp.asarray(sx, dt), jnp.asarray(sy, dt), prd)
        cx = _window_view(rx, p, p.OFF, p.WN)
        cy = _window_view(ry, p, p.OFF, p.WN)
        cz = _window_view(rz, p, p.OFF, p.WN)
        f3, r3 = pair_block(cx, cy, cz, p.WN, None)
        for i in range(3):
            fwd[i] = fwd[i] + f3[i]
        for i in range(3):
            folded = _fold_windows(r3[i], p, p.OFF, p.WN)
            rev_cross[i] = rev_cross[i] + _unroll_lanes(folded,
                                                        np.asarray(src))

    # reactions: -(sum over own) into candidate rows; fold z ghosts back
    f_comp = []
    for i in range(3):
        rl = rev_by_lane[i] + rev_cross[i]
        interior = rl[G:G + S]
        interior = interior.at[S - G:].add(rl[:G])      # head ghosts
        interior = interior.at[:G].add(rl[G + S:])      # tail ghosts
        f_comp.append(fwd[i].reshape(S, ncol) - interior)
    f = jnp.stack([c.reshape(cap) for c in f_comp], axis=-1)
    return f, pe, vir


# -- rebuild policy ------------------------------------------------------


def tick(cl: ZwinCells) -> ZwinCells:
    return dataclasses.replace(cl, ago=cl.ago + 1)


def needs_rebuild(state: State, cl: ZwinCells) -> Array:
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


def _coverage_ok(state: State, p: ZwinParams):
    """In-graph validity of the static windows + quantile partition on the
    freshly built layout. Any violation -> True overflow (host grows)."""
    S, G, ncol, npc = p.S, p.G, p.ncol, p.npc
    nx, ny = p.nx, p.ny
    dt = state.dtype
    rc = jnp.asarray(p.cutneigh, dt)
    valid = state.valid_mask.reshape(S, ncol)
    X = state.x[:, 0].reshape(S, ncol)
    Y = state.x[:, 1].reshape(S, ncol)
    Z = state.x[:, 2].reshape(S, ncol)
    big = jnp.asarray(1e30, dt)

    bad = jnp.zeros((), bool)
    del X, Y  # geometric columns: xy adjacency is static by construction

    # (a') ghost-band coverage: every atom within rc of a z wrap boundary
    #     must be inside the copied ghost rows ([0:G) for the tail copy,
    #     [S-G:S) for the head copy) — otherwise its wrap image is
    #     invisible to the ext grids and the (b) check below can't see it
    lo_z = jnp.min(jnp.where(valid, Z, big))
    hi_z = jnp.max(jnp.where(valid, Z, -big))
    # use the actual wrapped extent as the boundary proxy (box-origin
    # agnostic; positions are wrapped at rebuild)
    rowz = jnp.arange(S)[:, None]
    bad = bad | jnp.any(valid & (rowz >= G) & (Z < lo_z + rc))
    bad = bad | jnp.any(valid & (rowz < S - G) & (Z > hi_z - rc))

    # (b) window coverage: every candidate in z-reach must fall inside the
    #     static slot windows
    ex, ey, ez = _ext_grids(state, p)
    vext = jnp.concatenate([valid[S - G:], valid, valid[:G]], axis=0)
    zch = Z.reshape(npc, 8, ncol)
    vch = valid.reshape(npc, 8, ncol)
    zlo = jnp.min(jnp.where(vch, zch, big), axis=1)     # [npc, ncol]
    zhi = jnp.max(jnp.where(vch, zch, -big), axis=1)
    lo_t = (zlo - rc)[:, None, :]                        # [npc, 1, ncol]
    hi_t = (zhi + rc)[:, None, :]
    SE = S + 2 * G
    rowix = jnp.arange(SE)[None, :, None]
    k8 = (jnp.arange(npc) * 8)[:, None, None]

    maps = _lane_maps(p)
    for key in _HALF_COLS:
        src, _, _ = maps[key]
        zr = jnp.take(ez, jnp.asarray(src), axis=1)[None]  # [1, SE, ncol]
        vr = jnp.take(vext, jnp.asarray(src), axis=1)[None]
        needed = vr & (zr >= lo_t) & (zr <= hi_t)
        inwin = ((rowix >= G + k8 - p.OFF)
                 & (rowix < G + k8 - p.OFF + p.WN))
        bad = bad | jnp.any(needed & ~inwin)
    # self-forward: rows >= chunk start with z <= zhi + rc must be inside
    zs = ez[None]
    vs = vext[None]
    needed = vs & (rowix >= G + k8) & (zs <= hi_t)
    inwin = (rowix >= G + k8) & (rowix < G + k8 + p.WS)
    bad = bad | jnp.any(needed & ~inwin)
    return ~bad


def rebuild_state(state: State, old: ZwinCells, special=None):
    """In-step rebuild: full quantile re-partition + permute + validity
    checks (sorts are ~0.1 ms on 55k rows — negligible at rebuild
    cadence)."""
    p = old.params
    dest, slot_over = _partition_dest(state, p)
    state = _apply_dest(state, dest, p)
    cover_ok = _coverage_ok(state, p)
    overflow = old.overflow | slot_over | (~cover_ok)
    return state, ZwinCells(
        xhold=state.x,
        ago=jnp.asarray(0, jnp.int32),
        nbuilds=old.nbuilds + 1,
        ndanger=old.ndanger,
        overflow=overflow,
        params=p,
    )


# -- host-side sizing + initial build -----------------------------------


def expand_state(state: State, p: ZwinParams) -> State:
    """Host-side: compact valid rows and re-pad to the zwin capacity."""
    cap2 = p.capacity
    cap = state.capacity
    valid = np.asarray(jax.device_get(state.valid_mask))
    rows = np.flatnonzero(valid)
    if len(rows) > cap2:
        raise ValueError(f"zwin capacity {cap2} < {len(rows)} atoms")

    def repack(a, fill=0):
        if a is None or a.ndim == 0:
            return a
        if a.shape[0] != cap:
            return a
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
        owned_all=True,
    )


def build(state: State, p: ZwinParams):
    """Initial build on an expanded state (jit-compatible)."""
    x, image = state.box.wrap(state.x, state.image)
    state = state.replace(x=x, image=image)
    dest, slot_over = _partition_dest(state, p)
    state = _apply_dest(state, dest, p)
    cover_ok = _coverage_ok(state, p)
    return state, ZwinCells(
        xhold=state.x,
        ago=jnp.asarray(0, jnp.int32),
        nbuilds=jnp.asarray(1, jnp.int32),
        ndanger=jnp.asarray(0, jnp.int32),
        overflow=slot_over | (~cover_ok),
        params=p,
    )


def size_for_system(state: State, cutneigh: float, skin: float,
                    every=1, delay=0, check=True) -> ZwinParams | None:
    """Measure the initial configuration and pick static sizes (+margins;
    the overflow-grow loop is the backstop). None when the box is too
    small for >= 3 columns per dim."""
    heights = np.asarray(nbr.box_heights(state.box))
    nx = int(heights[0] / cutneigh)
    ny = int(heights[1] / cutneigh)
    # z needs room for the ghost construction (no double wrap images)
    if nx < 3 or ny < 3 or heights[2] < 3.0 * cutneigh:
        return None
    x = np.asarray(jax.device_get(state.x))
    valid = np.asarray(jax.device_get(state.valid_mask))
    pts = x[valid]
    n = len(pts)
    ncol = nx * ny

    # geometric xy columns (fractional coords, like _partition_dest)
    lam_all = np.asarray(jax.device_get(state.box.to_lamda(state.x)))
    lam = lam_all[valid]
    frac = lam - np.floor(lam)
    frac = np.clip(frac, 0.0, 1.0 - 1e-7)
    gx = np.minimum((frac[:, 0] * nx).astype(np.int64), nx - 1)
    gy = np.minimum((frac[:, 1] * ny).astype(np.int64), ny - 1)
    col = gx * ny + gy
    occ = np.bincount(col, minlength=ncol)
    # slot capacity: observed max + equilibrium density-fluctuation slack
    avg = n / ncol
    S = int(-(-max(occ.max() + 4, avg + 2.4 * avg ** 0.5 + 2) // 8) * 8)

    order3 = np.lexsort((pts[:, 2], col))
    rank3 = np.empty(n, np.int64)
    rank3[order3] = np.arange(n)
    cs = np.zeros(ncol + 1, np.int64)
    np.add.at(cs, col + 1, 1)
    cstart = np.cumsum(cs)
    zcount = np.diff(cstart)
    if zcount.max() > S:
        S = int(-(-(zcount.max() + 4) // 8) * 8)

    # per-column STRETCHED slot -> z maps, +inf at pad slots (mirrors
    # _partition_dest: slot = rank * S // count)
    slot = (rank3 - cstart[col]) * S // np.maximum(zcount[col], 1)
    zs = np.full((ncol, S), np.inf)
    zs[col, slot] = pts[:, 2]
    Lz = heights[2]

    # window needs per chunk against neighbor columns, measured with
    # FULL-column ghost copies so no candidate is truncated (vectorized:
    # [ncol, npc, 3S] masks)
    npc = S // 8
    smap = _lane_maps(ZwinParams(nx, ny, S, 8, 8, 8, 8, cutneigh, skin))
    G0 = S
    ext = np.concatenate([zs - Lz, zs, zs + Lz], axis=1)  # [ncol, 3S]
    zch = zs.reshape(ncol, npc, 8)
    with np.errstate(invalid="ignore"):
        zlo = np.min(np.where(np.isfinite(zch), zch, np.inf), axis=2)
        zhi = np.max(np.where(np.isfinite(zch), zch, -np.inf), axis=2)
    rowix = np.arange(3 * S)[None, None, :]
    k8all = (np.arange(npc) * 8)[None, :, None]
    KB = 8  # chunk-block the [ncol, npc, 3S] masks to bound host memory

    def needs(zn, lo, hi, fwd_only=False):
        """max fwd / back row extents of candidates in [lo, hi] relative
        to the chunk start row (ext coords)."""
        fwd = back = -(10 ** 9)
        for k0 in range(0, npc, KB):
            ks = slice(k0, min(k0 + KB, npc))
            rel = rowix - (G0 + k8all[:, ks])
            m = (zn[:, None, :] >= lo[:, ks, None]) & \
                (zn[:, None, :] <= hi[:, ks, None])
            if fwd_only:
                m = m & (rel >= 0)
            fwd = max(fwd, int(np.where(m, rel, -(10 ** 9)).max()))
            back = max(back, int(np.where(m, -rel, -(10 ** 9)).max()))
        return fwd, back

    ws_need = needs(ext, zlo - 1e-9, zhi + cutneigh, fwd_only=True)[0] + 1
    fwd_need, back_need = 0, 0
    for key in _HALF_COLS:
        src = smap[key][0]
        f, b = needs(ext[src], zlo - cutneigh, zhi + cutneigh)
        fwd_need = max(fwd_need, f + 1)
        back_need = max(back_need, b)
    WS = int(-(-(max(ws_need, 8) + 8) // 8) * 8)
    OFF = int(-(-(max(back_need, 0) + 8) // 8) * 8)
    WN = OFF + int(-(-(max(fwd_need, 8) + 8) // 8) * 8)
    # ghost rows: window reach + the boundary band each copy must cover
    # (slot extent of atoms within rc of a z boundary)
    fin = np.isfinite(zs)
    lo_z = pts[:, 2].min()
    hi_z = pts[:, 2].max()
    srange = np.arange(S)[None, :]
    band_bot = int(np.where(fin & (zs < lo_z + cutneigh), srange,
                            -1).max()) + 1
    band_top = S - int(np.where(fin & (zs > hi_z - cutneigh), srange,
                                S + 10 ** 9).min())
    band_top = max(band_top, 0)
    G = int(max(OFF, WN - OFF - 8, WS - 8,
                min(max(band_bot, band_top) + 8, S), 8))
    G = int(-(-G // 8) * 8)
    if G > S:
        return None  # degenerate: windows wider than a full column
    return ZwinParams(nx=nx, ny=ny, S=S, G=G, WS=WS, WN=WN, OFF=OFF,
                      cutneigh=float(cutneigh), skin=float(skin),
                      every=every, delay=delay, check=check)


def grow(p: ZwinParams, state: State | None = None) -> ZwinParams:
    """Host response to a sticky overflow: re-measure the CURRENT
    configuration (the snapshot the segment will be retried from) and
    take the elementwise max with the old params + one growth step, so
    retries make monotonic progress even when the re-measure is noisy.
    S never grows — quantile-column counts are balanced by construction."""
    fresh = None
    if state is not None:
        fresh = size_for_system(state, p.cutneigh, p.skin, every=p.every,
                                delay=p.delay, check=p.check)
        if fresh is not None and (fresh.nx != p.nx or fresh.ny != p.ny):
            fresh = None  # geometry changed (box resize) — plain growth
    S = max(p.S + (0 if fresh else 8), fresh.S if fresh else 0)
    WS = max(p.WS + 8, fresh.WS if fresh else 0)
    WN = max(p.WN + 16, fresh.WN if fresh else 0)
    OFF = max(p.OFF + 8, fresh.OFF if fresh else 0)
    G = max(p.G + 8, fresh.G if fresh else 0, OFF, WN - OFF - 8, WS - 8)
    G = int(-(-G // 8) * 8)
    if G > S:
        G = S  # ghost copies are at most one full column
    return dataclasses.replace(p, S=S, WS=WS, WN=WN, OFF=OFF, G=G)
