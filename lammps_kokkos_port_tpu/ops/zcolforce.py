"""z-sorted-column (zcol) state mode: compacted columns, windowed pairs.

The sorted cell-major mode (ops/sortedforce) pays ~14*cell_cap candidate
lanes per atom because candidates are quantized to whole cells with slot
padding. This mode removes the cell quantization in z entirely:

  - the xy plane is cut into nx*ny columns of width >= cutneigh;
  - each column owns a fixed slab of `colcap` state rows; its atoms sit in
    rows [0, fill) sorted by z, rows [fill, colcap) are padding with
    coordinates BIG (outside every cutoff);
  - a 32-row own chunk's neighbor candidates are FIVE contiguous row
    windows (self column upward, 4 half-stencil neighbor columns), whose
    start rows are counted once per rebuild from the sorted z values —
    the TPU analog of a tight per-atom half list
    (ref: src/npair_half_bin_newton.cpp) with zero per-pair gathers;
  - the Pallas kernel (ops/pallas_zcol) extracts windows with dynamic
    lane rolls and accumulates Newton reactions into a ghost-extended
    per-column buffer folded back here.

Used automatically for bare scalarizable pair styles on fully periodic
orthogonal boxes with enough columns (runner._pick_list_mode); smaller or
constrained systems take the sorted/grid/matrix paths.
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

BIG = 1.0e8
# own-id sentinel for padding rows: must exceed EVERY candidate id code
# (real ids + 2*idcap biases, and the BIG junk-lane fill the kernel uses),
# so pad-own vs pad-candidate pairs (r2 = 0 -> inf) can never validate.
# 2^30 is f32-exact.
PAD_ID = float(2 ** 30)


@dataclasses.dataclass(frozen=True)
class ZColParams:
    """Static zcol configuration (compile-time constants).

    `grid` is a twin cell-grid NeighborParams used for the energy/virial
    evaluations at output steps (the eflag path re-bins through
    ops/gridforce; the hot loop never touches it)."""

    cutneigh: float
    skin: float
    every: int
    delay: int
    check: bool
    nx: int
    ny: int
    colcap: int
    chunk: int
    w_self: int
    w_cross: int
    gh: int
    grid: nbr.NeighborParams

    @property
    def ncol(self) -> int:
        return self.nx * self.ny

    @property
    def nchunk(self) -> int:
        return self.colcap // self.chunk

    @property
    def G(self) -> int:
        # holds the ghost-extended rows AND the widest pair-block lane
        # layout (the kernel places the 5 windows at disjoint offsets
        # within [0, G))
        raw = max(self.colcap + 2 * self.gh,
                  self.w_self + 4 * self.w_cross)
        return ((raw + 127) // 128) * 128

    @property
    def capacity(self) -> int:
        return self.ncol * self.colcap


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["starts", "bot_idx", "fills", "xhold", "ago", "nbuilds",
                 "ndanger", "overflow"],
    meta_fields=["params"],
)
@dataclasses.dataclass(frozen=True)
class ZColCells:
    """Rebuild bookkeeping + per-rebuild window table."""

    starts: Array   # [ncol, nchunk*5] int32 window starts, slot 0 self
                    # (compacted row coords)
    bot_idx: Array  # [ncol, gh] int32 bottom-ghost source rows (-1 invalid)
    fills: Array    # [ncol] int32 valid atoms per column
    xhold: Array
    ago: Array
    nbuilds: Array
    ndanger: Array
    overflow: Array
    params: ZColParams

    @property
    def sb(self):
        return None

    @property
    def shift(self):
        return None


def size_for_system(state: State, cutneigh: float, skin: float,
                    every: int, delay: int, check: bool,
                    grid: nbr.NeighborParams) -> ZColParams | None:
    """Host: size the zcol layout, or None when the system doesn't fit the
    mode (too few columns, short z, or too few atoms per column)."""
    box = jax.device_get(state.box)
    prd = np.asarray(box.prd, dtype=np.float64)
    nx = int(prd[0] // cutneigh)
    ny = int(prd[1] // cutneigh)
    if nx < 3 or ny < 3:
        return None
    if prd[2] <= 2.0 * cutneigh:
        return None
    natoms = int(jax.device_get(state.nlocal))
    ncol = nx * ny
    avg = natoms / ncol
    if avg < 16:
        return None
    chunk = 32

    # MEASURE the layout requirements on the actual state instead of
    # assuming uniform density: lattice starts alias badly against the
    # column grid (fills varied 180..320 on the 32k melt), so formula
    # margins either overflow or waste half the pair block. The
    # overflow-grow-retry loop absorbs later density drift.
    valid = np.asarray(jax.device_get(state.valid_mask))
    x = np.asarray(jax.device_get(state.x))[valid]
    lo = np.asarray(box.lo, dtype=np.float64)
    frac = (x - lo) / prd
    frac -= np.floor(frac)
    cx = np.clip((frac[:, 0] * nx).astype(np.int64), 0, nx - 1)
    cy = np.clip((frac[:, 1] * ny).astype(np.int64), 0, ny - 1)
    cols = cx * ny + cy
    fills = np.bincount(cols, minlength=ncol)
    maxfill = int(fills.max())
    if int(fills.min()) < 1:
        return None
    colcap = _round_up(maxfill + max(8, int(maxfill * 0.06)), chunk)

    # ghost rows: atoms within cutneigh of either z face, per column
    zfrac = frac[:, 2] * prd[2]
    band = cutneigh + 0.05 * prd[2]
    nearlo = np.bincount(cols[zfrac < band], minlength=ncol).max()
    nearhi = np.bincount(cols[zfrac > prd[2] - band],
                         minlength=ncol).max()
    gh = _round_up(int(max(nearlo, nearhi) + 6), 8)
    if maxfill < gh:
        return None

    p0 = ZColParams(
        cutneigh=cutneigh, skin=skin, every=every, delay=delay, check=check,
        nx=nx, ny=ny, colcap=colcap, chunk=chunk,
        w_self=8, w_cross=8, gh=gh, grid=grid,
    )
    from .sortedforce import _apply_gather_perm

    st = expand_state(state, p0)
    perm, _ = _sort_perm(st, p0)
    st, _ = _apply_gather_perm(st, perm, jnp.zeros((), bool))
    _, _, _, need_self, need_cross = _windows(st, p0)
    ns = int(jax.device_get(need_self))
    ncr = int(jax.device_get(need_cross))
    w_self = _round_up(ns + max(6, int(ns * 0.08)), 8)
    w_cross = _round_up(ncr + max(6, int(ncr * 0.08)), 8)
    return dataclasses.replace(p0, w_self=w_self, w_cross=w_cross)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def grow(p: ZColParams) -> ZColParams:
    """Overflow recovery: widen everything that can overflow (the Kokkos
    grow-and-rerun idiom, ref: src/KOKKOS/npair_kokkos.cpp:225-330)."""
    return dataclasses.replace(
        p,
        colcap=_round_up(int(p.colcap * 1.25) + 1, p.chunk),
        w_self=_round_up(int(p.w_self * 1.25) + 1, 8),
        w_cross=_round_up(int(p.w_cross * 1.25) + 1, 8),
        gh=_round_up(int(p.gh * 1.25) + 1, 8),
    )


def expand_state(state: State, p: ZColParams) -> State:
    """Host-side: compact valid rows and re-pad to capacity ncol*colcap
    (any incoming layout; the device `build` then sorts into columns)."""
    cap2 = p.capacity
    cap = state.capacity
    valid = np.asarray(jax.device_get(state.valid_mask))
    rows = np.flatnonzero(valid)
    if len(rows) > cap2:
        raise ValueError(f"zcol capacity {cap2} cannot hold {len(rows)} atoms")

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
        owned_all=True,
    )


def _column_of(state: State, p: ZColParams):
    """[cap] int32 destination column from wrapped positions."""
    lamda = state.box.to_lamda(state.x)
    frac = lamda - jnp.floor(lamda)
    frac = jnp.clip(frac, 0.0, 1.0 - 1e-7)
    cx = jnp.clip((frac[:, 0] * p.nx).astype(jnp.int32), 0, p.nx - 1)
    cy = jnp.clip((frac[:, 1] * p.ny).astype(jnp.int32), 0, p.ny - 1)
    return cx * p.ny + cy


def _sort_perm(state: State, p: ZColParams):
    """Jit: permutation into (column, z)-sorted compacted layout.

    Key = (col << ZBITS) | quantized z packed in int32; window counting
    later uses raw z with a slack larger than the quantization, so tie
    mis-ordering cannot lose candidates. Returns (perm [cap] source rows
    with >=cap padding, col_overflow)."""
    cap = state.capacity
    col = _column_of(state, p)
    lamda = state.box.to_lamda(state.x)
    fz = jnp.clip(lamda[:, 2] - jnp.floor(lamda[:, 2]), 0.0, 1.0 - 1e-7)
    ZBITS = 20
    zq = (fz * (1 << ZBITS)).astype(jnp.int32)
    valid = state.valid_mask
    # invalid rows sort to the very end (beyond every column)
    key = jnp.where(valid, col * (1 << ZBITS) + zq, jnp.int32(2 ** 31 - 1))
    order = jnp.argsort(key)  # [cap] source rows, (col, z)-sorted compact

    # scatter each sorted run into its column slab
    scol = jnp.where(valid[order], col[order], p.ncol)
    pos = jnp.arange(cap, dtype=jnp.int32)
    # rank within column = position - first position of the column
    first = jnp.zeros(p.ncol + 1, dtype=jnp.int32)
    first = first.at[scol + 1].add(1)
    counts = first[1:p.ncol + 1]
    starts = jnp.cumsum(first)[:p.ncol]
    rank = pos - starts[jnp.minimum(scol, p.ncol - 1)]
    overflow = jnp.max(counts) > p.colcap
    newpos = jnp.where(scol < p.ncol,
                       scol * p.colcap + jnp.minimum(rank, p.colcap - 1),
                       cap)
    perm = jnp.full((cap,), cap, dtype=jnp.int32)
    perm = perm.at[newpos].set(order, mode="drop")
    return perm, overflow


def _windows(state: State, p: ZColParams):
    """Jit: per-chunk candidate window starts + ghost indices + width
    overflow, from the freshly sorted layout."""
    cap = state.capacity
    ncol, colcap, gh = p.ncol, p.colcap, p.gh
    Lz = state.box.prd[2].astype(state.dtype)
    valid = state.valid_mask.reshape(ncol, colcap)
    z = jnp.where(valid, state.x[:, 2].reshape(ncol, colcap),
                  jnp.asarray(BIG, state.dtype))
    fills = jnp.sum(valid, axis=1, dtype=jnp.int32)

    bi = fills[:, None] - gh + jnp.arange(gh, dtype=jnp.int32)[None, :]
    bot_idx = jnp.where(bi >= 0, bi, -1)

    # chunk z bounds (pad chunks: lo=BIG -> empty windows; hi=-BIG)
    zc = z.reshape(ncol, p.nchunk, p.chunk)
    zlo = zc[:, :, 0]
    zhi = jnp.max(jnp.where(zc < BIG / 2, zc, -BIG), axis=2)

    slack = 4.0 * Lz / (1 << 20) + 1e-6  # z-quantization tie slack
    blo = zlo - p.cutneigh - slack       # [ncol, nchunk]
    bhi = zhi + p.cutneigh + slack

    z3 = z.reshape(p.nx, p.ny, colcap)
    bot3 = bot_idx.reshape(p.nx, p.ny, gh)

    # self-column width: rows from chunk start to bhi (+ top copies)
    cnt_real_self = jnp.sum(
        z[:, None, :] < bhi[:, :, None], axis=2, dtype=jnp.int32)
    ztop_self = z[:, :gh] + Lz
    cnt_top_self = jnp.sum(
        ztop_self[:, None, :] < bhi[:, :, None], axis=2, dtype=jnp.int32)
    t_idx = jnp.arange(p.nchunk, dtype=jnp.int32)[None, :]
    width_self = cnt_real_self + cnt_top_self - t_idx * p.chunk
    live = zlo < BIG / 2
    need_self = jnp.max(jnp.where(live, width_self, 0))
    need_cross = jnp.zeros((), jnp.int32)

    starts = []
    from .pallas_zcol import _XYHALF

    for dx, dy in _XYHALF:
        zn = jnp.roll(z3, (-dx, -dy), axis=(0, 1)).reshape(ncol, colcap)
        bn = jnp.roll(bot3, (-dx, -dy), axis=(0, 1)).reshape(ncol, gh)
        # invalid slots (fill < gh) occupy the START of the bot region, so
        # they must sort below every bound: -BIG keeps position == count
        zbot = jnp.where(
            bn >= 0,
            jnp.take_along_axis(zn, jnp.maximum(bn, 0), axis=1) - Lz,
            jnp.asarray(-BIG, state.dtype))
        ztop = zn[:, :gh] + Lz

        def cnt(bound):
            cr = jnp.sum(zn[:, None, :] < bound[:, :, None], axis=2,
                         dtype=jnp.int32)
            cb = jnp.sum(zbot[:, None, :] < bound[:, :, None], axis=2,
                         dtype=jnp.int32)
            ct = jnp.sum(ztop[:, None, :] < bound[:, :, None], axis=2,
                         dtype=jnp.int32)
            return cb, cr, ct

        cb0, cr0, ct0 = cnt(blo)
        start = cb0 + cr0 + ct0
        cb1, cr1, ct1 = cnt(bhi)
        width = (cb1 + cr1 + ct1) - start
        need_cross = jnp.maximum(
            need_cross, jnp.max(jnp.where(live, width, 0)))
        starts.append(start)

    # slot 0 = the self window start gh + t*chunk (constant, but routed
    # through the table so every kernel roll takes the well-supported
    # dynamic-shift path — static negative roll amounts crash Mosaic)
    self_start = (p.gh + t_idx * p.chunk)[:, :, None] + jnp.zeros(
        (ncol, 1, 1), jnp.int32)
    starts = jnp.concatenate([self_start] + [s[:, :, None] for s in starts],
                             axis=-1)  # [ncol, nchunk, 5]
    # flattened for SMEM (its last dim pads to 128 ints — keep it large)
    starts = starts.reshape(ncol, p.nchunk * 5)
    return starts, bot_idx, fills, need_self, need_cross


def build(state: State, p: ZColParams):
    """Jit: sort the (already capacity-matched) state into the zcol layout
    and compute windows. Returns (state, ZColCells)."""
    from .sortedforce import _apply_gather_perm

    perm, col_overflow = _sort_perm(state, p)
    state, _ = _apply_gather_perm(state, perm, col_overflow)
    starts, bot_idx, fills, need_self, need_cross = _windows(state, p)
    w_overflow = (need_self > p.w_self) | (need_cross > p.w_cross)
    return state, ZColCells(
        starts=starts, bot_idx=bot_idx, fills=fills,
        xhold=state.x,
        ago=jnp.asarray(0, jnp.int32),
        nbuilds=jnp.asarray(1, jnp.int32),
        ndanger=jnp.asarray(0, jnp.int32),
        overflow=col_overflow | w_overflow,
        params=p,
    )


def rebuild_state(state: State, old: ZColCells, special=None):
    """In-step rebuild (same full-sort path; positions were PBC-wrapped by
    the caller)."""
    p = old.params
    state, nl = build(state, p)
    return state, dataclasses.replace(
        nl,
        nbuilds=old.nbuilds + 1,
        ndanger=old.ndanger,
        overflow=old.overflow | nl.overflow,
    )


def tick(cl: ZColCells) -> ZColCells:
    return dataclasses.replace(cl, ago=cl.ago + 1)


def needs_rebuild(state: State, cl: ZColCells) -> Array:
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


def _ext_arrays(state: State, cl: ZColCells):
    """Ghost-extended per-column candidate arrays for the kernel.

    ext [ncol, 4, G]: rows = [gh bottom ghosts | colcap real | gh top
    ghosts | BIG pad to G]; channels = (x, y, z, id). Ids are the global
    row index (f32-exact while 3*cap < 2^24); padding rows get PAD_ID so
    the Newton compare kills them as own atoms, and coordinates BIG so the
    cutoff kills them as candidates. Top ghosts are id-biased +cap (a
    z-wrap pair is visited only from the lower side; see pallas_zcol)."""
    p = cl.params
    cap = state.capacity
    ncol, colcap, gh, G = p.ncol, p.colcap, p.gh, p.G
    dt = state.dtype
    valid = state.valid_mask
    Lz = state.box.prd[2].astype(dt)

    ids = jnp.where(valid, jnp.arange(cap, dtype=jnp.int32).astype(dt),
                    jnp.asarray(PAD_ID, dt))
    big = jnp.asarray(BIG, dt)
    xs = jnp.where(valid[:, None], state.x, big)

    # per-channel assembly (no transposes — minor-dim transposes are slow
    # on TPU): channel -> [ncol, G] -> stack to [ncol, 4, G]
    bi = cl.bot_idx  # [ncol, gh]
    bsafe = jnp.maximum(bi, 0)
    pad = G - (colcap + 2 * gh)
    chans = []
    for a in range(4):
        real = (xs[:, a] if a < 3 else ids).reshape(ncol, colcap)
        topshift = Lz if a == 2 else (
            jnp.asarray(float(cap), dt) if a == 3 else jnp.zeros((), dt))
        top = real[:, :gh] + topshift
        botshift = Lz if a == 2 else jnp.zeros((), dt)
        bot = jnp.where(bi >= 0,
                        jnp.take_along_axis(real, bsafe, axis=1) - botshift,
                        -big)
        parts = [bot, real, top]
        if pad:
            parts.append(jnp.full((ncol, pad), BIG, dt))
        chans.append(jnp.concatenate(parts, axis=1))
    ext = jnp.stack(chans, axis=1)  # [ncol, 4, G]
    # own-row view in the state's natural layout (real rows only — the
    # kernel never reads ghosts as own atoms); again transpose-free
    extT = jnp.concatenate([xs, ids[:, None]], axis=1).reshape(
        ncol, colcap, 4)
    return ext, extT


def compute(style, state: State, cl: ZColCells, eflag: bool, vflag: bool):
    """(f, pe, virial) in the zcol layout."""
    p = cl.params
    cap = state.capacity

    if not eflag and not vflag:
        kk = getattr(style, "kernel_key", None)
        key = kk() if kk is not None else None
        if key is not None:
            from . import pallas_zcol

            ext, extT = _ext_arrays(state, cl)
            prd = state.box.prd.astype(state.dtype)
            fT, racc = pallas_zcol.zcol_half_force_pallas(
                key, p.nx, p.ny, p.colcap, p.chunk, p.w_self, p.w_cross,
                p.gh, cap, ext, extT, cl.starts, cl.fills, prd)
            # reaction fold (compacted row coords), per channel to avoid a
            # minor-dim transpose of racc: real rows map 1:1; top-copy
            # rows [gh+fill, gh+fill+gh) fold onto rows [0, gh) (the
            # double-add onto displaced pad rows is inert — padding never
            # integrates); bottom ghosts fold via bot_idx
            tail_idx = jnp.minimum(
                cl.fills[:, None]
                + jnp.arange(p.gh, dtype=jnp.int32)[None, :]
                + p.gh, p.G - 1)  # [ncol, gh] compacted coords
            rows = jnp.arange(p.ncol, dtype=jnp.int32)[:, None]
            bi = jnp.where(cl.bot_idx >= 0, cl.bot_idx, p.colcap)
            chans = []
            for a in range(3):
                r = racc[:, a, :]  # [ncol, G]
                rr = r[:, p.gh:p.gh + p.colcap]
                rr = rr.at[:, :p.gh].add(
                    jnp.take_along_axis(r, tail_idx, axis=1))
                rr = rr.at[rows, bi].add(r[:, :p.gh], mode="drop")
                chans.append(rr)
            f = (fT + jnp.stack(chans, axis=2)).reshape(cap, 3)
            return f, None, None

    # energy/virial evaluations (output steps): re-bin through the grid
    # engine — never on the hot path
    from . import gridforce

    gc = gridforce.build_cell(state, p.grid)
    return gridforce.compute(style, state, gc, eflag, vflag)
