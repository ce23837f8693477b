"""KSpace style pppm: particle-particle particle-mesh electrostatics.

TPU-native re-design of the reference's PPPM
(ref: src/KSPACE/pppm.cpp — particle_map/make_rho charge spreading with
order-p B-splines :1802,1849, Poisson solve via 3D FFTs :1930, field
interpolation :2343; Kokkos twin src/KOKKOS/pppm_kokkos.cpp). Differences
by design:

  - Forces are the EXACT gradient of the mesh energy (jax.grad through
    spreading -> FFT -> influence function), i.e. the reference's
    energy-conserving `ad` differentiation mode (ref: pppm.cpp poisson_ad)
    rather than the ik mode — one forward FFT, no per-component inverse
    FFTs, and zero force-sign bugs by construction.
  - Charge spreading is a dense scatter-add over the [N, p^3] stencil
    (sort-free); XLA lowers it to a single scatter kernel. The grid halo
    exchanges of the reference (Grid3d forward/reverse comm) do not exist
    on a single chip and become sharded-FFT collectives multi-chip.
  - The influence function is the Hockney-Eastwood optimal G(k) with
    B-spline aliasing sums, precomputed on the host per (box, grid, order)
    (ref: pppm.cpp compute_gf_ik/gf_denom).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import State
from ..utils.units import get_units

Array = jax.Array


def _bspline(u, p: int):
    """Centered cardinal B-spline of order p (support |u| < p/2); traced,
    differentiable (C^{p-2})."""
    if p == 1:
        return jnp.where(jnp.abs(u) < 0.5, 1.0, 0.0)
    wm = _bspline(u + 0.5, p - 1)
    wp = _bspline(u - 0.5, p - 1)
    return ((p / 2.0 + u) * wm + (p / 2.0 - u) * wp) / (p - 1)


def _what_sq(karr: np.ndarray, h: float, p: int) -> np.ndarray:
    """|W_hat(k)|^2 for B-spline of order p with grid spacing h (numpy)."""
    x = karr * h / 2.0
    s = np.ones_like(x)
    nz = x != 0.0
    s[nz] = np.sin(x[nz]) / x[nz]
    return s ** (2 * p)


def choose_grid_size(g_ewald: float, prd: np.ndarray, accuracy_rel: float,
                     order: int = 5) -> tuple[int, int, int]:
    """Grid sizing from the splitting parameter (ref: pppm.cpp
    set_grid_global: start from spacing ~1/g_ewald, shrink until the
    k-space error model meets the target, round to FFT-friendly sizes)."""
    # heuristic matching LAMMPS-scale grids: h ~ 1/g * accuracy^(1/5)-ish
    spacing = (accuracy_rel ** 0.25) / g_ewald * 3.0
    sizes = []
    for L in prd:
        n = max(2, int(np.ceil(L / spacing)))
        # round up to 2^a * 3^b * 5^c
        while not _fft_friendly(n):
            n += 1
        sizes.append(n)
    return tuple(sizes)


def _fft_friendly(n: int) -> bool:
    for f in (2, 3, 5):
        while n % f == 0:
            n //= f
    return n == 1


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["gf", "wx2", "wy2", "wz2", "den", "fvec", "alias_idx"],
    meta_fields=["ngrid", "order", "g_ewald", "accuracy", "nalias",
                 "dynamic", "grid_sharding", "block_cap"],
)
@dataclasses.dataclass(frozen=True)
class PPPM:
    """gf: [nx, ny, nz] optimal influence function (includes 1/(2V)),
    valid for the box it was created with.

    When `dynamic` is set (a barostat is active), gf is recomputed from
    state.box inside the jitted step every force evaluation — the analog of
    FixNH calling kspace->setup() after each box remap
    (ref: src/fix_nh.cpp:874-876, src/KSPACE/pppm.cpp:297-330). The
    B-spline aliasing factors |W(k)|^2 depend only on the INTEGER mode
    index (k*h/2 = pi*(m + b*n)/n), so they are box-independent tables
    (wx2/wy2/wz2, den); only 1/|k+b|^2, the Gaussian filter, and 1/(2V)
    are box-dependent and cheap to re-derive in closed form.
    """

    gf: Array
    wx2: Array  # [2*nalias+1, nx] |W|^2 at aliased integer freqs
    wy2: Array
    wz2: Array
    den: Array  # [nx, ny, nz] aliasing denominator (box-independent)
    fvec: tuple  # (fx [nx], fy [ny], fz [nz]) integer FFT frequencies
    alias_idx: Array  # [(2a+1)^3, 3] int32 alias-table indices
    ngrid: tuple
    order: int
    g_ewald: float
    accuracy: float
    nalias: int = 2
    dynamic: bool = False
    # atoms-per-block capacity for the dense blocked spread (0 = use the
    # direct scatter path; set from natoms at create time)
    block_cap: int = 0
    # Optional jax.sharding.NamedSharding for the rho/E grids: the GSPMD
    # analog of the reference's distributed PPPM grid + FFT pencil remaps
    # (ref: src/KSPACE/remap.cpp:63 remap_3d, src/KOKKOS/grid3d_kokkos.cpp)
    # — annotate the grid layout once and XLA inserts the all-to-alls and
    # ghost-plane reductions the reference hand-codes.
    grid_sharding: object = None

    @staticmethod
    def create(box, g_ewald: float, accuracy_rel: float = 1e-4,
               grid: tuple | None = None, order: int = 5,
               nalias: int = 2, dtype=jnp.float64,
               dynamic: bool = False, natoms: int = 0) -> "PPPM":
        prd = np.asarray(jax.device_get(box.prd))
        vol = float(np.asarray(jax.device_get(box.volume)))
        if grid is None:
            grid = choose_grid_size(g_ewald, prd, accuracy_rel, order)
        nx, ny, nz = grid
        block_cap = 0
        bdx = PPPM._block_div(nx)
        bdy = PPPM._block_div(ny)
        bdz = PPPM._block_div(nz)
        if natoms and bdx and bdy and bdz and order == 5:
            frac = (bdx * bdy * bdz) / float(nx * ny * nz)
            block_cap = max(8, int(np.ceil(natoms * frac * 4.0 / 8) * 8))

        # k values per dim (signed FFT frequencies)
        kx = 2.0 * np.pi * np.fft.fftfreq(nx, d=1.0 / nx) / prd[0]
        ky = 2.0 * np.pi * np.fft.fftfreq(ny, d=1.0 / ny) / prd[1]
        kz = 2.0 * np.pi * np.fft.fftfreq(nz, d=1.0 / nz) / prd[2]
        hx, hy, hz = prd[0] / nx, prd[1] / ny, prd[2] / nz

        # aliasing sums (ref: pppm.cpp compute_gf_ik): numerator
        # sum_b W^2(k+b) 4pi/|k+b|^2 exp(-|k+b|^2/4g^2), denominator
        # (sum_b W^2(k+b))^2
        KX, KY, KZ = np.meshgrid(kx, ky, kz, indexing="ij")
        num = np.zeros_like(KX)
        den_x = np.zeros_like(kx)
        den_y = np.zeros_like(ky)
        den_z = np.zeros_like(kz)
        for b in range(-nalias, nalias + 1):
            den_x += _what_sq(kx + 2.0 * np.pi * b / hx, hx, order)
            den_y += _what_sq(ky + 2.0 * np.pi * b / hy, hy, order)
            den_z += _what_sq(kz + 2.0 * np.pi * b / hz, hz, order)
        for bx in range(-nalias, nalias + 1):
            kxa = KX + 2.0 * np.pi * bx / hx
            wx = _what_sq(kx + 2.0 * np.pi * bx / hx, hx, order)
            for by in range(-nalias, nalias + 1):
                kya = KY + 2.0 * np.pi * by / hy
                wy = _what_sq(ky + 2.0 * np.pi * by / hy, hy, order)
                for bz in range(-nalias, nalias + 1):
                    kza = KZ + 2.0 * np.pi * bz / hz
                    wz = _what_sq(kz + 2.0 * np.pi * bz / hz, hz, order)
                    k2a = kxa * kxa + kya * kya + kza * kza
                    k2a[0, 0, 0] = 1.0  # avoid 0/0; zeroed below
                    w2 = (wx[:, None, None] * wy[None, :, None]
                          * wz[None, None, :])
                    num += w2 * 4.0 * np.pi / k2a * np.exp(
                        -k2a / (4.0 * g_ewald**2)
                    )
        den = (den_x[:, None, None] * den_y[None, :, None]
               * den_z[None, None, :]) ** 2
        gf = num / den / (2.0 * vol)
        gf[0, 0, 0] = 0.0

        # box-independent alias tables for the dynamic (NPT) path:
        # |W((k+2pi b/h) h/2)|^2 = |W(pi (m + b n)/n)|^2 — pure integers
        fx = np.fft.fftfreq(nx, d=1.0 / nx)
        fy = np.fft.fftfreq(ny, d=1.0 / ny)
        fz = np.fft.fftfreq(nz, d=1.0 / nz)

        def w2_rows(f, n):
            rows = []
            for b in range(-nalias, nalias + 1):
                xarg = np.pi * (f + b * n) / n
                s = np.ones_like(xarg)
                nz_ = xarg != 0.0
                s[nz_] = np.sin(xarg[nz_]) / xarg[nz_]
                rows.append(s ** (2 * order))
            return np.stack(rows)

        aset = range(2 * nalias + 1)
        alias_idx = np.array(
            [(i, j, k) for i in aset for j in aset for k in aset],
            dtype=np.int32,
        )

        return PPPM(
            gf=jnp.asarray(gf, dtype=dtype),
            wx2=jnp.asarray(w2_rows(fx, nx), dtype=dtype),
            wy2=jnp.asarray(w2_rows(fy, ny), dtype=dtype),
            wz2=jnp.asarray(w2_rows(fz, nz), dtype=dtype),
            den=jnp.asarray(den, dtype=dtype),
            fvec=(jnp.asarray(fx, dtype=dtype), jnp.asarray(fy, dtype=dtype),
                  jnp.asarray(fz, dtype=dtype)),
            alias_idx=jnp.asarray(alias_idx),
            ngrid=(nx, ny, nz),
            order=order,
            g_ewald=float(g_ewald),
            accuracy=float(accuracy_rel),
            nalias=nalias,
            dynamic=dynamic,
            block_cap=block_cap,
        )

    def influence(self, box) -> Array:
        """Traced optimal influence function G(k) for the CURRENT box
        (incl. 1/(2V)) — the jit-compatible twin of the create()-time
        numpy computation (ref: pppm.cpp compute_gf_ik + setup())."""
        nx, ny, nz = self.ngrid
        fx, fy, fz = self.fvec
        na = self.nalias
        prd = box.prd
        two_pi = 2.0 * jnp.pi
        g2inv4 = 1.0 / (4.0 * self.g_ewald * self.g_ewald)

        def body(num, ab):
            bi, bj, bk = ab[0], ab[1], ab[2]
            kxa = (fx + (bi - na).astype(fx.dtype) * nx) * (two_pi / prd[0])
            kya = (fy + (bj - na).astype(fy.dtype) * ny) * (two_pi / prd[1])
            kza = (fz + (bk - na).astype(fz.dtype) * nz) * (two_pi / prd[2])
            k2 = ((kxa * kxa)[:, None, None]
                  + (kya * kya)[None, :, None]
                  + (kza * kza)[None, None, :])
            k2s = jnp.where(k2 == 0.0, 1.0, k2)
            w2 = (self.wx2[bi][:, None, None]
                  * self.wy2[bj][None, :, None]
                  * self.wz2[bk][None, None, :])
            term = w2 * (4.0 * jnp.pi / k2s) * jnp.exp(-k2s * g2inv4)
            return num + jnp.where(k2 == 0.0, 0.0, term), None

        num0 = jnp.zeros((nx, ny, nz), dtype=self.gf.dtype)
        num, _ = jax.lax.scan(body, num0, self.alias_idx)
        gf = num / self.den / (2.0 * box.volume)
        return gf.at[0, 0, 0].set(0.0)

    def _gf(self, state: State) -> Array:
        return self.influence(state.box) if self.dynamic else self.gf

    # -- charge spreading ----------------------------------------------------

    @staticmethod
    def _block_div(n: int) -> int | None:
        """Divisor of n in [5, 16] nearest 8 (block edge for the dense
        spread: small enough tiles, enough blocks for parallelism); None
        disables the blocked path."""
        cands = [b for b in range(5, min(16, n) + 1) if n % b == 0]
        if not cands:
            return None
        return min(cands, key=lambda b: abs(b - 8))

    def _spread_blocked(self, x: Array, state: State) -> Array:
        """Scatter-free charge assignment: bin atoms into bxbxb grid-point
        blocks (one sort), evaluate the order-p spline DENSELY over each
        block's (b+5)^3 halo tile (einsum outer products — MXU work), and
        fold tiles into the global grid with 27 STATIC slice-adds. The
        [cap, p^3] scatter-add of the direct path serializes on TPU
        (rhodo-32k: ~45 ms); this is dense-only. Physics identical:
        the spline weight at tile point P is W(g - P), zero outside
        support (ref: pppm.cpp make_rho computes the same 125 products)."""
        nx, ny, nz = self.ngrid
        p = self.order
        bx = self._block_div(nx)
        by = self._block_div(ny)
        bz = self._block_div(nz)
        q = jnp.where(state.valid_mask, state.q, 0.0)
        lam = state.box.to_lamda(x)
        lam = lam - jnp.floor(lam)
        dims = jnp.asarray([nx, ny, nz], dtype=lam.dtype)
        g = lam * dims

        nbx, nby, nbz = nx // bx, ny // by, nz // bz
        nb = nbx * nby * nbz
        cap = x.shape[0]
        # bin atoms by block
        c = jnp.floor(g / jnp.asarray([bx, by, bz], lam.dtype))
        c = c.astype(jnp.int32)
        c = jnp.clip(c, 0, jnp.asarray([nbx - 1, nby - 1, nbz - 1],
                                       jnp.int32))
        bid = (c[:, 0] * nby + c[:, 1]) * nbz + c[:, 2]
        bid = jnp.where(state.valid_mask & (q != 0.0), bid, nb)
        order_ = jnp.argsort(bid, stable=True).astype(jnp.int32)
        sorted_bid = bid[order_]
        first = jnp.searchsorted(sorted_bid, sorted_bid,
                                 side="left").astype(jnp.int32)
        rank = jnp.arange(cap, dtype=jnp.int32) - first
        bcap = self.block_cap
        buckets = jnp.full((nb + 1, bcap), cap, dtype=jnp.int32)
        buckets = buckets.at[sorted_bid, rank].set(order_, mode="drop")
        # overflow falls back structurally: lost charge would corrupt the
        # solve silently, so track and let callers grow (flag on self is
        # not possible in-jit; assert capacity at create time instead)

        bsel = jnp.clip(buckets[:nb], 0, cap - 1)     # [nb, bcap]
        valid = buckets[:nb] < cap
        ga = g[bsel]                                   # [nb, bcap, 3]
        qa = jnp.where(valid, q[bsel], 0.0)

        # block base coordinates
        ids = jnp.arange(nb, dtype=jnp.int32)
        cbx = ids // (nby * nbz)
        cby = (ids // nbz) % nby
        cbz = ids % nbz

        def tile_w(gd, base, bdim, tdim):
            # [nb, bcap, tdim]: W(g - P) at P = base*b - 2 + i
            pts = (base[:, None].astype(gd.dtype) * bdim
                   + jnp.arange(-2, tdim - 2, dtype=gd.dtype)[None, :])
            return _bspline(gd[:, :, None] - pts[:, None, :], p)

        tx, ty, tz = bx + 5, by + 5, bz + 5
        wx = tile_w(ga[..., 0], cbx, bx, tx) * qa[..., None]
        wy = tile_w(ga[..., 1], cby, by, ty)
        wz = tile_w(ga[..., 2], cbz, bz, tz)
        # dense contraction: [nb, tx, ty, tz]
        wxy = jnp.einsum("abi,abj->abij", wx, wy)
        tiles = jnp.einsum("abij,abk->aijk", wxy, wz)

        # fold halo tiles into the block grid with static slices
        tiles = tiles.reshape(nbx, nby, nbz, tx, ty, tz)
        Gb = jnp.zeros((nbx, nby, nbz, bx, by, bz), dtype=x.dtype)

        def seg(d, b_):
            # tile index range + in-block positions for shift d
            if d == -1:
                return slice(0, 2), slice(b_ - 2, b_)
            if d == 0:
                return slice(2, b_ + 2), slice(0, b_)
            return slice(b_ + 2, b_ + 5), slice(0, 3)

        for di in (-1, 0, 1):
            sx, px = seg(di, bx)
            for dj in (-1, 0, 1):
                sy, py = seg(dj, by)
                for dk in (-1, 0, 1):
                    sz, pz = seg(dk, bz)
                    part = tiles[:, :, :, sx, sy, sz]
                    part = jnp.roll(part, shift=(di, dj, dk),
                                    axis=(0, 1, 2))
                    Gb = Gb.at[:, :, :, px, py, pz].add(part)
        grid = Gb.transpose(0, 3, 1, 4, 2, 5).reshape(nx, ny, nz)
        return grid

    def _spread(self, x: Array, state: State) -> Array:
        """rho grid [nx,ny,nz] from B-spline charge assignment
        (ref: pppm.cpp make_rho)."""
        if (self.grid_sharding is None and self.block_cap > 0
                and self.order == 5):
            return self._spread_blocked(x, state)
        nx, ny, nz = self.ngrid
        p = self.order
        q = jnp.where(state.valid_mask, state.q, 0.0)
        lam = state.box.to_lamda(x)
        lam = lam - jnp.floor(lam)

        dims = jnp.asarray([nx, ny, nz], dtype=lam.dtype)
        g = lam * dims  # grid coords
        if p % 2 == 1:
            m0 = jnp.floor(g + 0.5)
        else:
            m0 = jnp.floor(g)
        frac = g - m0  # in [-0.5, 0.5] (odd p)
        m0 = m0.astype(jnp.int32)

        half = (p - 1) // 2
        offs = jnp.arange(-half, p - half, dtype=jnp.int32)  # p offsets
        # weights per dim: [cap, p]
        w = _bspline(frac[..., None] - offs[None, None, :].astype(lam.dtype), p)
        wx, wy, wz = w[:, 0], w[:, 1], w[:, 2]

        mx = jnp.mod(m0[:, 0:1] + offs[None, :], nx)  # [cap, p]
        my = jnp.mod(m0[:, 1:2] + offs[None, :], ny)
        mz = jnp.mod(m0[:, 2:3] + offs[None, :], nz)

        # [cap, p, p, p] contributions
        vals = (q[:, None, None, None]
                * wx[:, :, None, None]
                * wy[:, None, :, None]
                * wz[:, None, None, :])
        ix = jnp.broadcast_to(mx[:, :, None, None], vals.shape)
        iy = jnp.broadcast_to(my[:, None, :, None], vals.shape)
        iz = jnp.broadcast_to(mz[:, None, None, :], vals.shape)

        grid = jnp.zeros((nx, ny, nz), dtype=x.dtype)
        grid = grid.at[ix.reshape(-1), iy.reshape(-1), iz.reshape(-1)].add(
            vals.reshape(-1)
        )
        if self.grid_sharding is not None:
            # pin the grid layout; GSPMD inserts the scatter reduction
            # (ghost-plane sums, ref grid3d reverse_comm) and the FFT
            # all-to-alls (ref remap_3d) around this constraint
            grid = jax.lax.with_sharding_constraint(grid, self.grid_sharding)
        return grid

    def _mesh_energy(self, x: Array, state: State, gf: Array) -> Array:
        rho = self._spread(x, state)
        rho_k = jnp.fft.fftn(rho)
        if self.grid_sharding is not None:
            rho_k = jax.lax.with_sharding_constraint(rho_k,
                                                     self.grid_sharding)
        return jnp.sum(gf * jnp.abs(rho_k) ** 2)

    def _corrections(self, state: State) -> Array:
        q = jnp.where(state.valid_mask, state.q, 0.0)
        qsqsum = jnp.sum(q * q)
        qsum = jnp.sum(q)
        g = self.g_ewald
        vol = state.box.volume
        return (-g / jnp.sqrt(jnp.pi) * qsqsum
                - jnp.pi / (2.0 * vol * g * g) * qsum * qsum)

    def compute(self, state: State, eflag: bool, vflag: bool):
        qqrd2e = get_units(state.units_name).qqr2e
        gf = self._gf(state)

        def energy_of(xx):
            return qqrd2e * self._mesh_energy(xx, state, gf)

        e_k, neg_f = jax.value_and_grad(energy_of)(state.x)
        f = -neg_f

        pe = None
        if eflag:
            pe = e_k + qqrd2e * self._corrections(state)

        virial = None
        if vflag:
            # k-space virial with the standard vterm over mesh modes
            nx, ny, nz = self.ngrid
            prd = state.box.prd
            kx = (2.0 * jnp.pi * jnp.fft.fftfreq(nx, d=1.0 / nx).astype(state.dtype)
                  / prd[0])
            ky = (2.0 * jnp.pi * jnp.fft.fftfreq(ny, d=1.0 / ny).astype(state.dtype)
                  / prd[1])
            kz = (2.0 * jnp.pi * jnp.fft.fftfreq(nz, d=1.0 / nz).astype(state.dtype)
                  / prd[2])
            KX = kx[:, None, None]
            KY = ky[None, :, None]
            KZ = kz[None, None, :]
            k2 = KX * KX + KY * KY + KZ * KZ
            k2 = jnp.where(k2 == 0.0, 1.0, k2)
            rho = self._spread(state.x, state)
            rho_k = jnp.fft.fftn(rho)
            uk = qqrd2e * gf * jnp.abs(rho_k) ** 2
            vterm = -2.0 * (1.0 / k2 + 0.25 / (self.g_ewald**2))
            comps = []
            for (a_arr, b_arr, delta) in (
                (KX, KX, 1.0), (KY, KY, 1.0), (KZ, KZ, 1.0),
                (KX, KY, 0.0), (KX, KZ, 0.0), (KY, KZ, 0.0),
            ):
                comps.append(jnp.sum(uk * (delta + vterm * a_arr * b_arr)))
            virial = jnp.stack(comps)
        return f, pe, virial


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["pppm", "qO_h1", "qO_h2"],
    meta_fields=["alpha"],
)
@dataclasses.dataclass(frozen=True)
class PPPMTIP4P:
    """pppm/tip4p: the charge of an O-type atom spreads from its M site
    (ref: src/KSPACE/pppm_tip4p.cpp particle_map/make_rho with
    find_M). The energy is evaluated at M(x) and jax.grad chains the
    force back through the lever rule — exactly the reference's
    fieldforce redistribution."""

    pppm: PPPM
    qO_h1: Array  # [cap] H partner rows for O atoms (cap elsewhere)
    qO_h2: Array
    alpha: float

    @property
    def dynamic(self):
        return self.pppm.dynamic

    def _m_positions(self, x, state):
        cap = x.shape[0]
        h1 = jnp.minimum(self.qO_h1, cap - 1)
        h2 = jnp.minimum(self.qO_h2, cap - 1)
        d1 = state.box.min_image(x[h1] - x)
        d2 = state.box.min_image(x[h2] - x)
        is_o = (self.qO_h1 < cap)[:, None]
        return x + jnp.where(is_o, self.alpha * 0.5 * (d1 + d2), 0.0)

    def compute(self, state: State, eflag: bool, vflag: bool):
        qqrd2e = get_units(state.units_name).qqr2e
        gf = self.pppm._gf(state)

        def energy_of(xx):
            xm = self._m_positions(xx, state)
            return qqrd2e * self.pppm._mesh_energy(xm, state, gf)

        e_k, neg_f = jax.value_and_grad(energy_of)(state.x)
        f = -neg_f
        pe = None
        if eflag:
            pe = e_k + qqrd2e * self.pppm._corrections(state)
        virial = None
        if vflag:
            st_m = state.replace(x=self._m_positions(state.x, state))
            _, _, virial = self.pppm.compute(st_m, False, True)
        return f, pe, virial


# ---------------------------------------------------------------------------
# Reference-exact PPPM (the LAMMPS ik / ad algorithms, fixture-grade)
# ---------------------------------------------------------------------------
#
# The default PPPM above uses an "optimal" alias-summed influence function
# in ad mode. The reference's two modes differ in algorithm, not just
# roundoff, so the kspace-pppm*.yaml goldens need bit-faithful twins:
#   ik (default): greensfn from compute_gf_ik (alias-summed numerator with
#       k.k_b projection, closed-form gf_denom denominator); forces by
#       spectral differentiation (three inverse FFTs) interpolated with the
#       assignment weights W  (ref: pppm.cpp compute_gf_ik, poisson_ik,
#       fieldforce_ik).
#   ad: greensfn from compute_gf_ad (single-term numerator / gf_denom);
#       forces = -grad of the mesh energy (our autodiff IS the reference's
#       analytic drho1d sum) MINUS the sin-series self-force correction
#       sf_coeff (ref: pppm.cpp compute_gf_ad:1660-1705, fieldforce_ad).
# Grid sizing replicates set_grid_global: ik via estimate_ik_error per
# dim, ad via the qopt h*=0.95 loop; sizes boosted to 2/3/5-factorable.

_ACONS = {
    1: (2.0 / 3.0,),
    2: (1.0 / 50.0, 5.0 / 294.0),
    3: (1.0 / 588.0, 7.0 / 1440.0, 21.0 / 3872.0),
    4: (1.0 / 4320.0, 3.0 / 1936.0, 7601.0 / 2271360.0, 143.0 / 28800.0),
    5: (1.0 / 23232.0, 7601.0 / 13628160.0, 143.0 / 69120.0,
        517231.0 / 106536960.0, 106640677.0 / 11737571328.0),
    6: (691.0 / 68140800.0, 13.0 / 57600.0, 47021.0 / 35512320.0,
        9694607.0 / 2095994880.0, 733191589.0 / 59609088000.0,
        326190917.0 / 11700633600.0),
    7: (1.0 / 345600.0, 3617.0 / 35512320.0, 745739.0 / 838397952.0,
        56399353.0 / 12773376000.0, 25091609.0 / 1560084480.0,
        1755948832039.0 / 36229939200000.0, 4887769399.0 / 37838389248.0),
}


def _factorable(n: int) -> bool:
    for f in (2, 3, 5):
        while n % f == 0:
            n //= f
    return n == 1


def _next_factorable(n: int) -> int:
    while not _factorable(n):
        n += 1
    return n


def _estimate_ik_error(h, prd, natoms, g_ewald, q2, order):
    s = sum(_ACONS[order][m] * (h * g_ewald) ** (2 * m)
            for m in range(order))
    return (q2 * (h * g_ewald) ** order
            * np.sqrt(g_ewald * prd * np.sqrt(2.0 * np.pi) * s / natoms)
            / (prd * prd))


def _powsinxx(x, n):
    out = np.ones_like(x)
    nz = x != 0.0
    out[nz] = (np.sin(x[nz]) / x[nz]) ** n
    return out


def _gf_b(order: int) -> np.ndarray:
    """Closed-form denominator coefficients (ref: compute_gf_denom)."""
    b = np.zeros(order)
    b[0] = 1.0
    for m in range(1, order):
        for l in range(m, 0, -1):
            b[l] = 4.0 * (b[l] * (l - m) * (l - m - 0.5)
                          - b[l - 1] * (l - m - 1) * (l - m - 1))
        b[0] = 4.0 * (b[0] * (0 - m) * (0 - m - 0.5))
    ifact = 1
    for k in range(1, 2 * order):
        ifact *= k
    return b / ifact


def _gf_denom(snx, sny, snz, gf_b) -> np.ndarray:
    """(sum_l b_l x^l per dim, product, squared) with x = sin^2(k h/2)."""
    sx = np.zeros_like(snx)
    sy = np.zeros_like(sny)
    sz = np.zeros_like(snz)
    for l in range(len(gf_b) - 1, -1, -1):
        sx = gf_b[l] + sx * snx
        sy = gf_b[l] + sy * sny
        sz = gf_b[l] + sz * snz
    s = (sx[:, None, None] * sy[None, :, None] * sz[None, None, :])
    return s * s


def _kper(n: int) -> np.ndarray:
    k = np.arange(n)
    return k - n * (2 * k // n)


def _qopt(nx, ny, nz, prd, zprd_slab, g_ewald, order) -> float:
    """compute_qopt: the ad-mode k-space error functional."""
    unitk = (2.0 * np.pi / prd[0], 2.0 * np.pi / prd[1],
             2.0 * np.pi / zprd_slab)
    kx = _kper(nx)
    ky = _kper(ny)
    kz = _kper(nz)
    KX, KY, KZ = np.meshgrid(kx, ky, kz, indexing="ij")
    sqk = ((unitk[0] * KX) ** 2 + (unitk[1] * KY) ** 2
           + (unitk[2] * KZ) ** 2)
    two = 2 * order
    sum1 = np.zeros_like(sqk)
    sum2 = np.zeros_like(sqk)
    sum3 = np.zeros_like(sqk)
    sum4 = np.zeros_like(sqk)
    for bx in range(-2, 3):
        qx = unitk[0] * (kx + nx * bx)
        sx = np.exp(-0.25 * (qx / g_ewald) ** 2)
        wx = _powsinxx(0.5 * qx * prd[0] / nx, two)
        qx2 = qx * qx
        for by in range(-2, 3):
            qy = unitk[1] * (ky + ny * by)
            sy = np.exp(-0.25 * (qy / g_ewald) ** 2)
            wy = _powsinxx(0.5 * qy * prd[1] / ny, two)
            qy2 = qy * qy
            for bz in range(-2, 3):
                qz = unitk[2] * (kz + nz * bz)
                sz = np.exp(-0.25 * (qz / g_ewald) ** 2)
                wz = _powsinxx(0.5 * qz * zprd_slab / nz, two)
                qz2 = qz * qz
                dot2 = (qx2[:, None, None] + qy2[None, :, None]
                        + qz2[None, None, :])
                dot2 = np.where(dot2 == 0.0, 1.0, dot2)
                u1 = (sx[:, None, None] * sy[None, :, None]
                      * sz[None, None, :])
                u2 = (wx[:, None, None] * wy[None, :, None]
                      * wz[None, None, :])
                sum1 += u1 * u1 / dot2 * (4.0 * np.pi) ** 2
                sum2 += u1 * u2 * 4.0 * np.pi
                sum3 += u2
                sum4 += dot2 * u2
    mask = sqk != 0.0
    term = sum1 - sum2 * sum2 / (sum3 * sum4)
    return float(term[mask].sum())


def reference_grid(prd, natoms, q2, g_ewald, accuracy, order=5,
                   diff="ik", slab_volfactor=1.0):
    """set_grid_global's grid sizes (ref: pppm.cpp:1010-1095)."""
    zprd_slab = prd[2] * slab_volfactor
    dims3 = (prd[0], prd[1], zprd_slab)
    if diff == "ad":
        h = 4.0 / g_ewald
        for _ in range(500):
            ns = [max(int(d / h), 2) for d in dims3]
            qopt = _qopt(ns[0], ns[1], ns[2], prd, zprd_slab, g_ewald,
                         order)
            df = np.sqrt(qopt / natoms) * q2 / (prd[0] * prd[1] * zprd_slab)
            if df <= accuracy:
                break
            h *= 0.95
        nx, ny, nz = ns
    else:
        ns = []
        for d in dims3:
            h = 1.0 / g_ewald
            n = int(d / h) + 1
            # verbatim reference loop: the exit condition tests the error
            # of the PREVIOUS h, so n overshoots by one step
            err = _estimate_ik_error(h, d, natoms, g_ewald, q2, order)
            while err > accuracy:
                err = _estimate_ik_error(h, d, natoms, g_ewald, q2, order)
                n += 1
                h = d / n
            ns.append(n)
        nx, ny, nz = ns
    return (_next_factorable(nx), _next_factorable(ny),
            _next_factorable(nz))


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["gf_half", "kxp", "kyp", "kzp", "sf_coeff"],
    meta_fields=["ngrid", "order", "g_ewald", "diff", "slabflag",
                 "hx_inv", "hy_inv", "hz_inv", "slab_volfactor"],
)
@dataclasses.dataclass(frozen=True)
class PPPMReference:
    """Fixture-grade PPPM: the reference's ik or ad algorithm exactly.

    gf_half = greensfn/(2V) so that E_mesh = qqrd2e * sum gf_half |rho_k|^2
    matches the class-above convention. kxp/kyp/kzp are the physical
    per-dim wavevectors unitk*kper.
    """

    gf_half: Array
    kxp: Array
    kyp: Array
    kzp: Array
    sf_coeff: Array  # [6] (zeros for ik)
    ngrid: tuple
    order: int
    g_ewald: float
    diff: str
    slabflag: int
    hx_inv: float
    hy_inv: float
    hz_inv: float
    slab_volfactor: float = 1.0

    @staticmethod
    def create(box, g_ewald: float, natoms: int, qsqsum: float,
               qqrd2e: float, accuracy_rel: float, diff: str = "ik",
               order: int = 5, grid: tuple | None = None,
               slabflag: int = 0, slab_volfactor: float = 1.0,
               triclinic: bool | None = None,
               dtype=jnp.float64) -> "PPPMReference":
        prd = np.asarray(jax.device_get(box.prd), dtype=float)
        tilt = np.asarray(jax.device_get(box.tilt), dtype=float)
        if triclinic is None:
            triclinic = bool(box.triclinic)
        q2 = qsqsum * qqrd2e
        # accuracy_absolute = rel * two_charge_force (ref: kspace.cpp:169)
        accuracy = accuracy_rel * qqrd2e
        if grid is None:
            grid = reference_grid(prd, natoms, q2, g_ewald, accuracy,
                                  order=order, diff=diff,
                                  slab_volfactor=slab_volfactor)
            if triclinic:
                # triclinic bump (ref: set_grid_global:1081-1087 — grid
                # density transformed through lamda2xT, int()+1)
                xy, xz, yz = abs(tilt[0]), abs(tilt[1]), abs(tilt[2])
                gx = grid[0] / prd[0]
                gy = grid[1] / prd[1]
                gz = grid[2] / prd[2]
                v0 = prd[0] * gx
                v1 = xy * gx + prd[1] * gy
                v2 = xz * gx + yz * gy + prd[2] * gz
                grid = (_next_factorable(int(v0) + 1),
                        _next_factorable(int(v1) + 1),
                        _next_factorable(int(v2) + 1))
        nx, ny, nz = grid
        zprd_slab = prd[2] * slab_volfactor
        vol = prd[0] * prd[1] * zprd_slab

        unitk = (2.0 * np.pi / prd[0], 2.0 * np.pi / prd[1],
                 2.0 * np.pi / zprd_slab)
        kxi = _kper(nx)
        kyi = _kper(ny)
        kzi = _kper(nz)
        if triclinic:
            # h_inv of the LAMMPS upper-triangular cell
            xy, xz, yz = tilt
            hi0 = 1.0 / prd[0]
            hi1 = 1.0 / prd[1]
            hi2 = 1.0 / prd[2]
            hi3 = -yz / (prd[1] * prd[2])
            hi4 = (yz * xy - prd[1] * xz) / (prd[0] * prd[1] * prd[2])
            hi5 = -xy / (prd[0] * prd[1])

            def x2lamdaT(v0, v1, v2):
                return (hi0 * v0, hi5 * v0 + hi1 * v1,
                        hi4 * v0 + hi3 * v1 + hi2 * v2)

            two_pi = 2.0 * np.pi
            PI, PJ, PK = np.meshgrid(kxi.astype(float), kyi.astype(float),
                                     kzi.astype(float), indexing="ij")
            kxp, kyp, kzp = x2lamdaT(two_pi * PI, two_pi * PJ, two_pi * PK)
        else:
            kxp = unitk[0] * kxi
            kyp = unitk[1] * kyi
            kzp = unitk[2] * kzi
        if triclinic:
            sqk = kxp * kxp + kyp * kyp + kzp * kzp
        else:
            sqk = ((kxp * kxp)[:, None, None] + (kyp * kyp)[None, :, None]
                   + (kzp * kzp)[None, None, :])
        gfb = _gf_b(order)
        if not triclinic:
            snx = np.sin(0.5 * kxp * prd[0] / nx) ** 2
            sny = np.sin(0.5 * kyp * prd[1] / ny) ** 2
            snz = np.sin(0.5 * kzp * zprd_slab / nz) ** 2
            denom = _gf_denom(snx, sny, snz, gfb)
        two = 2 * order

        sf_coeff = np.zeros(6)
        if diff == "ad":
            sx = np.exp(-0.25 * (kxp / g_ewald) ** 2)
            sy = np.exp(-0.25 * (kyp / g_ewald) ** 2)
            sz = np.exp(-0.25 * (kzp / g_ewald) ** 2)
            wx = _powsinxx(0.5 * kxp * prd[0] / nx, two)
            wy = _powsinxx(0.5 * kyp * prd[1] / ny, two)
            wz = _powsinxx(0.5 * kzp * zprd_slab / nz, two)
            sqks = np.where(sqk == 0.0, 1.0, sqk)
            gf = (4.0 * np.pi / sqks
                  * (sx[:, None, None] * sy[None, :, None]
                     * sz[None, None, :])
                  * (wx[:, None, None] * wy[None, :, None]
                     * wz[None, None, :]) / denom)
            gf[sqk == 0.0] = 0.0
            # self-force precoefficients (ref: compute_sf_precoeff):
            # per-dim W-products over the 5 central aliases
            def wrow(kper_i, n, shift):
                # w[i] = powsinxx(pi*(kper + n*(i-2+shift))/n, order)
                out = np.empty((5, len(kper_i)))
                for i in range(5):
                    arg = np.pi * (kper_i + n * (i - 2 + shift)) / n
                    out[i] = _powsinxx(arg, order)
                return out

            wx0 = wrow(kxi, nx, 0)
            wx1 = wrow(kxi, nx, 1)
            wx2 = wrow(kxi, nx, 2)
            wy0 = wrow(kyi, ny, 0)
            wy1 = wrow(kyi, ny, 1)
            wy2 = wrow(kyi, ny, 2)
            wz0 = wrow(kzi, nz, 0)
            wz1 = wrow(kzi, nz, 1)
            wz2 = wrow(kzi, nz, 2)
            # sums over (nx,ny,nz) alias triples of u0*u_k — separable:
            # sum u0*u1 = (sum_x wx0 wx1)(sum_y wy0^2)(sum_z wz0^2) etc.
            sx00 = (wx0 * wx0).sum(0)
            sx01 = (wx0 * wx1).sum(0)
            sx02 = (wx0 * wx2).sum(0)
            sy00 = (wy0 * wy0).sum(0)
            sy01 = (wy0 * wy1).sum(0)
            sy02 = (wy0 * wy2).sum(0)
            sz00 = (wz0 * wz0).sum(0)
            sz01 = (wz0 * wz1).sum(0)
            sz02 = (wz0 * wz2).sum(0)

            def outer3(a, b, c):
                return (a[:, None, None] * b[None, :, None]
                        * c[None, None, :])

            pre1 = outer3(sx01, sy00, sz00)
            pre2 = outer3(sx02, sy00, sz00)
            pre3 = outer3(sx00, sy01, sz00)
            pre4 = outer3(sx00, sy02, sz00)
            pre5 = outer3(sx00, sy00, sz01)
            pre6 = outer3(sx00, sy00, sz02)
            prex = np.pi / vol * nx / prd[0]
            prey = np.pi / vol * ny / prd[1]
            prez = np.pi / vol * nz / zprd_slab
            sf_coeff[0] = (pre1 * gf).sum() * prex
            sf_coeff[1] = (pre2 * gf).sum() * prex * 2.0
            sf_coeff[2] = (pre3 * gf).sum() * prey
            sf_coeff[3] = (pre4 * gf).sum() * prey * 2.0
            sf_coeff[4] = (pre5 * gf).sum() * prez
            sf_coeff[5] = (pre6 * gf).sum() * prez * 2.0
        elif triclinic:
            # compute_gf_ik_triclinic: lamda-space W args, transformed
            # alias vectors (ref: pppm.cpp compute_gf_ik_triclinic)
            eps_hoc = 1.0e-7
            fac = (-np.log(eps_hoc)) ** 0.25
            t0, t1, t2 = (g_ewald / (np.pi * nx) * fac,
                          g_ewald / (np.pi * ny) * fac,
                          g_ewald / (np.pi * nz) * fac)
            # lamda2xT with |h off-diagonals| (ref: kspace.cpp lamda2xT)
            xy, xz, yz = np.abs(tilt)
            nbx = int(prd[0] * t0)
            nby = int(xy * t0 + prd[1] * t1)
            nbz = int(xz * t0 + yz * t1 + prd[2] * t2)
            snx = np.sin(np.pi * kxi / nx) ** 2
            sny = np.sin(np.pi * kyi / ny) ** 2
            snz = np.sin(np.pi * kzi / nz) ** 2
            denom = _gf_denom(snx, sny, snz, gfb)
            sum1 = np.zeros((nx, ny, nz))
            two_pi = 2.0 * np.pi
            for bx in range(-nbx, nbx + 1):
                wx = _powsinxx(np.pi * kxi / nx + np.pi * bx, two)
                for by in range(-nby, nby + 1):
                    wy = _powsinxx(np.pi * kyi / ny + np.pi * by, two)
                    for bz in range(-nbz, nbz + 1):
                        wz = _powsinxx(np.pi * kzi / nz + np.pi * bz, two)
                        b0, b1, b2 = x2lamdaT(two_pi * nx * bx,
                                              two_pi * ny * by,
                                              two_pi * nz * bz)
                        qx = kxp + b0
                        qy = kyp + b1
                        qz = kzp + b2
                        s3 = np.exp(-0.25 * ((qx / g_ewald) ** 2
                                             + (qy / g_ewald) ** 2
                                             + (qz / g_ewald) ** 2))
                        dot1 = kxp * qx + kyp * qy + kzp * qz
                        dot2 = qx * qx + qy * qy + qz * qz
                        dot2 = np.where(dot2 == 0.0, 1.0, dot2)
                        sum1 += ((dot1 / dot2) * s3
                                 * outer_sw(wx, wy, wz))
            sqks = np.where(sqk == 0.0, 1.0, sqk)
            gf = 12.5663706 / sqks * sum1 / denom
            gf[sqk == 0.0] = 0.0
        else:
            # ik greensfn: alias-summed k.k_b projection numerator
            # (ref: compute_gf_ik); alias bounds from EPS_HOC = 1e-7
            eps_hoc = 1.0e-7
            nbx = int((g_ewald * prd[0] / (np.pi * nx))
                      * (-np.log(eps_hoc)) ** 0.25)
            nby = int((g_ewald * prd[1] / (np.pi * ny))
                      * (-np.log(eps_hoc)) ** 0.25)
            nbz = int((g_ewald * zprd_slab / (np.pi * nz))
                      * (-np.log(eps_hoc)) ** 0.25)
            sum1 = np.zeros((nx, ny, nz))
            for bx in range(-nbx, nbx + 1):
                qx = unitk[0] * (kxi + nx * bx)
                sx = np.exp(-0.25 * (qx / g_ewald) ** 2)
                wx = _powsinxx(0.5 * qx * prd[0] / nx, two)
                for by in range(-nby, nby + 1):
                    qy = unitk[1] * (kyi + ny * by)
                    sy = np.exp(-0.25 * (qy / g_ewald) ** 2)
                    wy = _powsinxx(0.5 * qy * prd[1] / ny, two)
                    for bz in range(-nbz, nbz + 1):
                        qz = unitk[2] * (kzi + nz * bz)
                        sz = np.exp(-0.25 * (qz / g_ewald) ** 2)
                        wz = _powsinxx(0.5 * qz * zprd_slab / nz, two)
                        dot1 = (kxp[:, None, None] * qx[:, None, None]
                                + kyp[None, :, None] * qy[None, :, None]
                                + kzp[None, None, :] * qz[None, None, :])
                        dot2 = (qx[:, None, None] ** 2
                                + qy[None, :, None] ** 2
                                + qz[None, None, :] ** 2)
                        dot2 = np.where(dot2 == 0.0, 1.0, dot2)
                        sum1 += ((dot1 / dot2)
                                 * outer_sw(sx, sy, sz)
                                 * outer_sw(wx, wy, wz))
            sqks = np.where(sqk == 0.0, 1.0, sqk)
            # the reference hardcodes a TRUNCATED 4pi here (12.5663706,
            # compute_gf_ik "numerator = 12.5663706/sqk") while the ad
            # branch uses MY_4PI — the goldens carry that 1.1e-9 bias
            gf = 12.5663706 / sqks * sum1 / denom
            gf[sqk == 0.0] = 0.0

        gf_half = gf / (2.0 * vol)
        return PPPMReference(
            gf_half=jnp.asarray(gf_half, dtype=dtype),
            kxp=jnp.asarray(kxp, dtype=dtype),
            kyp=jnp.asarray(kyp, dtype=dtype),
            kzp=jnp.asarray(kzp, dtype=dtype),
            sf_coeff=jnp.asarray(sf_coeff, dtype=dtype),
            ngrid=(nx, ny, nz), order=order, g_ewald=float(g_ewald),
            diff=diff, slabflag=slabflag,
            hx_inv=float(nx / prd[0]), hy_inv=float(ny / prd[1]),
            hz_inv=float(nz / zprd_slab), slab_volfactor=slab_volfactor,
        )

    # weight machinery shared with the main class via module functions
    def _weights(self, x: Array, state: State):
        nx, ny, nz = self.ngrid
        p = self.order
        lam = state.box.to_lamda(x)
        lam = lam - jnp.floor(lam)
        if self.slab_volfactor != 1.0:
            # slab geometry: the z FFT length is zprd*volfactor; atoms
            # occupy the lower 1/volfactor of it (ref: pppm.cpp
            # particle_map with zprd_slab)
            lam = lam.at[:, 2].mul(1.0 / self.slab_volfactor)
        dims = jnp.asarray([nx, ny, nz], dtype=lam.dtype)
        g = lam * dims
        m0 = jnp.floor(g + 0.5) if p % 2 == 1 else jnp.floor(g)
        frac = g - m0
        m0 = m0.astype(jnp.int32)
        half = (p - 1) // 2
        offs = jnp.arange(-half, p - half, dtype=jnp.int32)
        w = _bspline(frac[..., None] - offs[None, None, :].astype(lam.dtype),
                     p)
        mx = jnp.mod(m0[:, 0:1] + offs[None, :], nx)
        my = jnp.mod(m0[:, 1:2] + offs[None, :], ny)
        mz = jnp.mod(m0[:, 2:3] + offs[None, :], nz)
        return w[:, 0], w[:, 1], w[:, 2], mx, my, mz

    def _spread(self, x: Array, state: State) -> Array:
        nx, ny, nz = self.ngrid
        q = jnp.where(state.valid_mask, state.q, 0.0)
        wx, wy, wz, mx, my, mz = self._weights(x, state)
        vals = (q[:, None, None, None] * wx[:, :, None, None]
                * wy[:, None, :, None] * wz[:, None, None, :])
        ix = jnp.broadcast_to(mx[:, :, None, None], vals.shape)
        iy = jnp.broadcast_to(my[:, None, :, None], vals.shape)
        iz = jnp.broadcast_to(mz[:, None, None, :], vals.shape)
        grid = jnp.zeros((nx, ny, nz), dtype=x.dtype)
        return grid.at[ix.reshape(-1), iy.reshape(-1),
                       iz.reshape(-1)].add(vals.reshape(-1))

    def compute(self, state: State, eflag: bool, vflag: bool):
        qqrd2e = get_units(state.units_name).qqr2e
        nx, ny, nz = self.ngrid
        N = nx * ny * nz
        q = jnp.where(state.valid_mask, state.q, 0.0)

        if self.diff == "ad":
            def energy_of(xx):
                rho_k = jnp.fft.fftn(self._spread(xx, state))
                return qqrd2e * jnp.sum(self.gf_half
                                        * jnp.abs(rho_k) ** 2)

            e_k, neg_f = jax.value_and_grad(energy_of)(state.x)
            f = -neg_f
            # self-force correction (ref: fieldforce_ad sf terms; note the
            # reference uses the RAW coordinate, not x - boxlo)
            s1 = state.x[:, 0] * self.hx_inv
            s2 = state.x[:, 1] * self.hy_inv
            s3 = state.x[:, 2] * self.hz_inv
            q2v = 2.0 * q * q * qqrd2e
            two_pi = 2.0 * jnp.pi
            sfx = (self.sf_coeff[0] * jnp.sin(two_pi * s1)
                   + self.sf_coeff[1] * jnp.sin(2.0 * two_pi * s1)) * q2v
            sfy = (self.sf_coeff[2] * jnp.sin(two_pi * s2)
                   + self.sf_coeff[3] * jnp.sin(2.0 * two_pi * s2)) * q2v
            sfz = (self.sf_coeff[4] * jnp.sin(two_pi * s3)
                   + self.sf_coeff[5] * jnp.sin(2.0 * two_pi * s3)) * q2v
            f = f - jnp.stack([sfx, sfy, sfz], axis=-1)
        else:
            rho_k = jnp.fft.fftn(self._spread(state.x, state))
            phi = self.gf_half * rho_k

            def efield(kvec, axis):
                if kvec.ndim == 1:
                    shape = [1, 1, 1]
                    shape[axis] = -1
                    kk = kvec.reshape(shape)
                else:
                    kk = kvec  # triclinic: full 3-D k meshes
                return -2.0 * qqrd2e * N * jnp.real(
                    jnp.fft.ifftn(1j * kk * phi))

            ex = efield(self.kxp, 0)
            ey = efield(self.kyp, 1)
            ez = efield(self.kzp, 2)
            wx, wy, wz, mx, my, mz = self._weights(state.x, state)
            www = (wx[:, :, None, None] * wy[:, None, :, None]
                   * wz[:, None, None, :])
            ix = jnp.broadcast_to(mx[:, :, None, None], www.shape)
            iy = jnp.broadcast_to(my[:, None, :, None], www.shape)
            iz = jnp.broadcast_to(mz[:, None, None, :], www.shape)
            exi = jnp.sum(www * ex[ix, iy, iz], axis=(1, 2, 3))
            eyi = jnp.sum(www * ey[ix, iy, iz], axis=(1, 2, 3))
            ezi = jnp.sum(www * ez[ix, iy, iz], axis=(1, 2, 3))
            f = q[:, None] * jnp.stack([exi, eyi, ezi], axis=-1)
            rho_k_e = rho_k

        if self.slabflag == 2:
            f = f.at[:, 2].set(0.0)  # kspace_modify slab nozforce
        elif self.slabflag == 1:
            # 2d-slab dipole correction (ref: pppm.cpp slabcorr():
            # f_z += qqrd2e*(-4pi/V_slab)*q*(dipole_all - qsum*z))
            zq = state.x[:, 2]
            dipole = jnp.sum(q * zq)
            qsum = jnp.sum(q)
            vol_slab = state.box.volume * self.slab_volfactor
            ffact = qqrd2e * (-4.0 * jnp.pi / vol_slab)
            f = f.at[:, 2].add(ffact * q * (dipole - qsum * zq))

        pe = None
        if eflag:
            if self.diff == "ad":
                pe = e_k
            else:
                pe = qqrd2e * jnp.sum(self.gf_half
                                      * jnp.abs(rho_k_e) ** 2)
            qsqsum = jnp.sum(q * q)
            qsum = jnp.sum(q)
            g = self.g_ewald
            vol = state.box.volume
            pe = pe + qqrd2e * (-g / jnp.sqrt(jnp.pi) * qsqsum
                                - jnp.pi / (2.0 * vol * g * g)
                                * qsum * qsum)
            if self.slabflag == 1:
                zq = state.x[:, 2]
                dip = jnp.sum(q * zq)
                dip_r2 = jnp.sum(q * zq * zq)
                zl = state.box.prd[2] * self.slab_volfactor
                vol_slab = state.box.volume * self.slab_volfactor
                pe = pe + qqrd2e * 2.0 * jnp.pi * (
                    dip * dip - qsum * dip_r2
                    - qsum * qsum * zl * zl / 12.0) / vol_slab

        return f, pe, (jnp.zeros(6, dtype=state.dtype) if vflag else None)


def outer_sw(a, b, c):
    return (a[:, None, None] * b[None, :, None] * c[None, None, :])


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["pppm", "qO_h1", "qO_h2"],
    meta_fields=["alpha"],
)
@dataclasses.dataclass(frozen=True)
class PPPMReferenceTIP4P:
    """pppm/tip4p on the reference-exact solver: charges of O atoms act at
    the M site xM = xO + alpha/2 ((xH1-xO) + (xH2-xO)); forces computed at
    M distribute F_O = (1-alpha) F_M, F_H = alpha/2 F_M — the chain rule
    of the linear M map (ref: src/KSPACE/pppm_tip4p.cpp fieldforce_ad/_ik
    else-branch, find_M)."""

    pppm: PPPMReference
    qO_h1: Array  # [cap] int32, H1 row for O atoms else cap
    qO_h2: Array
    alpha: float

    def _m_positions(self, x, state):
        cap = x.shape[0]
        h1 = jnp.minimum(self.qO_h1, cap - 1)
        h2 = jnp.minimum(self.qO_h2, cap - 1)
        d1 = state.box.min_image(x[h1] - x)
        d2 = state.box.min_image(x[h2] - x)
        is_o = (self.qO_h1 < cap)[:, None]
        return x + jnp.where(is_o, self.alpha * 0.5 * (d1 + d2), 0.0)

    def _distribute(self, fM, x):
        cap = x.shape[0]
        is_o = (self.qO_h1 < cap)[:, None]
        h1 = jnp.minimum(self.qO_h1, cap - 1)
        h2 = jnp.minimum(self.qO_h2, cap - 1)
        fO = jnp.where(is_o, fM, 0.0)
        f = jnp.where(is_o, (1.0 - self.alpha) * fM, fM)
        f = f.at[h1].add(0.5 * self.alpha * fO, mode="drop")
        f = f.at[h2].add(0.5 * self.alpha * fO, mode="drop")
        return f

    def compute(self, state: State, eflag: bool, vflag: bool):
        ref = self.pppm
        xm = self._m_positions(state.x, state)
        # evaluate the reference solver at the M coordinates, then
        # redistribute the per-site force through the M map
        st_m = state.replace(x=xm)
        fM, pe, vir = ref.compute(st_m, eflag, vflag)
        return self._distribute(fM, state.x), pe, vir
