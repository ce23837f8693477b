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
                 "dynamic", "grid_sharding"],
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
               dynamic: bool = False) -> "PPPM":
        prd = np.asarray(jax.device_get(box.prd))
        vol = float(np.asarray(jax.device_get(box.volume)))
        if grid is None:
            grid = choose_grid_size(g_ewald, prd, accuracy_rel, order)
        nx, ny, nz = grid

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

    def _spread(self, x: Array, state: State) -> Array:
        """rho grid [nx,ny,nz] from B-spline charge assignment
        (ref: pppm.cpp make_rho)."""
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
