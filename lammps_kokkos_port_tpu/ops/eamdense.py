"""Dense EAM path: Chebyshev-resampled tables, grid-roll two-pass, no
per-pair gathers.

The matrix-path EAM gathers a 7-coefficient spline row per pair per pass
(ref: src/MANYBODY/pair_eam.cpp:142-330 table lookups) — random gathers
run orders of magnitude below VPU speed on TPU. This path replaces the
table LOOKUP with table-free polynomial EVALUATION: at setup the spline
tables are resampled into global Chebyshev fits **in u = r^2** (no sqrt in
the hot loop):

    g(u)   = rhor(r)                      density contribution
    a(u)   = rhor'(r)/r                   embedding-force factor
    b(u)   = z2r'(r)/r^2 - z2r(r)/r^3     pair-force factor (phip/r)
    phi(u) = z2r(r)/r                     pair energy
    F(rho), F'(rho)                       embedding energy / derivative

so F_i = -sum_j dx * [ (fp_i + fp_j) a(u) + b(u) ] exactly mirrors the
reference's psip assembly (pair_eam.cpp:268-292) with fp = F'(rho).
Clenshaw evaluation is ~2 FLOPs per degree — pure fused VPU work.

Structure per force call (the EAM KernelA/B/C decomposition of
src/KOKKOS/pair_eam_kokkos.cpp:137-260, without its mid-compute comms):
  pass 1: rho_i by Newton-halved grid rolls; fp_i = F'(rho_i)
  pass 2: forces with the fp channel rolled alongside positions.

Single-element (funcfl) styles only; everything else stays on the exact
spline/matrix path. Accuracy (pinned in tests/test_eam.py): forces within
2e-3 relative and energy within 1e-5 relative of the exact spline path on
a thermally jittered bulk — the individual function fits are ~1e-6, the
force bound is dominated by spline-vs-fit derivative differences near the
table edges. The exact path stays the default for golden-log parity.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core.state import State
from . import gridforce, neighbor as nbr

Array = jax.Array

DEG = 28        # pair-function fits (per-candidate Clenshaw cost)
DEG_EMBED = 80  # embedding fits (per-ATOM cost — raise freely)
R_LO_FRAC = 0.30  # fit from 0.3*cutoff; closer approaches clamp


def _spline_val_der(coeff: np.ndarray, n: int, delta: float, x: np.ndarray):
    """Numpy twin of the reference's 7-coeff spline evaluation
    (pair_eam.cpp interpolate(); derivative coeffs already fold 1/delta)."""
    p = x / delta + 1.0
    m = np.clip(np.floor(p).astype(int), 1, n - 1)
    p = np.clip(p - m, 0.0, 1.0)
    c = coeff[m]
    val = ((c[:, 3] * p + c[:, 4]) * p + c[:, 5]) * p + c[:, 6]
    der = (c[:, 0] * p + c[:, 1]) * p + c[:, 2]
    return val, der


def build_poly_tables(style) -> dict | None:
    """Host: Chebyshev fits (in u = r^2) from a single-type funcfl style.
    Returns None when the style is not resamplable."""
    if style.ntypes != 1:
        return None
    # numpy-index the stored (concrete) arrays: jnp indexing would create
    # tracers when this runs inside a trace (the style lives in the closure)
    rhor = np.asarray(jax.device_get(style.rhor_spline))[
        int(np.asarray(jax.device_get(style.type2rhor))[1, 1])]
    z2r = np.asarray(jax.device_get(style.z2r_spline))[
        int(np.asarray(jax.device_get(style.type2z2r))[1, 1])]
    frho = np.asarray(jax.device_get(style.frho_spline))[
        int(np.asarray(jax.device_get(style.type2frho))[1])]
    nr, nrho = style.nr, style.nrho
    dr, drho = style.dr, style.drho
    rc = style.cutmax
    r_lo = R_LO_FRAC * rc

    r = np.linspace(r_lo, rc, 4096)
    rho_v, rho_d = _spline_val_der(rhor, nr, dr, r)
    z2_v, z2_d = _spline_val_der(z2r, nr, dr, r)

    u = r * r

    def fit(y, x, lo, hi, deg=DEG):
        # coefficients over the SAME [lo,hi]->[-1,1] map _clenshaw uses
        t = (2.0 * x - (lo + hi)) / (hi - lo)
        return np.polynomial.chebyshev.chebfit(t, y, deg)

    u_lo, u_hi = r_lo * r_lo, rc * rc

    def cheb_der(c, lo, hi):
        # derivative SERIES of the fitted values (not an independent fit of
        # the spline derivatives): forces stay the exact gradient of the
        # fitted energy, so NVE conserves to integrator error
        return np.polynomial.chebyshev.chebder(c) * (2.0 / (hi - lo))

    g_c = fit(rho_v, u, u_lo, u_hi)
    phi_c = fit(z2_v / r, u, u_lo, u_hi)
    tabs = {
        "g": g_c,
        "a": 2.0 * cheb_der(g_c, u_lo, u_hi),   # drho/dx = 2 g'(u) dx
        "b": 2.0 * cheb_der(phi_c, u_lo, u_hi),  # = phip/r
        "phi": phi_c,
    }
    # embedding: F(rho) ~ -c sqrt(rho) near 0 (F' diverges), so fit in
    # s = sqrt(rho) over [s_lo, s_max]; below s_lo the inputs clamp
    # (near-isolated atoms — outside the dense-path regime)
    rho_hi = style.rhomax
    s_hi = np.sqrt(rho_hi)
    s_lo = 0.3 * s_hi  # rho >= 9% of table max: the dense-solid regime
    sg = np.linspace(s_lo, s_hi, 8192)
    f_v, _ = _spline_val_der(frho, nrho, drho, sg * sg)
    F_c = fit(f_v, sg, s_lo, s_hi, DEG_EMBED)
    tabs["F"] = F_c
    # F'(rho) = F_s'(s) / (2 s) — consistent with the fitted F
    tabs["Fp_s"] = cheb_der(F_c, s_lo, s_hi)
    tabs["u_range"] = (u_lo, u_hi)
    tabs["s_range"] = (s_lo, s_hi)
    tabs["rho_range"] = (s_lo * s_lo, rho_hi)
    return tabs


def pallas_pair_row_limit() -> int:
    from . import pallas_pair

    return pallas_pair._VMEM_ROW_LIMIT


def _clenshaw(c: np.ndarray, x: Array, lo: float, hi: float) -> Array:
    """Chebyshev series evaluation with static coefficients."""
    t = (2.0 * x - (lo + hi)) / (hi - lo)
    t2 = 2.0 * t
    b0 = jnp.zeros_like(x)
    b1 = jnp.zeros_like(x)
    for k in range(len(c) - 1, 0, -1):
        b0, b1 = t2 * b0 - b1 + float(c[k]), b0
    return t * b0 - b1 + float(c[0])


def compute(style, state: State, cl, eflag: bool, vflag: bool):
    """Dense two-pass EAM over GridCells/SortedCells. Returns
    (f, pe, virial) in the list's layout."""
    from . import sortedforce

    tabs = build_poly_tables(style)
    p = cl.params
    cap = state.capacity
    nx, ny, nz = p.ncells
    ntot = p.total_cells
    cc = p.cell_cap
    dt = state.dtype

    if (isinstance(cl, sortedforce.SortedCells) and not eflag and not vflag
            and cap <= pallas_pair_row_limit()):
        from . import pallas_eam

        return pallas_eam.compute_force_sorted(style, tabs, state, cl), \
            None, None

    if isinstance(cl, sortedforce.SortedCells):
        xg = state.x.reshape(nx, ny, nz, cc, 3)
        vg_valid = state.valid_mask.reshape(nx, ny, nz, cc)
        og = vg_valid  # owned_all layout
        scatter_idx = None
    else:
        bidx = jnp.clip(cl.buckets[:ntot], 0, cap - 1)
        xg = state.x[bidx].reshape(nx, ny, nz, cc, 3)
        vg_valid = (cl.buckets[:ntot] < cap).reshape(nx, ny, nz, cc)
        og = state.owned_mask[bidx].reshape(nx, ny, nz, cc) & vg_valid
        scatter_idx = cl.buckets[:ntot].reshape(-1)

    u_lo, u_hi = tabs["u_range"]
    rho_lo, rho_hi = tabs["rho_range"]
    cutsq = float(style.cutmax) ** 2
    periodic = state.box.periodic

    def pair_u(xi, xj, vi, vj, pair_mask):
        dx = state.box.min_image(xi[..., :, None, :] - xj[..., None, :, :])
        u = jnp.sum(dx * dx, axis=-1)
        valid = vi[..., :, None] & vj[..., None, :] & (u < cutsq)
        if pair_mask is not None:
            valid = valid & pair_mask
        us = jnp.clip(jnp.where(valid, u, u_hi), u_lo, u_hi)
        return dx, us, valid

    lane = jnp.arange(cc, dtype=jnp.int32)
    notself = lane[:, None] != lane[None, :]

    def roll_pass(term_fn, extra=None):
        """Newton-halved sweep: term_fn(dx, us, valid, ex_i, ex_j) ->
        (per_i, per_j, tallies...). Accumulates per-atom channels."""
        acc_i = None
        # self cell (both orders appear)
        ex_i = extra[..., :, None] if extra is not None else None
        ex_j = extra[..., None, :] if extra is not None else None
        dx, us, valid = pair_u(xg, xg, vg_valid, vg_valid, notself)
        out_i, _, tallies = term_fn(dx, us, valid, ex_i, ex_j, half=False)
        acc_i = out_i
        acc_t = tallies
        for off in gridforce.HALF_OFFSETS:
            xj = gridforce._roll3(xg, off, -1)
            vj = gridforce._roll3(vg_valid, off, -1)
            exj = (gridforce._roll3(extra, off, -1)[..., None, :]
                   if extra is not None else None)
            em = gridforce._edge_mask(p, periodic, off)
            pm = jnp.asarray(em)[..., None] if em is not None else None
            dx, us, valid = pair_u(xg, xj, vg_valid, vj, pm)
            out_i, out_j, tallies = term_fn(dx, us, valid, ex_i, exj,
                                            half=True)
            acc_i = acc_i + out_i + gridforce._roll3(out_j, off, +1)
            if tallies is not None:
                acc_t = (acc_t + tallies if acc_t is not None else tallies)
        return acc_i, acc_t

    # ---- pass 1: density --------------------------------------------------
    def rho_term(dx, us, valid, ex_i, ex_j, half):
        g = jnp.where(valid, _clenshaw(tabs["g"], us, u_lo, u_hi), 0.0)
        return g.sum(-1), g.sum(-2), None

    rho, _ = roll_pass(rho_term)
    rho = jnp.where(vg_valid, rho, 0.0)
    s_lo, s_hi = tabs["s_range"]
    s = jnp.sqrt(jnp.clip(rho, rho_lo, rho_hi))
    fp = jnp.where(vg_valid,
                   _clenshaw(tabs["Fp_s"], s, s_lo, s_hi) / (2.0 * s), 0.0)

    # ---- pass 2: forces (+ pair energy/virial) ----------------------------
    want_e = eflag
    want_v = vflag

    def force_term(dx, us, valid, fp_i, fp_j, half):
        a = _clenshaw(tabs["a"], us, u_lo, u_hi)
        b = _clenshaw(tabs["b"], us, u_lo, u_hi)
        fpair = jnp.where(valid, -((fp_i + fp_j) * a + b), 0.0)
        fij = dx * fpair[..., None]
        tallies = None
        if want_e or want_v:
            # single-process tally: every valid atom is owned (the dense
            # EAM path is single-chip; multi-chip EAM uses the matrix path)
            w_i = og[..., :, None].astype(dt)
            w = w_i if half else w_i * 0.5
            parts = []
            if want_e:
                phi = jnp.where(valid,
                                _clenshaw(tabs["phi"], us, u_lo, u_hi), 0.0)
                parts.append(jnp.sum(phi * w))
            if want_v:
                wf = fpair * w
                parts.extend([
                    jnp.sum(wf * dx[..., 0] * dx[..., 0]),
                    jnp.sum(wf * dx[..., 1] * dx[..., 1]),
                    jnp.sum(wf * dx[..., 2] * dx[..., 2]),
                    jnp.sum(wf * dx[..., 0] * dx[..., 1]),
                    jnp.sum(wf * dx[..., 0] * dx[..., 2]),
                    jnp.sum(wf * dx[..., 1] * dx[..., 2]),
                ])
            tallies = jnp.stack(parts)
        return jnp.sum(fij, axis=-2), -jnp.sum(fij, axis=-3), tallies

    f_grid, tallies = roll_pass(force_term, extra=fp)
    f_flat = f_grid.reshape(-1, 3)

    pe = virial = None
    idx = 0
    if eflag:
        e_embed = jnp.sum(jnp.where(
            og, _clenshaw(tabs["F"], s, s_lo, s_hi)
            + jnp.where(rho > rho_hi, fp * (rho - rho_hi), 0.0), 0.0))
        pe = e_embed + tallies[0]
        idx = 1
    if vflag:
        virial = tallies[idx:idx + 6]

    if scatter_idx is None:
        f = f_flat
    else:
        f = jnp.zeros_like(state.x)
        f = f.at[scatter_idx].set(f_flat, mode="drop")
    return f, pe, virial
