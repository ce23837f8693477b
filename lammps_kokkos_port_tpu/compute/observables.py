"""Per-atom and aggregate computes: msd, rdf, com, ke/atom, pe/atom,
stress/atom.

TPU-native equivalents of the reference compute styles
(ref: src/compute_msd.cpp, src/compute_rdf.cpp, src/compute_com.cpp,
src/compute_ke_atom.cpp; SURVEY.md §2.9 computes row). All are pure jit
functions over the state; group selection via the mask bitmask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.state import State
from ..utils.units import get_units

Array = jax.Array


def unwrapped(state: State) -> Array:
    """Unwrapped coordinates from image flags (ref: domain->unmap)."""
    return state.box.unwrap(state.x, state.image)


def msd(state: State, x0_unwrapped: Array, groupbit: int = 1) -> Array:
    """[4]: dx^2, dy^2, dz^2, total — mean-square displacement vs a stored
    reference (ref: src/compute_msd.cpp)."""
    sel = state.valid_mask & state.group_mask(groupbit)
    n = jnp.maximum(jnp.sum(sel), 1)
    d = jnp.where(sel[:, None], unwrapped(state) - x0_unwrapped, 0.0)
    comps = jnp.sum(d * d, axis=0) / n
    return jnp.concatenate([comps, jnp.sum(comps, keepdims=True)])


def com(state: State, groupbit: int = 1) -> Array:
    """Center of mass (ref: src/compute_com.cpp / group->xcm)."""
    sel = state.valid_mask & state.group_mask(groupbit)
    m = jnp.where(sel, state.per_atom_mass, 0.0)
    return jnp.sum(m[:, None] * unwrapped(state), axis=0) / jnp.sum(m)


def ke_atom(state: State) -> Array:
    """[cap] per-atom kinetic energy (ref: src/compute_ke_atom.cpp)."""
    u = get_units(state.units_name)
    ke = (0.5 * u.mvv2e * state.per_atom_mass
          * jnp.sum(state.v * state.v, axis=-1))
    return jnp.where(state.valid_mask, ke, 0.0)


def pe_atom(sim, groupbit: int = 1) -> Array:
    """[cap] per-atom potential energy via the per-row tally convention.

    Approximated as the 0.5-weighted row sums of the pair terms (exact for
    pairwise styles; ref: eatom tally in src/pair.cpp ev_tally).
    """
    import jax.numpy as jnp

    from ..models.pair import gather_pairs

    st, nl = sim.state, sim.nl
    style = sim.forcefield.pair
    j, jc, pair_valid, dx, r2 = gather_pairs(st, nl)
    if style.ntypes == 1:
        cutsq = style.cutsq_table()[1, 1]
        ti = tj = None
    else:
        ti = st.type[:, None]
        tj = st.type[jc]
        cutsq = style.cutsq_table()[ti, tj]
    valid = pair_valid & (r2 < cutsq)
    r2s = jnp.where(valid, r2, 1.0)
    _, e = style.pair_terms(r2s, ti, tj, True)
    return 0.5 * jnp.sum(jnp.where(valid, e, 0.0), axis=1)


def rdf(state: State, nbins: int = 50, rmax: float | None = None,
        nl=None) -> tuple[Array, Array]:
    """Radial distribution function g(r) (ref: src/compute_rdf.cpp).

    Uses the neighbor matrix when given (fast) or all pairs otherwise.
    Returns (bin centers, g(r)).
    """
    n = state.nlocal.astype(state.dtype)
    vol = state.box.volume
    if rmax is None:
        rmax = float(jax.device_get(jnp.min(state.box.prd))) * 0.49

    if nl is not None and getattr(nl, "idx", None) is not None:
        from ..models.pair import gather_pairs

        j, jc, pv, dx, r2 = gather_pairs(state, nl)
        r = jnp.sqrt(jnp.where(pv, r2, jnp.inf))
        weights = jnp.ones_like(r)
        r_flat = r.reshape(-1)
        w_flat = weights.reshape(-1)
    else:
        cap = state.capacity
        dx = state.box.min_image(state.x[:, None, :] - state.x[None, :, :])
        r2 = jnp.sum(dx * dx, axis=-1)
        mask = (state.valid_mask[:, None] & state.valid_mask[None, :]
                & ~jnp.eye(cap, dtype=bool))
        r_flat = jnp.sqrt(jnp.where(mask, r2, jnp.inf)).reshape(-1)
        w_flat = jnp.ones_like(r_flat)

    bins = jnp.floor(r_flat / rmax * nbins).astype(jnp.int32)
    inb = (bins >= 0) & (bins < nbins) & jnp.isfinite(r_flat)
    hist = jnp.zeros(nbins, dtype=state.dtype).at[
        jnp.where(inb, bins, 0)
    ].add(jnp.where(inb, w_flat, 0.0))
    dr = rmax / nbins
    centers = (jnp.arange(nbins, dtype=state.dtype) + 0.5) * dr
    shell = 4.0 * jnp.pi * centers * centers * dr
    dens = n / vol
    g = hist / (shell * dens * n)
    return centers, g


def _voigt_rows(d: Array, f: Array) -> Array:
    """Per-row Voigt outer products: [N,3] x [N,3] -> [N,6]."""
    return jnp.stack([
        d[:, 0] * f[:, 0], d[:, 1] * f[:, 1], d[:, 2] * f[:, 2],
        d[:, 0] * f[:, 1], d[:, 0] * f[:, 2], d[:, 1] * f[:, 2],
    ], axis=-1)


def stress_atom(sim) -> Array:
    """[cap, 6] per-atom stress in pressure*volume units (Voigt
    xx,yy,zz,xy,xz,yz) — the NEGATIVE of the per-atom virial tally plus
    kinetic term, scaled by nktv2p (ref: src/compute_stress_atom.cpp:108-
    260; per-interaction shares split evenly among participants exactly as
    ev_tally/ev_tally3/ev_tally4 do in src/pair.cpp:1013, src/bond.cpp,
    src/angle.cpp, src/dihedral.cpp).

    Tallied: kinetic (m v_a v_b), pair (0.5 fpair dx dx per FULL-list
    row), bond (1/2 share), angle (1/3), dihedral/improper (1/4) and the
    CHARMM 1-4 pair term. KSpace per-atom virial is not tallied (the
    reference requires `kspace_modify ...` fftw decomposition there; out
    of scope).
    """
    from ..models.pair import gather_pairs

    st, nl = sim.state, sim.nl
    u = sim.units
    dt = st.dtype
    cap = st.capacity
    w = jnp.zeros((cap, 6), dtype=dt)

    # kinetic: m v_a v_b (ref: compute_stress_atom.cpp:197)
    v = st.v
    w = w + u.mvv2e * st.per_atom_mass[:, None] * _voigt_rows(v, v)

    ff = sim.forcefield
    style = getattr(ff, "pair", None) or (ff if not hasattr(ff, "pair")
                                          else None)
    if style is not None and hasattr(style, "pair_terms") and \
            getattr(nl, "idx", None) is not None:
        j, jc, pair_valid, dx, r2 = gather_pairs(st, nl)
        if style.ntypes == 1:
            ti = tj = None
            cutsq = style.cutsq_table()[1, 1]
        else:
            ti = st.type[:, None]
            tj = st.type[jc]
            cutsq = style.cutsq_table()[ti, tj]
        valid = pair_valid & (r2 < cutsq)
        r2s = jnp.where(valid, r2, 1.0)
        fpair, _ = style.pair_terms(r2s, ti, tj, False)
        fpair = jnp.where(valid, fpair, 0.0)
        if nl.sb is not None and ff.special is not None:
            fpair = fpair * jnp.asarray(ff.special.weights_lj,
                                        dtype=dt)[nl.sb]
        # each FULL-list row IS the atom's own half share
        hw = 0.5 * fpair
        pv = jnp.stack([
            jnp.sum(hw * dx[..., 0] * dx[..., 0], axis=1),
            jnp.sum(hw * dx[..., 1] * dx[..., 1], axis=1),
            jnp.sum(hw * dx[..., 2] * dx[..., 2], axis=1),
            jnp.sum(hw * dx[..., 0] * dx[..., 1], axis=1),
            jnp.sum(hw * dx[..., 0] * dx[..., 2], axis=1),
            jnp.sum(hw * dx[..., 1] * dx[..., 2], axis=1),
        ], axis=-1)
        w = w + pv

    top = getattr(ff, "topology", None)
    if top is not None and getattr(ff, "bond", None) is not None and \
            top.bonds.shape[0] and not hasattr(ff.bond, "compute"):
        t = top.bonds[:, 0]
        bi, bj = top.bonds[:, 1], top.bonds[:, 2]
        dx = st.box.min_image(st.x[jnp.clip(bi, 0, cap - 1)]
                              - st.x[jnp.clip(bj, 0, cap - 1)])
        g = jax.vmap(jax.grad(ff.bond.energy_one))(dx, t)
        g = jnp.where((t > 0)[:, None], g, 0.0)
        share = 0.5 * _voigt_rows(dx, -g)
        w = w.at[bi].add(share, mode="drop").at[bj].add(share, mode="drop")

    if top is not None and getattr(ff, "angle", None) is not None and \
            top.angles.shape[0] and not hasattr(ff.angle, "compute"):
        t = top.angles[:, 0]
        ai, aj, ak = top.angles[:, 1], top.angles[:, 2], top.angles[:, 3]
        d1 = st.box.min_image(st.x[jnp.clip(ai, 0, cap - 1)]
                              - st.x[jnp.clip(aj, 0, cap - 1)])
        d2 = st.box.min_image(st.x[jnp.clip(ak, 0, cap - 1)]
                              - st.x[jnp.clip(aj, 0, cap - 1)])
        g1, g2 = jax.vmap(jax.grad(ff.angle.energy_one, argnums=(0, 1)))(
            d1, d2, t)
        m = (t > 0)[:, None]
        g1 = jnp.where(m, g1, 0.0)
        g2 = jnp.where(m, g2, 0.0)
        share = (_voigt_rows(d1, -g1) + _voigt_rows(d2, -g2)) / 3.0
        for idx in (ai, aj, ak):
            w = w.at[idx].add(share, mode="drop")

    for which, attr in (("dihedrals", "dihedral"), ("impropers",
                                                    "improper")):
        styb = getattr(ff, attr, None)
        if top is None or styb is None or hasattr(styb, "compute"):
            continue
        arr = getattr(top, which)
        if not arr.shape[0]:
            continue
        t = arr[:, 0]
        a1, a2, a3, a4 = arr[:, 1], arr[:, 2], arr[:, 3], arr[:, 4]
        x1 = st.x[jnp.clip(a1, 0, cap - 1)]
        x2 = st.x[jnp.clip(a2, 0, cap - 1)]
        x3 = st.x[jnp.clip(a3, 0, cap - 1)]
        x4 = st.x[jnp.clip(a4, 0, cap - 1)]
        vb1 = st.box.min_image(x1 - x2)
        vb2 = st.box.min_image(x3 - x2)
        vb3 = st.box.min_image(x4 - x3)
        g1, g2, g3 = jax.vmap(
            jax.grad(styb.energy_one, argnums=(0, 1, 2)))(vb1, vb2, vb3, t)
        m = (t > 0)[:, None]
        g1 = jnp.where(m, g1, 0.0)
        g2 = jnp.where(m, g2, 0.0)
        g3 = jnp.where(m, g3, 0.0)
        f1, f3, f4 = -g1, -g2 + g3, -g3
        share = (_voigt_rows(vb1, f1) + _voigt_rows(vb2, f3)
                 + _voigt_rows(vb2 + vb3, f4)) / 4.0
        for idx in (a1, a2, a3, a4):
            w = w.at[idx].add(share, mode="drop")
        if getattr(styb, "weightflag", False):
            dx14 = st.box.min_image(x1 - x4)
            it = st.type[jnp.clip(a1, 0, cap - 1)]
            jt = st.type[jnp.clip(a4, 0, cap - 1)]
            qi = st.q[jnp.clip(a1, 0, cap - 1)]
            qj = st.q[jnp.clip(a4, 0, cap - 1)]
            gv = jax.vmap(jax.grad(styb.energy_14))(dx14, t, it, jt, qi, qj)
            gv = jnp.where(m, gv, 0.0)
            share14 = 0.5 * _voigt_rows(dx14, -gv)
            w = (w.at[a1].add(share14, mode="drop")
                  .at[a4].add(share14, mode="drop"))

    w = jnp.where(st.valid_mask[:, None], w, 0.0)
    return -u.nktv2p * w
