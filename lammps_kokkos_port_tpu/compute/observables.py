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
