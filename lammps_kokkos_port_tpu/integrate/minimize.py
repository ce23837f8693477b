"""Energy minimization: FIRE and conjugate-gradient styles.

TPU-native equivalent of the reference's Min hierarchy (ref: src/min.cpp
Min::run :429, src/min_cg.cpp MinCG::iterate :38, src/min_fire.cpp; Kokkos
twins min_cg_kokkos). FIRE runs as one fused lax.while_loop (zero host
round-trips, the natural TPU minimizer); CG uses Polak-Ribiere with
backtracking line search on the host (setup-time work, like the
reference's linemin).

Both re-evaluate the force pipeline (pair + bonded + kspace) through the
same ForceField/neighbor machinery as dynamics (ref: Min::energy_force,
src/min.cpp:503), rebuilding the list whenever atoms displace beyond half
the skin.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _energy_force(sim, state, nl):
    f, epair, emol, _ = sim.force_fn(state, nl, True, False)
    e = (epair if epair is not None else 0.0)
    if emol is not None:
        e = e + emol
    return e, f


def minimize_fire(
    sim,
    etol: float = 0.0,
    ftol: float = 1e-6,
    maxiter: int = 1000,
    dt_init: float | None = None,
    rebuild_every: int = 25,
):
    """FIRE minimization (Bitzek et al.); returns (state, info dict).

    Standard parameters (alpha0=0.1, f_inc=1.1, f_dec=0.5, n_min=5) as in
    the reference's min_fire.cpp defaults.
    """
    if sim.nl is None:
        sim.setup()
    state = sim.state
    nl = sim.nl
    dt0 = dt_init if dt_init is not None else sim.dt
    dtmax = 10.0 * dt0
    alpha0 = 0.1
    f_inc, f_dec, n_min = 1.1, 0.5, 5
    m = state.per_atom_mass[:, None]
    gmask = state.valid_mask[:, None]

    def segment(state, nl, niter: int):
        def cond(carry):
            st, v, dt, alpha, npos, it, fmax, e = carry
            return (it < niter) & (fmax > ftol)

        def body(carry):
            st, v, dt, alpha, npos, it, fmax, e = carry
            e, f = _energy_force(sim, st, nl)
            p = jnp.sum(f * v)
            fnorm = jnp.sqrt(jnp.sum(f * f))
            vnorm = jnp.sqrt(jnp.sum(v * v))
            v = jnp.where(
                p > 0,
                (1.0 - alpha) * v + alpha * f * (vnorm / jnp.maximum(fnorm, 1e-300)),
                jnp.zeros_like(v),
            )
            uphill = p <= 0
            npos = jnp.where(uphill, 0, npos + 1)
            grow = (~uphill) & (npos > n_min)
            dt = jnp.where(grow, jnp.minimum(dt * f_inc, dtmax), dt)
            alpha = jnp.where(grow, alpha * 0.99, alpha)
            dt = jnp.where(uphill, dt * f_dec, dt)
            alpha = jnp.where(uphill, alpha0, alpha)
            # semi-implicit Euler
            v = v + dt * sim.units.ftm2v * f / m
            v = jnp.where(gmask, v, 0.0)
            x = st.x + dt * v
            st = st.replace(x=jnp.where(gmask, x, st.x))
            fmax = jnp.max(jnp.abs(jnp.where(gmask, f, 0.0)))
            return st, v, dt, alpha, npos, it + 1, fmax, e

        v0 = jnp.zeros_like(state.v)
        carry = (state, v0, jnp.asarray(dt0, state.dtype),
                 jnp.asarray(alpha0, state.dtype), jnp.asarray(0),
                 jnp.asarray(0), jnp.asarray(jnp.inf, state.dtype),
                 jnp.asarray(0.0, state.dtype))
        st, v, dt, alpha, npos, it, fmax, e = jax.lax.while_loop(
            cond, body, carry
        )
        return st, it, fmax, e

    seg = jax.jit(segment, static_argnums=2)
    done = 0
    fmax = np.inf
    e = np.inf
    while done < maxiter and fmax > ftol:
        state, it, fmax_d, e_d = seg(state, nl, rebuild_every)
        # re-neighbor between segments (atoms can move far while relaxing)
        x, image = state.box.wrap(state.x, state.image)
        state = state.replace(x=x, image=image)
        nl = sim._build_list(state, nl.params)
        done += int(jax.device_get(it))
        fmax = float(jax.device_get(fmax_d))
        e_prev, e = e, float(jax.device_get(e_d))
        if abs(e_prev - e) < etol * max(abs(e), 1e-30):
            break
    sim.state = state
    sim.nl = nl
    return state, {"iterations": done, "fmax": fmax, "energy": e}


def minimize_cg(
    sim,
    etol: float = 1e-8,
    ftol: float = 1e-6,
    maxiter: int = 500,
    alpha0: float = 0.05,
):
    """Polak-Ribiere CG with backtracking line search (host-driven)."""
    if sim.nl is None:
        sim.setup()
    state = sim.state
    nl = sim.nl

    ef = jax.jit(lambda st: _energy_force(sim, st, nl))
    e, f = ef(state)
    e = float(e)
    d = f
    f_prev = f
    it = 0
    for it in range(1, maxiter + 1):
        fmax = float(jnp.max(jnp.abs(f)))
        if fmax < ftol:
            break
        # backtracking line search along d
        alpha = alpha0
        for _ in range(20):
            st_try = state.replace(x=state.x + alpha * d)
            e_try, f_try = ef(st_try)
            if float(e_try) < e:
                break
            alpha *= 0.5
        else:
            break
        state = state.replace(x=state.x + alpha * d)
        e_new = float(e_try)
        f_new = f_try
        beta = float(
            jnp.sum(f_new * (f_new - f_prev))
            / jnp.maximum(jnp.sum(f_prev * f_prev), 1e-300)
        )
        beta = max(beta, 0.0)
        d = f_new + beta * d
        f_prev = f_new
        if abs(e - e_new) < etol * max(abs(e_new), 1e-30):
            e = e_new
            f = f_new
            break
        e, f = e_new, f_new
        # periodic re-neighbor
        if it % 20 == 0:
            x, image = state.box.wrap(state.x, state.image)
            state = state.replace(x=x, image=image)
            nl = sim._build_list(state, nl.params)
            ef = jax.jit(lambda st, _nl=nl: _energy_force(sim, st, _nl))
    sim.state = state
    sim.nl = nl
    return state, {"iterations": it, "fmax": float(jnp.max(jnp.abs(f))),
                   "energy": e}
