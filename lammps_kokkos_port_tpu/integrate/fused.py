"""Fused planar NVE segment for the sorted (cell-major) state mode.

The generic step (integrate/verlet.make_step) pays ~0.12 ms/step at 32k
atoms in per-step glue: [cap,3] <-> planar transposes feeding the Pallas
column kernel, a mass-by-type gather per half kick, and pytree/aux
bookkeeping — measured against the bare kernel on real TPU
(benchmarks/prof). This runner removes all of it for the bench-critical
NVE + bare-pair case: the lax.scan carry IS the planar grid layout
(gx..gz, vx..vz, fx..fz as [nxy, nz, cc]), per-row kick factors
dtfm = dtf/m and drift factors are precomputed once per rebuild (exactly
the reference's per-atom `dtfm` precompute, ref: src/fix_nve.cpp:64-141),
and the full State pytree is only reassembled inside the (1-in-every)
rebuild branch and at segment exit.

This is the TPU analog of the Kokkos fused Verlet loop's
final+initial-integrate fusion (ref: src/KOKKOS/verlet_kokkos.cpp:622-637
fuse_check): between rebuilds the step is kernel + 12 planar fma ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.state import State
from ..ops import pallas_pair, sortedforce

Array = jax.Array


def _split_planar(a, nxy, nz, cc):
    g = a.reshape(nxy, nz, cc, 3)
    return g[..., 0], g[..., 1], g[..., 2]


def _stack_rows(xyz):
    x, y, z = xyz
    cap = x.size
    return jnp.stack([x.reshape(cap), y.reshape(cap), z.reshape(cap)],
                     axis=-1)


def force_planar(key, params, cap, gx, gy, gz, gi, prd):
    """Dispatch to the column (whole grid in VMEM) or plane (slab
    streaming) kernel on the planar layout."""
    nx, ny, nz = params.ncells
    cc = params.cell_cap
    if cap <= pallas_pair._VMEM_ROW_LIMIT:
        return pallas_pair.column_half_force_pallas(
            key, params.ncells, cap, gx, gy, gz, gi, prd)
    rs = lambda a: a.reshape(nx, ny, nz, cc)
    if nx >= 2 and pallas_pair.plane_half_fits(params):
        fx, fy, fz = pallas_pair.slab_half_force_pallas(
            key, params.ncells, rs(gx), rs(gy), rs(gz), rs(gi), prd)
    else:
        fx, fy, fz = pallas_pair.plane_force_pallas(
            key, params.ncells, rs(gx), rs(gy), rs(gz), rs(gi), prd)
    back = lambda a: a.reshape(nx * ny, nz, cc)
    return back(fx), back(fy), back(fz)


def make_sorted_nve_segment(integrator, style, special=None):
    """Segment runner (state, nl, nsteps) -> (state, nl) for sorted mode
    with a plain NVE integrator and no fixes. Matches make_step's
    ordering exactly: kick+drift, rebuild decision, force, final kick.

    With a purely cadence-driven rebuild policy (check=False), the
    per-step `lax.cond` is replaced by a static schedule: scan plain
    steps up to the next rebuild, take one rebuild step, then scan
    (every-1)-step blocks. The cond costs ~0.06 ms/step at 32k atoms
    (measured: full-carry branch plumbing per step), i.e. ~20% of the
    whole step — the static structure eliminates it. The rebuild phase
    (steps until the next rebuild) is read from nl.ago on the host once
    per segment and baked in as a static arg."""
    key = style.kernel_key()
    dt = integrator.dt
    dtf = integrator.dtf
    groupbit = integrator.groupbit

    def runner(state: State, nl, nsteps: int):
        p = nl.params
        nx, ny, nz = p.ncells
        nxy = nx * ny
        cc = p.cell_cap
        cap = state.capacity
        grid = lambda a: a.reshape(nxy, nz, cc)
        prd = state.box.prd.astype(state.dtype)
        half_skin_sq = (0.5 * p.skin) ** 2

        def row_factors(st: State):
            gm = st.valid_mask & st.group_mask(groupbit)
            dtfm = jnp.where(gm, dtf / st.per_atom_mass,
                             jnp.zeros((), st.dtype))
            dtv = jnp.where(gm, jnp.asarray(dt, st.dtype),
                            jnp.zeros((), st.dtype))
            ids = jnp.where(st.valid_mask,
                            jnp.arange(cap, dtype=jnp.int32),
                            -1).astype(st.dtype)
            return grid(dtfm), grid(dtv), grid(ids)

        def planar(st: State):
            return (_split_planar(st.x, nxy, nz, cc),
                    _split_planar(st.v, nxy, nz, cc),
                    _split_planar(st.f, nxy, nz, cc))

        def do_rebuild(xs, vs, fs, rowf, st, nl):
            # reassemble the pytree, wrap, permute into the new binning,
            # and re-derive the planar carries (1-in-every steps)
            st = st.replace(x=_stack_rows(xs), v=_stack_rows(vs),
                            f=_stack_rows(fs))
            x, image = st.box.wrap(st.x, st.image)
            st = st.replace(x=x, image=image)
            st, nl2 = sortedforce.rebuild_state(st, nl, special=special)
            xs, vs, fs = planar(st)
            return xs, vs, fs, row_factors(st) + (xs,), st, nl2

        def no_rebuild(xs, vs, fs, rowf, st, nl):
            return xs, vs, fs, rowf, st, sortedforce.tick(nl)

        def needs_rebuild(xs, rowf, nl):
            ago = nl.ago + 1
            cadence = (ago >= p.delay) & (jnp.mod(ago, max(p.every, 1)) == 0)
            if not p.check:
                return cadence
            ids = rowf[2]
            hx, hy, hz = rowf[3]
            d2 = ((xs[0] - hx) ** 2 + (xs[1] - hy) ** 2
                  + (xs[2] - hz) ** 2)
            d2 = jnp.where(ids >= 0, d2, 0.0)
            return cadence & (jnp.max(d2) > half_skin_sq)

        def body(c, _):
            xs, vs, fs, rowf, st, nl = c
            dtfm, dtv = rowf[0], rowf[1]
            # kick + drift (ref: fix_nve.cpp initial_integrate)
            vs = tuple(v + dtfm * f for v, f in zip(vs, fs))
            xs = tuple(x + dtv * v for x, v in zip(xs, vs))

            rebuild = needs_rebuild(xs, rowf, nl)
            xs, vs, fs, rowf, st, nl = jax.lax.cond(
                rebuild, do_rebuild, no_rebuild, xs, vs, fs, rowf, st, nl)

            fs = force_planar(key, p, cap, xs[0], xs[1], xs[2], rowf[2],
                              prd)
            # final kick
            vs = tuple(v + rowf[0] * f for v, f in zip(vs, fs))
            return (xs, vs, fs, rowf, st, nl), None

        xs, vs, fs = planar(state)
        carry = (xs, vs, fs, row_factors(state) + (xs,), state, nl)
        (xs, vs, fs, rowf, st, nl), _ = jax.lax.scan(
            body, carry, None, length=nsteps)
        st = st.replace(
            x=_stack_rows(xs), v=_stack_rows(vs), f=_stack_rows(fs),
            ntimestep=st.ntimestep + nsteps)
        from ..ops import neighbor as _nbr

        return _nbr.poison_on_overflow(st, nl), nl

    def runner_static(state: State, nl, nsteps: int, phase: int):
        """Cond-free variant for check=False: the rebuild schedule is
        static. `phase` = steps until the first rebuild (1-based)."""
        p = nl.params
        nx, ny, nz = p.ncells
        nxy = nx * ny
        cc = p.cell_cap
        cap = state.capacity
        grid = lambda a: a.reshape(nxy, nz, cc)
        prd = state.box.prd.astype(state.dtype)
        every = max(p.every, 1)

        def row_factors(st: State):
            gm = st.valid_mask & st.group_mask(groupbit)
            dtfm = jnp.where(gm, dtf / st.per_atom_mass,
                             jnp.zeros((), st.dtype))
            dtv = jnp.where(gm, jnp.asarray(dt, st.dtype),
                            jnp.zeros((), st.dtype))
            ids = jnp.where(st.valid_mask,
                            jnp.arange(cap, dtype=jnp.int32),
                            -1).astype(st.dtype)
            return grid(dtfm), grid(dtv), grid(ids)

        def planar(st: State):
            return (_split_planar(st.x, nxy, nz, cc),
                    _split_planar(st.v, nxy, nz, cc),
                    _split_planar(st.f, nxy, nz, cc))

        def plain_block(c, k):
            if k <= 0:
                return c

            def body(c, _):
                xs, vs, fs, rowf, st, nl = c
                dtfm, dtv = rowf[0], rowf[1]
                vs = tuple(v + dtfm * f for v, f in zip(vs, fs))
                xs = tuple(x + dtv * v for x, v in zip(xs, vs))
                fs = force_planar(key, p, cap, xs[0], xs[1], xs[2],
                                  rowf[2], prd)
                vs = tuple(v + rowf[0] * f for v, f in zip(vs, fs))
                nl2 = sortedforce.tick(nl)
                return (xs, vs, fs, rowf, st, nl2), None

            return jax.lax.scan(body, c, None, length=k)[0]

        def rebuild_step(c):
            xs, vs, fs, rowf, st, nl = c
            dtfm, dtv = rowf[0], rowf[1]
            vs = tuple(v + dtfm * f for v, f in zip(vs, fs))
            xs = tuple(x + dtv * v for x, v in zip(xs, vs))
            st = st.replace(x=_stack_rows(xs), v=_stack_rows(vs),
                            f=_stack_rows(fs))
            x, image = st.box.wrap(st.x, st.image)
            st = st.replace(x=x, image=image)
            st, nl = sortedforce.rebuild_state(st, nl, special=special)
            xs, vs, fs = planar(st)
            rowf = row_factors(st)
            fs = force_planar(key, p, cap, xs[0], xs[1], xs[2], rowf[2],
                              prd)
            vs = tuple(v + rowf[0] * f for v, f in zip(vs, fs))
            return (xs, vs, fs, rowf, st, nl)

        xs, vs, fs = planar(state)
        c = (xs, vs, fs, row_factors(state), state, nl)
        done = 0
        first = min(phase, nsteps)
        c = plain_block(c, first - 1)
        if first == phase:
            c = rebuild_step(c)
        else:
            c = plain_block(c, 1)
        done = first
        nblocks = (nsteps - done) // every
        if nblocks > 0:
            def blk(c, _):
                c = plain_block(c, every - 1)
                return rebuild_step(c), None

            c = jax.lax.scan(blk, c, None, length=nblocks)[0]
            done += nblocks * every
        c = plain_block(c, nsteps - done)

        xs, vs, fs, rowf, st, nl = c
        st = st.replace(
            x=_stack_rows(xs), v=_stack_rows(vs), f=_stack_rows(fs),
            ntimestep=st.ntimestep + nsteps)
        from ..ops import neighbor as _nbr

        return _nbr.poison_on_overflow(st, nl), nl

    jit_cond = jax.jit(runner, static_argnums=2)
    jit_static = jax.jit(runner_static, static_argnums=(2, 3))

    def dispatch(state, nl, nsteps: int):
        p = nl.params
        if p.check or p.delay > max(p.every, 1):
            return jit_cond(state, nl, nsteps)
        every = max(p.every, 1)
        ago0 = int(jax.device_get(nl.ago))
        # first rebuild fires at the step where (ago+1) % every == 0
        phase = every - (ago0 % every)
        return jit_static(state, nl, nsteps, phase)

    return dispatch
