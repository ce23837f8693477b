"""Measure the XLA glue around the zcol kernel: ext build, extT transpose,
fold-back pieces."""
import time, sys
import jax, jax.numpy as jnp
from lammps_kokkos_port_tpu.presets import lj_melt_sim
from lammps_kokkos_port_tpu.ops import zcolforce

sim = lj_melt_sim(cells=20, t_init=1.44, seed=87287, dtype=jnp.float32,
                  every=20, delay=0, check=False)
sim.setup()
state, nl = sim.state, sim.nl
p = nl.params


def bench(name, fn, *args, n=200):
    f = jax.jit(fn)
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:.4f} ms", file=sys.stderr)
    return r


ext = bench("ext build", lambda s: zcolforce._ext_arrays(s, nl), state)
extT = bench("extT transpose", lambda e: e.transpose(0, 2, 1), ext)

import numpy as np
racc = jnp.asarray(np.random.randn(p.ncol, 3, p.G).astype(np.float32))
fT = jnp.asarray(np.random.randn(p.ncol, p.colcap, 3).astype(np.float32))


def fold(fT, racc):
    cap = p.capacity
    r = racc.transpose(0, 2, 1)
    rr = r[:, p.gh:p.gh + p.colcap]
    tail_idx = (nl.fills[:, None] + jnp.arange(p.gh, dtype=jnp.int32)[None, :]
                + p.gh)
    tail = jnp.take_along_axis(
        r, jnp.minimum(tail_idx, p.G - 1)[:, :, None], axis=1)
    rr = rr.at[:, :p.gh].add(tail)
    rows = jnp.arange(p.ncol, dtype=jnp.int32)[:, None]
    bi = jnp.where(nl.bot_idx >= 0, nl.bot_idx, p.colcap)
    rr = rr.at[rows, bi].add(r[:, :p.gh], mode="drop")
    return (fT + rr).reshape(cap, 3)


bench("fold-back", fold, fT, racc)
bench("fold.transpose only", lambda r: r.transpose(0, 2, 1).sum(), racc)
