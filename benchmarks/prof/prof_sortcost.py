"""Cost of a full (column, z) lexsort-based rebuild on TPU — the rebuild
primitive for the z-window layout. Also times searchsorted-style window
computation.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/prof/prof_sortcost.py
"""
import functools
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, n1=20, n2=60):
    @functools.partial(jax.jit, static_argnums=0)
    def run(k, *a):
        def body(c, _):
            return f(c, *a[1:]), None
        return jax.lax.scan(body, a[0], None, length=k)[0]

    jax.block_until_ready(run(n1, *args))
    t0 = time.perf_counter()
    jax.block_until_ready(run(n1, *args))
    t1 = time.perf_counter() - t0
    jax.block_until_ready(run(n2, *args))
    t0 = time.perf_counter()
    jax.block_until_ready(run(n2, *args))
    t2 = time.perf_counter() - t0
    return (t2 - t1) / (n2 - n1) * 1e3


rng = np.random.default_rng(0)

for cap in (55296,):
    keys = jnp.asarray(rng.random(cap, dtype=np.float32) * 1e4)
    vals = jnp.asarray(np.arange(cap, dtype=np.int32))

    def do_sort(c, vals=vals):
        k2, v2 = jax.lax.sort_key_val(c, vals)
        return k2 + 1e-30 * v2.astype(jnp.float32)

    print(f"cap={cap}: sort_key_val {timeit(do_sort, keys):.3f} ms",
          file=sys.stderr)

    # one permute gather of the packed state (10 f32 columns)
    mat = jnp.asarray(rng.random((cap, 10), dtype=np.float32))
    perm = jnp.asarray(rng.permutation(cap).astype(np.int32))

    def do_perm(c, perm=perm):
        return c[perm]

    print(f"cap={cap}: row permute [cap,10] {timeit(do_perm, mat):.3f} ms",
          file=sys.stderr)

# searchsorted: [nchunk, 5] windows against per-column sorted z
nchunk, S = 4096, 256
zcols = jnp.asarray(np.sort(rng.random((144, S), dtype=np.float32), axis=1))
targets = jnp.asarray(rng.random((144, 28, 5), dtype=np.float32))


def do_ss(c, targets=targets):
    # vectorized binary search: 8 iterations over [144, 28*5]
    t = targets.reshape(144, -1)
    lo = jnp.zeros(t.shape, jnp.int32)
    hi = jnp.full(t.shape, S, jnp.int32)
    for _ in range(8):
        mid = (lo + hi) // 2
        v = jnp.take_along_axis(c, mid, axis=1)
        go = v < t
        lo = jnp.where(go, mid + 1, lo)
        hi = jnp.where(go, hi, mid)
    return c + 1e-30 * lo.astype(jnp.float32).sum()


print(f"searchsorted [144x140] 8 iters: {timeit(do_ss, zcols):.3f} ms",
      file=sys.stderr)
