"""Measure per-step gather cost for a compacted candidate-tile design.

Design under test: at rebuild, compact the 14x32 dense candidate window of
each 8-atom chunk to K tiles of 32 lanes of REAL candidates (indices);
each step, gather candidate positions x[idx] -> [nchunk, K*32, 3|4] and run
the pair math on the compacted lanes. The question: what does the per-step
gather cost on TPU vs the dense kernel's 0.33 ms?

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/prof/prof_gather.py
"""
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, n1=20, n2=60):
    import functools

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


cap = 55296
rng = np.random.default_rng(0)
x4 = jnp.asarray(rng.random((cap, 4), dtype=np.float32))
x3 = x4[:, :3]

for nchunk, K in ((4096, 256),):
    # clustered indices: each chunk draws from a local window (like a cell
    # neighborhood), sorted within the chunk
    base = rng.integers(0, cap - 2048, size=(nchunk, 1))
    idx = base + np.sort(rng.integers(0, 2048, size=(nchunk, K)), axis=1)
    idx = jnp.asarray(idx.astype(np.int32))

    def g_rows4(c, idx=idx):
        y = c[idx]          # [nchunk, K, 4]
        return c.at[0, 0].add(jnp.sum(y) * 1e-30)

    def g_rows3(c, idx=idx):
        y = c[idx]
        return c.at[0, 0].add(jnp.sum(y) * 1e-30)

    t4 = timeit(g_rows4, x4)
    t3 = timeit(g_rows3, x3)
    print(f"nchunk={nchunk} K={K}: gather rows4 {t4:.4f} ms  "
          f"rows3 {t3:.4f} ms", file=sys.stderr)

# scalar-component gather (three separate [cap] gathers)
xs = x4[:, 0].copy()
idx = jnp.asarray((np.sort(rng.integers(0, cap, size=(4096, 256)), axis=1)
                   ).astype(np.int32))


def g_scalar(c, idx=idx):
    y = c[idx]
    return c.at[0].add(jnp.sum(y) * 1e-30)


print(f"scalar gather [4096,256] from [cap]: {timeit(g_scalar, xs):.4f} ms",
      file=sys.stderr)

# take_along_axis style within cells: [ntot, cc] -> windowed
print("done", file=sys.stderr)
