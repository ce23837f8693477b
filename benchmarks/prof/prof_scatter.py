"""Scatter/gather shapes at 1M rows: row-count vs bytes."""
import time
import jax, jax.numpy as jnp

def t(fn, *a, reps=5):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3

cap = 1257728
row = jnp.arange(cap, dtype=jnp.int32)
npos = jnp.flip(row)
key = jax.random.PRNGKey(0)

for C in (1, 4, 8, 16):
    data = jax.random.normal(key, (cap, C), dtype=jnp.float32)
    def scat(npos, data):
        out = jnp.zeros((cap, C), jnp.float32)
        return out.at[npos].set(data, mode="drop", unique_indices=True)
    print(f"scatter [cap,{C:2d}]: {t(jax.jit(scat), npos, data):6.2f} ms", flush=True)
    def gath(npos, data):
        return data[npos]
    print(f"gather  [cap,{C:2d}]: {t(jax.jit(gath), npos, data):6.2f} ms", flush=True)

# one-hot matmul gather alternative at cell-window level:
# [ntot, 32, 864] P @ [ntot, 864, C] -- batched
ntot = cap // 32
for C in (16,):
    P = jax.nn.one_hot(jax.random.randint(key, (ntot, 32), 0, 864), 864, dtype=jnp.bfloat16)
    Wd = jax.random.normal(key, (ntot, 864, C), dtype=jnp.float32)
    def mm(P, Wd):
        return jax.lax.dot_general(P.astype(jnp.float32), Wd, (((2,), (1,)), ((0,), (0,))))
    print(f"1hot mm [.,32,864]@[.,864,{C}]: {t(jax.jit(mm), P, Wd):6.2f} ms", flush=True)
