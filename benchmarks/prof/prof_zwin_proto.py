"""Prototype the z-window column kernel inner loop (throughput only).

Per program (one xy-column): npc chunks of 8 own atoms; per chunk,
assemble a [1, 256] candidate vector per component from 5 dynamic-offset
window slices of neighbor columns, run the LJ pair math on [8, 256], do
forward + reverse reductions, and scatter-add the reverse into the
windows. Numbers are fake (windows from a synthetic starts array) — this
measures THROUGHPUT of the op mix, not physics.

32k-equivalent: ncol=144, S=256, SE=320, npc=32, W=(32,56x4)->256 lanes.
Compare against the shipped column_half kernel's 0.327 ms/step.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/prof/prof_zwin_proto.py
"""
import functools
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NCOL, S, G = 144, 256, 32
SE = S + 2 * G
NPC = S // 8
WS, WN = 32, 56
NLANE = WS + 4 * WN  # 256
CUTSQ = 6.25
LJ1, LJ2 = 48.0, 24.0


def kernel(starts_ref, prd_ref, ex, ey, ez, xT, yT, zT,
           fTx, fTy, fTz, fLx, fLy, fLz, cand, bias_ref):
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        z = jnp.zeros_like(fLx)
        fLx[...] = z
        fLy[...] = z
        fLz[...] = z

    # static newton bias for the self-forward segment: lane (global cand
    # slot offset) <= sublane (own offset) -> +BIG
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, NLANE), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, NLANE), 0)
    bias_ref[...] = jnp.where((lane < WS) & (lane <= sub), 1e9, 0.0)

    # 4 neighbor columns (fake: pid +/- 1, +/- 12 with wrap)
    nb = [(pid + 1) % NCOL, (pid + NCOL - 1) % NCOL,
          (pid + 12) % NCOL, (pid + NCOL - 12) % NCOL]

    def chunk(k, _):
        # assemble candidates: self-forward (static offset) + 4 windows
        for ci, ref in enumerate((ex, ey, ez)):
            cand[ci, 0, 0:WS] = ref[pid, pl.ds(G + k * 8, WS)]
        for w in range(4):
            st = starts_ref[0, 0, w]  # fake: same start for all chunks
            stk = st + k  # vary a bit
            for ci, ref in enumerate((ex, ey, ez)):
                cand[ci, 0, WS + w * WN:WS + (w + 1) * WN] = \
                    ref[nb[w], pl.ds(stk, WN)]

        ox = xT[pl.ds(k * 8, 8), pl.ds(pid, 1)]  # [8, 1]
        oy = yT[pl.ds(k * 8, 8), pl.ds(pid, 1)]
        oz = zT[pl.ds(k * 8, 8), pl.ds(pid, 1)]
        dx = ox - cand[0]
        dy = oy - cand[1]
        dz = oz - cand[2]
        r2 = dx * dx + dy * dy + dz * dz + bias_ref[...]
        valid = r2 < CUTSQ
        y0 = pl.reciprocal(r2, approx=True)
        r2i = y0 * (2.0 - r2 * y0)
        r6 = r2i * r2i * r2i
        fp = jnp.where(valid, r6 * (LJ1 * r6 - LJ2) * r2i, 0.0)
        fijx = dx * fp
        fijy = dy * fp
        fijz = dz * fp
        fTx[pl.ds(k * 8, 8), pl.ds(pid, 1)] = jnp.sum(
            fijx, axis=1, keepdims=True)
        fTy[pl.ds(k * 8, 8), pl.ds(pid, 1)] = jnp.sum(
            fijy, axis=1, keepdims=True)
        fTz[pl.ds(k * 8, 8), pl.ds(pid, 1)] = jnp.sum(
            fijz, axis=1, keepdims=True)
        rx = jnp.sum(fijx, axis=0, keepdims=True)
        ry = jnp.sum(fijy, axis=0, keepdims=True)
        rz = jnp.sum(fijz, axis=0, keepdims=True)
        fLx[pid, pl.ds(G + k * 8, WS)] += -rx[0, 0:WS]
        fLy[pid, pl.ds(G + k * 8, WS)] += -ry[0, 0:WS]
        fLz[pid, pl.ds(G + k * 8, WS)] += -rz[0, 0:WS]
        for w in range(4):
            st = starts_ref[0, 0, w] + k
            fLx[nb[w], pl.ds(st, WN)] += -rx[0, WS + w * WN:WS + (w + 1) * WN]
            fLy[nb[w], pl.ds(st, WN)] += -ry[0, WS + w * WN:WS + (w + 1) * WN]
            fLz[nb[w], pl.ds(st, WN)] += -rz[0, WS + w * WN:WS + (w + 1) * WN]
        return ()

    jax.lax.fori_loop(0, NPC, chunk, (), unroll=True)


@jax.jit
def run(ex, ey, ez, xT, yT, zT, starts, prd):
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    colT = full
    out_colT = full
    return pl.pallas_call(
        kernel,
        grid=(NCOL,),
        in_specs=[
            pl.BlockSpec((1, NPC, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            full, full, full, colT, colT, colT,
        ],
        out_specs=[out_colT] * 3 + [full] * 3,
        out_shape=[jax.ShapeDtypeStruct((S, NCOL), jnp.float32)] * 3
        + [jax.ShapeDtypeStruct((NCOL, SE), jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((3, 1, NLANE), jnp.float32),
                        pltpu.VMEM((8, NLANE), jnp.float32)],
    )(starts, prd, ex, ey, ez, xT, yT, zT)


rng = np.random.default_rng(0)
ex = jnp.asarray(rng.random((NCOL, SE), dtype=np.float32) * 30)
ey = jnp.asarray(rng.random((NCOL, SE), dtype=np.float32) * 30)
ez = jnp.asarray(rng.random((NCOL, SE), dtype=np.float32) * 30)
xT = jnp.asarray(rng.random((S, NCOL), dtype=np.float32) * 30)
yT = jnp.asarray(rng.random((S, NCOL), dtype=np.float32) * 30)
zT = jnp.asarray(rng.random((S, NCOL), dtype=np.float32) * 30)
starts = jnp.asarray(
    rng.integers(0, SE - WN - NPC - 1, size=(NCOL, NPC, 4)).astype(np.int32))
prd = jnp.asarray(np.array([33.6, 33.6, 33.6], np.float32))

out = run(ex, ey, ez, xT, yT, zT, starts, prd)
jax.block_until_ready(out)


@functools.partial(jax.jit, static_argnums=0)
def loop(n, ex, ey, ez, xT, yT, zT, starts, prd):
    def body(c, _):
        o = run(c, ey, ez, xT, yT, zT, starts, prd)
        return c + 1e-30 * o[3], None
    return jax.lax.scan(body, ex, None, length=n)[0]


jax.block_until_ready(loop(20, ex, ey, ez, xT, yT, zT, starts, prd))
t0 = time.perf_counter()
jax.block_until_ready(loop(20, ex, ey, ez, xT, yT, zT, starts, prd))
t1 = time.perf_counter() - t0
jax.block_until_ready(loop(60, ex, ey, ez, xT, yT, zT, starts, prd))
t0 = time.perf_counter()
jax.block_until_ready(loop(60, ex, ey, ez, xT, yT, zT, starts, prd))
t2 = time.perf_counter() - t0
per = (t2 - t1) / 40 * 1e3
print(f"zwin proto kernel: {per:.4f} ms/call "
      f"(vs column_half 0.327) -> proj {32000/(per+0.06)/1e3:.0f} K... "
      f"{32000/((per+0.062)*1e-3)/1e6:.1f} M atom-steps/s with overhead",
      file=sys.stderr)
