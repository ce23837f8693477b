"""Microbench: dynamic lane-window extraction options inside Pallas TPU.

The plain dynamic lane slice (ref[c, pl.ds(s, W)]) crashes Mosaic. Try:
  a) pltpu.roll with a traced shift, then static [0:W] slice
  b) dynamic slice on a 2D [1, G] view (sublane=1)
  c) two aligned tile loads + select-merge (manual vror)
"""
import time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = 512      # ext rows per column (lanes)
W = 128      # window width to extract
NCH = 20     # chunks per column
NCOL = 128   # columns


def kern_roll(starts_ref, ext_ref, out_ref):
    c = pl.program_id(0)
    acc = jnp.zeros((8, W), jnp.float32)
    row = ext_ref[c]                    # [G]
    for t in range(NCH):
        s = starts_ref[c, t]
        rolled = pltpu.roll(row, -s, 0)  # dynamic shift
        acc = acc + rolled[None, 0:W]
    out_ref[c] = jnp.sum(acc, axis=0)


def kern_roll2d(starts_ref, ext_ref, out_ref):
    c = pl.program_id(0)
    acc = jnp.zeros((8, W), jnp.float32)
    row = ext_ref[c][None, :]            # [1, G]
    for t in range(NCH):
        s = starts_ref[c, t]
        rolled = pltpu.roll(row, -s, 1)  # dynamic lane roll on 2D
        acc = acc + rolled[:, 0:W]
    out_ref[c] = jnp.sum(acc, axis=0)


def kern_ds2d(starts_ref, ext_ref, out_ref):
    c = pl.program_id(0)
    acc = jnp.zeros((8, W), jnp.float32)
    for t in range(NCH):
        s = starts_ref[c, t]
        win = jax.lax.dynamic_slice(ext_ref[c][None, :], (0, s), (1, W))
        acc = acc + win
    out_ref[c] = jnp.sum(acc, axis=0)


def run(kern, name):
    f = pl.pallas_call(
        kern,
        grid=(NCOL,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NCOL, W), jnp.float32),
    )
    starts = jnp.clip(jnp.arange(NCOL * NCH, dtype=jnp.int32).reshape(NCOL, NCH) * 7 % (G - W), 0, G - W)
    ext = jnp.ones((NCOL, G), jnp.float32)

    @jax.jit
    def loop(starts, ext):
        def body(c, _):
            return c + 1e-30 * f(starts, c), None
        out, _ = jax.lax.scan(body, ext[:, :W] * 0, None, length=50)
        return out

    try:
        r = loop(starts, ext); jax.block_until_ready(r)
        t0 = time.perf_counter(); r = loop(starts, ext); jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / 50
        per_slice_ns = dt / (NCOL * NCH) * 1e9
        print(f"{name}: {dt*1e3:.4f} ms/iter -> {per_slice_ns:.0f} ns per window")
    except Exception as e:
        print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:200]}")


run(kern_roll, "roll-1d-dyn")
run(kern_roll2d, "roll-2d-dyn")
run(kern_ds2d, "dynslice-2d")
