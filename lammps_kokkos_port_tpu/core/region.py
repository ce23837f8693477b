"""Device-side region membership for jit fixes.

The script's regions (block/sphere/cylinder/prism) resolve to a static,
hashable geometry record whose `match(x)` is pure jnp — the analog of
`Region::match` called from inside fix hot loops (ref: src/region.h:52,
region->prematch/match in fix_setforce.cpp, fix_oneway.cpp, fix_heat.cpp).
Open faces (EDGE) are baked to the box bounds at fix-build time: the
reference's non-moving regions behave identically.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

Array = jax.Array

_BIG = 1.0e30


@dataclasses.dataclass(frozen=True)
class RegionMatch:
    """style: block | sphere | cylinder; params per style (box units):
    block: (xlo,xhi,ylo,yhi,zlo,zhi); sphere: (cx,cy,cz,r);
    cylinder: (axis 0/1/2, c1, c2, r, lo, hi). side "out" inverts."""

    style: str
    params: tuple
    side: str = "in"

    def match(self, x: Array) -> Array:
        p = self.params
        if self.style in ("block", "prism"):
            lo = jnp.asarray(p[0::2][:3], x.dtype)
            hi = jnp.asarray(p[1::2][:3], x.dtype)
            inside = jnp.all((x >= lo) & (x <= hi), axis=-1)
        elif self.style == "sphere":
            c = jnp.asarray(p[:3], x.dtype)
            d2 = jnp.sum((x - c) ** 2, axis=-1)
            inside = d2 <= p[3] * p[3]
        elif self.style == "cylinder":
            ax = int(p[0])
            d1, d2_ = [d for d in range(3) if d != ax]
            rr = ((x[..., d1] - p[1]) ** 2 + (x[..., d2_] - p[2]) ** 2)
            inside = (rr <= p[3] * p[3]) & (x[..., ax] >= p[4]) \
                & (x[..., ax] <= p[5])
        else:
            raise ValueError(self.style)
        return ~inside if self.side == "out" else inside
