"""Occupancy + z-window statistics of the equilibrated 32k LJ melt.

Decides kernel sizing: (a) max cell occupancy vs mean (liquid S(0) << 1,
so cc can sit much closer to the mean than Poisson suggests); (b) the
static window W needed for a z-sorted column-window kernel (5-column
Newton half set).

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python -u benchmarks/prof/prof_occstats.py
"""
import sys

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from lammps_kokkos_port_tpu.presets import lj_melt_sim  # noqa: E402

sim = lj_melt_sim(cells=20, t_init=1.44, seed=87287, dtype=jnp.float32,
                  every=20, delay=0, check=False)
sim.setup()
sim.run(2000)  # equilibrate into the melt regime
st = sim.state
x = np.asarray(jax.device_get(st.x))
valid = np.asarray(jax.device_get(st.valid_mask))
x = x[valid]
prd = np.asarray(jax.device_get(st.box.prd))
n = len(x)
print(f"n={n} box={prd}", file=sys.stderr)

rc = 2.8  # force cutoff + skin

# (a) cell occupancy at cell size ~rc
for ncx in (12,):
    s = prd / ncx
    ci = np.floor(x / s).astype(int) % ncx
    code = (ci[:, 0] * ncx + ci[:, 1]) * ncx + ci[:, 2]
    occ = np.bincount(code, minlength=ncx ** 3)
    print(f"cells {ncx}^3 (s={s[0]:.3f}): occ mean {occ.mean():.2f} "
          f"std {occ.std():.2f} max {occ.max()}", file=sys.stderr)

# (b) z-window stats: columns of s x s in xy, atoms z-sorted per column
ncx = 12
s = prd / ncx
cxy = np.floor(x[:, :2] / s[:2]).astype(int) % ncx
col = cxy[:, 0] * ncx + cxy[:, 1]
order = np.lexsort((x[:, 2], col))
xs = x[order]
cols = col[order]
starts = np.searchsorted(cols, np.arange(ncx * ncx))
ends = np.searchsorted(cols, np.arange(ncx * ncx) + 1)
colz = [xs[starts[c]:ends[c], 2] for c in range(ncx * ncx)]
lens = np.array([len(z) for z in colz])
print(f"columns: atoms/col mean {lens.mean():.1f} std {lens.std():.2f} "
      f"max {lens.max()}", file=sys.stderr)

CH = 8  # own chunk size (z-consecutive atoms)
Lz = prd[2]
wmax_self = 0
wmax_near = 0
wall_near = []
wall_self = []
for c in range(ncx * ncx):
    z = colz[c]
    nc_ = len(z)
    for k0 in range(0, nc_, CH):
        zlo = z[k0]
        zhi = z[min(k0 + CH, nc_) - 1]
        # self column, forward only: [zlo, zhi + rc] (wrapped)
        w = np.sum(((z - zlo) % Lz <= (zhi + rc - zlo) % Lz + 0)
                   & (np.arange(nc_) >= k0))
        # conservative: count atoms with z in [zlo, zhi+rc] mod Lz
        span = (zhi - zlo) + rc
        d = (z - zlo) % Lz
        w = int(np.sum(d <= span)) - k0 if False else int(np.sum(d <= span))
        wall_self.append(w)
        # near columns: [zlo - rc, zhi + rc]
        spanf = (zhi - zlo) + 2 * rc
        d2 = (z - (zlo - rc)) % Lz
        w2 = int(np.sum(d2 <= spanf))
        wall_near.append(w2)

wall_self = np.array(wall_self)
wall_near = np.array(wall_near)
print(f"self fwd window: mean {wall_self.mean():.1f} "
      f"p99 {np.percentile(wall_self, 99):.0f} max {wall_self.max()}",
      file=sys.stderr)
print(f"near col window: mean {wall_near.mean():.1f} "
      f"p99 {np.percentile(wall_near, 99):.0f} max {wall_near.max()}",
      file=sys.stderr)
