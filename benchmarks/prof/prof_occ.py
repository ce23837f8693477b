import jax, jax.numpy as jnp, numpy as np, sys
from lammps_kokkos_port_tpu.presets import lj_melt_sim
sim = lj_melt_sim(cells=20, t_init=1.44, seed=87287, dtype=jnp.float32,
                  every=20, delay=0, check=False)
sim.setup()
runner = sim._get_segment_runner()
s, l = sim.state, sim.nl
p = l.params
nxyz = p.ncells
maxo = 0
for seg in range(10):
    s, l = runner(s, l, 200)
    # count occupancy from the sorted layout mask
    m = np.asarray(jax.device_get(s.mask)).reshape(p.total_cells, p.cell_cap)
    occ = (m != 0).sum(axis=1)
    maxo = max(maxo, int(occ.max()))
    print(f"steps {200*(seg+1)}: max occ {int(occ.max())}, mean {occ.mean():.1f}, overflow {bool(jax.device_get(l.overflow))}", file=sys.stderr)
print("final max:", maxo, file=sys.stderr)
