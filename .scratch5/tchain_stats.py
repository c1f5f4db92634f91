import sys
sys.path.insert(0, "/root/repo")
import jax.numpy as jnp
from nimblephysics_tpu.models.humanoid import atlas_planner
from nimblephysics_tpu.ops.contact import lcp_dim
from nimblephysics_tpu.ops.lane_chain import _chains_for

planner, s0 = atlas_planner()
m = lcp_dim(planner)
nq, na = planner.nq, planner.num_actions
nx = 2 * nq
ch = _chains_for(planner, m, nx, na, jnp.float32, 16, 18000)
t = ch.tchain
no = nx + na
for ci in range(t.n_chunks):
    units = ch.tneed[ci]
    urows = sum(ch.units[ui].rows for ui in units)
    bin_ = t.bound_rows[ci-1] if ci > 0 else 0
    bout = t.bound_rows[ci] if ci < t.n_chunks-1 else no
    # per-grid-step blocks at S_b=1: rows*512B each; x2 double-buffered
    vmem = 2*(urows + bin_ + bout)*512//1024
    print(f"t{ci}: units_rows={urows} bnd_in={bin_} bnd_out={bout} "
          f"~vmem_blocks={vmem}KiB cost={t.chunk_costs[ci]}")
