"""Static per-chunk output accounting for the Atlas chained linearize —
measures the boundary/unit-pack overlap the dedupe removes (no compile)."""
import sys
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from nimblephysics_tpu.models.humanoid import atlas_planner
from nimblephysics_tpu.ops.contact import lcp_dim
from nimblephysics_tpu.ops.lane_chain import _chains_for

planner, s0 = atlas_planner()
m = lcp_dim(planner)
nq, na = planner.nq, planner.num_actions
nx = 2 * nq
ch = _chains_for(planner, m, nx, na, jnp.float32, 16, 18000)
pchain = ch.pchain
print(f"m={m} nq={nq} primal chunks={pchain.n_chunks} "
      f"tangent chunks={ch.tchain.n_chunks} units={len(ch.units)}")
L = max(u.ci for u in ch.units)
for ci in range(L + 1):
    wb = ci != L
    brows = pchain.bound_rows[ci] if wb else 0
    bset = set(pchain.bounds[ci]) if wb else set()
    urows = kept = 0
    for u in ch.units:
        if u.ci != ci:
            continue
        urows += u.rows
        for vp, (_, _, n) in zip(u.vars_p, u.metas):
            if vp not in bset:
                kept += n
    tot_old = brows + urows
    tot_new = brows + kept
    # per-grid-step out block bytes at S_b=1: rows * 128 lanes * 4 B
    print(f"p{ci}: bound_rows={brows} unit_rows={urows} kept={kept} "
          f"out_block_old={(tot_old*512)//1024}KiB "
          f"out_block_new={(tot_new*512)//1024}KiB cost={pchain.chunk_costs[ci]}")
