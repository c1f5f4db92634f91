import os, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from nimblephysics_tpu.models.model import State
from nimblephysics_tpu.ops.frozen_contact import planner_reduce_contacts, rollout_classes
from nimblephysics_tpu.utils.skel_parser import parse_skel
from nimblephysics_tpu.ops.lane_chain import chained_linearize_vjp

model, s0 = parse_skel("/root/reference/data/skel/half_cheetah.skel")
pl_ = planner_reduce_contacts(model, ["half_cheetah/b_foot", "half_cheetah/f_foot"])
B, T = 2, 3
x0 = jnp.tile(s0.flat()[None], (B, 1))
u = 0.05 * jax.random.normal(jax.random.PRNGKey(1), (B, T, pl_.num_actions), dtype=x0.dtype)
cls = jax.vmap(lambda xf, uu: rollout_classes(pl_, State.from_flat(xf), uu)[2])(x0, u)
nx = x0.shape[-1]
xs = jnp.broadcast_to(x0[:, None, :], (B, T, nx))

os.environ["NTPU_CHAIN_OUT_SEG_ROWS"] = "250"   # force multi-segment
fx_s, fu_s = chained_linearize_vjp(pl_, xs, u, (cls.cmask, cls.us), cg_iters=16, budget=8000)
os.environ["NTPU_CHAIN_OUT_SEG_ROWS"] = "99999999"
fx_r, fu_r = chained_linearize_vjp(pl_, xs, u, (cls.cmask, cls.us), cg_iters=16, budget=8000)
np.testing.assert_allclose(np.asarray(fx_s), np.asarray(fx_r), atol=1e-7)
np.testing.assert_allclose(np.asarray(fu_s), np.asarray(fu_r), atol=1e-7)
print("SEG CHECK OK, max dev", float(jnp.max(jnp.abs(fx_s - fx_r))))
