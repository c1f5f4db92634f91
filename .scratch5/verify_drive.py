import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
import nimblephysics_tpu as ntp
from nimblephysics_tpu.models import builders
from nimblephysics_tpu.simulation.step import rollout

model = builders.inverted_double_pendulum(dt=0.01)
s0 = ntp.State(q=jnp.zeros(model.nq).at[1].set(0.2), v=jnp.zeros(model.nq))
acts = jnp.zeros((100, model.num_actions))
final, traj = jax.jit(lambda s, a: rollout(model, s, a))(s0, acts)
assert jnp.all(jnp.isfinite(final.q)), "rollout non-finite"
g = jax.grad(lambda a: jnp.sum(rollout(model, s0, a)[0].q ** 2))(acts)
assert jnp.all(jnp.isfinite(g)), "grad non-finite"
print("pendulum rollout+grad ok; |g|=", float(jnp.linalg.norm(g)))

# contact world: jump_worm must land and stop
m2 = builders.jump_worm(dt=0.001)
s2 = ntp.State(q=jnp.zeros(m2.nq).at[1].set(-0.2), v=jnp.zeros(m2.nq))
a2 = jnp.zeros((600, m2.num_actions))
f2, _ = jax.jit(lambda s, a: rollout(m2, s, a))(s2, a2)
print("worm final y,vy:", float(f2.q[1]), float(f2.v[1]))
assert abs(float(f2.v[1])) < 0.5, "worm did not settle"
print("VERIFY OK")
