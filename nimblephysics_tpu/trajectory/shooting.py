"""Single & multiple shooting trajectory optimization.

Maps the reference's `dart/trajectory/`:
  * `SingleShot` (one rollout, decision = control sequence,
    `SingleShot.cpp:69-77`)  -> `SingleShootingProblem`
  * `MultiShot` (segments + knot-defect equality constraints
    `x_end(shot i-1) − x_start(shot i) = 0`, `MultiShot.cpp:205-210`)
    -> `MultipleShootingProblem` solved by augmented Lagrangian
  * `SGDOptimizer` -> plain gradient descent path of
    `solve_single_shooting(optimizer="sgd")`
  * IPOPT L-BFGS -> optax-based inner loops with fixed iteration counts
    (whole solve is one XLA program; `Solution::reoptimize()` warm starts
    are just "call again with the previous solution as init").

The reference parallelizes shots with `std::async` over cloned worlds
(`MultiShot.cpp:183-202`); here segment rollouts are a `vmap` over the
segment axis, and batched scenario solves are an outer `vmap`.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from nimblephysics_tpu.models.model import Model, State
from nimblephysics_tpu.simulation.step import rollout, step


class Trajectory(NamedTuple):
    """A rollout result: states over time plus the controls that produced it.

    Counterpart of `TrajectoryRollout` (poses, vels, forces —
    `TrajectoryRollout.hpp:28-50`)."""

    q: jax.Array        # (T, nq)
    v: jax.Array        # (T, nq)
    u: jax.Array        # (T, na)


# A loss function maps a Trajectory to a scalar (LossFn.hpp:27 analog; the
# gradient comes from JAX AD instead of a user-supplied grad callback).
LossFn = Callable[[Trajectory], jax.Array]


@dataclasses.dataclass(frozen=True)
class SingleShootingProblem:
    """Decision variables: the control sequence, plus (reference parity)

      * `static_vars` — names of Model leaves optimized as STATIC decision
        variables shared across the horizon: the reference's flatStatic
        segment is exactly the world masses (`Problem::flatten`,
        Problem.cpp:160-184: `flatStatic.segment(0, massDims) = masses`);
        any Model leaf name works here ("mass", "com", "damping", ...) —
        system identification inside the trajectory optimization.
      * `tune_start` — include the starting state in the decision vector
        (`SingleShot::SingleShot(..., tuneStartingState)`,
        SingleShot.cpp:29-32).
      * `constraints` — LossFns used as bounded constraints: (fn, lo, hi)
        triples (`LossFn::setLowerBound/setUpperBound`, LossFn.hpp:46-70),
        enforced by an augmented-Lagrangian outer loop.
    """

    model: Model
    x0: State
    horizon: int
    loss: LossFn
    tune_start: bool = False
    static_vars: tuple = ()
    constraints: tuple = ()   # ((LossFn, lo, hi), ...)

    def rollout_controls(self, u: jax.Array) -> Trajectory:
        _, traj = rollout(self.model, self.x0, u)
        return Trajectory(q=traj.q, v=traj.v, u=u)

    def objective(self, u: jax.Array) -> jax.Array:
        return self.loss(self.rollout_controls(u))

    # -- generalized decision vector (flatStatic ++ flatDynamic) ------------
    def initial_params(self, u_init: jax.Array) -> dict:
        p = {"u": u_init}
        if self.tune_start:
            p["x0q"] = self.x0.q
            p["x0v"] = self.x0.v
        for name in self.static_vars:
            p[name] = getattr(self.model, name)
        return p

    def build(self, params: dict):
        """(model, x0) with the decision variables substituted in."""
        model = self.model
        if self.static_vars:
            model = model.replace(
                **{n: params[n] for n in self.static_vars}
            )
        x0 = (
            State(q=params["x0q"], v=params["x0v"])
            if self.tune_start
            else self.x0
        )
        return model, x0

    def rollout_params(self, params: dict) -> Trajectory:
        model, x0 = self.build(params)
        _, traj = rollout(model, x0, params["u"])
        return Trajectory(q=traj.q, v=traj.v, u=params["u"])


class ShootingSolution(NamedTuple):
    u: jax.Array            # optimized controls (T, na)
    loss: jax.Array         # final loss value
    loss_history: jax.Array # (iters,)
    params: Optional[dict] = None   # full decision pytree (tuned start
    #   state under "x0q"/"x0v", static sysid vars under their leaf names)
    constraint_values: Optional[jax.Array] = None  # (n_constraints,)


def solve_single_shooting(
    problem: SingleShootingProblem,
    u_init: Optional[jax.Array] = None,
    iters: int = 200,
    optimizer: str = "adam",
    lr: float = 1e-1,
    u_clip: bool = True,
    grad_clip: Optional[float] = None,
) -> ShootingSolution:
    """Fixed-iteration first-order solve, fully jittable.

    optimizer: "sgd" reproduces the reference's `SGDOptimizer` (plain
    gradient descent, SGDOptimizer.hpp:28); "adam" is the default.
    grad_clip: optional global-norm gradient clip — the robustness valve
    for contact-rich rollouts where the LCP active-set derivative can
    spike near degenerate contact configurations (the reference's
    analogue is `clipLossGradientsToBounds`, BackpropSnapshot.cpp:181).
    """
    model = problem.model
    na = model.num_actions
    if u_init is None:
        u_init = jnp.zeros((problem.horizon, na), dtype=model.mass.dtype)

    lo = model.tau_lower[jnp.asarray(model.actuated, dtype=jnp.int32)] if na else None
    hi = model.tau_upper[jnp.asarray(model.actuated, dtype=jnp.int32)] if na else None

    def project(u):
        if u_clip and na:
            return jnp.clip(u, lo, hi)
        return u

    opt = optax.sgd(lr) if optimizer == "sgd" else optax.adam(lr)

    extended = (
        problem.tune_start or problem.static_vars or problem.constraints
    )
    if not extended:
        grad_fn = jax.value_and_grad(problem.objective)

        def body(carry, _):
            u, opt_state = carry
            val, g = grad_fn(u)
            if grad_clip is not None:
                gn = jnp.sqrt(jnp.sum(g * g))
                g = g * jnp.minimum(1.0, grad_clip / jnp.maximum(gn, 1e-12))
                # non-finite guard: NaN gradients must not poison the iterate
                g = jnp.where(jnp.isfinite(g), g, 0.0)
            updates, opt_state = opt.update(g, opt_state, u)
            u = project(optax.apply_updates(u, updates))
            return (u, opt_state), val

        (u, _), hist = jax.lax.scan(
            body, (project(u_init), opt.init(u_init)), None, length=iters
        )
        return ShootingSolution(
            u=u, loss=problem.objective(u), loss_history=hist
        )

    # -- generalized decision vector + augmented-Lagrangian constraints ----
    # (Problem.cpp:160-184 static vars; SingleShot.cpp:29-32 tuned start;
    # LossFn.hpp:46-70 bounded-constraint LossFns.)
    ncon = len(problem.constraints)
    dtype = model.mass.dtype
    c_lo = jnp.asarray([c[1] for c in problem.constraints], dtype) if ncon else None
    c_hi = jnp.asarray([c[2] for c in problem.constraints], dtype) if ncon else None

    def con_values(params):
        traj = problem.rollout_params(params)
        return jnp.stack([fn(traj) for fn, _, _ in problem.constraints])

    def al_objective(params, lam_lo, lam_hi, mu):
        traj = problem.rollout_params(params)
        val = problem.loss(traj)
        if ncon:
            g = jnp.stack([fn(traj) for fn, _, _ in problem.constraints])
            # PHR augmented Lagrangian for g in [lo, hi]
            t_hi = jnp.maximum(0.0, lam_hi + mu * (g - c_hi))
            t_lo = jnp.maximum(0.0, lam_lo + mu * (c_lo - g))
            val = val + jnp.sum(t_hi**2 - lam_hi**2 + t_lo**2 - lam_lo**2) / (
                2.0 * mu
            )
        return val

    def project_params(p):
        p = dict(p)
        p["u"] = project(p["u"])
        if "mass" in p:  # physical positivity (world mass lower bound)
            p["mass"] = jnp.maximum(p["mass"], 1e-6)
        return p

    params0 = project_params(problem.initial_params(u_init))
    lam_lo0 = jnp.zeros((ncon,), dtype) if ncon else jnp.zeros((0,), dtype)
    lam_hi0 = jnp.zeros_like(lam_lo0)
    outer = 6 if ncon else 1
    inner_iters = max(1, iters // outer)
    mu0 = jnp.asarray(10.0, dtype)

    def inner(params, lam_lo, lam_hi, mu):
        opt_state = opt.init(params)

        def body(carry, _):
            p, os = carry
            val, g = jax.value_and_grad(al_objective)(p, lam_lo, lam_hi, mu)
            if grad_clip is not None:
                gn = optax.global_norm(g)
                scale = jnp.minimum(1.0, grad_clip / jnp.maximum(gn, 1e-12))
                g = jax.tree_util.tree_map(
                    lambda x: jnp.where(jnp.isfinite(x), x * scale, 0.0), g
                )
            updates, os = opt.update(g, os, p)
            p = project_params(optax.apply_updates(p, updates))
            return (p, os), val

        (params, _), hist = jax.lax.scan(
            body, (params, opt_state), None, length=inner_iters
        )
        return params, hist

    def outer_body(carry, _):
        params, lam_lo, lam_hi, mu = carry
        params, hist = inner(params, lam_lo, lam_hi, mu)
        if ncon:
            g = con_values(params)
            lam_hi = jnp.maximum(0.0, lam_hi + mu * (g - c_hi))
            lam_lo = jnp.maximum(0.0, lam_lo + mu * (c_lo - g))
            mu = mu * 2.0
        return (params, lam_lo, lam_hi, mu), hist

    (params, _, _, _), hists = jax.lax.scan(
        outer_body, (params0, lam_lo0, lam_hi0, mu0), None, length=outer
    )
    final_loss = problem.loss(problem.rollout_params(params))
    return ShootingSolution(
        u=params["u"],
        loss=final_loss,
        loss_history=hists.reshape(-1),
        params=params,
        constraint_values=con_values(params) if ncon else None,
    )


@dataclasses.dataclass(frozen=True)
class MultipleShootingProblem:
    """Horizon split into `num_segments` segments of length `seg_len`.

    Decision variables: per-segment start states (except segment 0, pinned
    to x0) and all controls. Knot defects x_end(s) − x_start(s+1) are
    equality constraints (MultiShot.cpp:205-210) handled by an augmented
    Lagrangian outer loop.
    """

    model: Model
    x0: State
    num_segments: int
    seg_len: int
    loss: LossFn

    @property
    def horizon(self) -> int:
        return self.num_segments * self.seg_len

    def segment_rollouts(self, starts_q, starts_v, u):
        """Rollout every segment in parallel (vmap over the segment axis).

        starts_q/v: (S, nq) — segment start states (row 0 is x0).
        u: (S, L, na). Returns per-segment Trajectories stacked (S, L, ·)
        plus segment-end states (S, nq)."""
        def one(seg_q, seg_v, seg_u):
            final, traj = rollout(self.model, State(seg_q, seg_v), seg_u)
            return traj.q, traj.v, final.q, final.v

        qs, vs, fq, fv = jax.vmap(one)(starts_q, starts_v, u)
        return qs, vs, fq, fv

    def defects(self, starts_q, starts_v, fq, fv):
        """(S-1, 2nq) knot defects."""
        dq = fq[:-1] - starts_q[1:]
        dv = fv[:-1] - starts_v[1:]
        return jnp.concatenate([dq, dv], axis=-1)


class MultiShootingSolution(NamedTuple):
    u: jax.Array            # (T, na) concatenated controls
    starts_q: jax.Array
    starts_v: jax.Array
    loss: jax.Array
    defect_norm: jax.Array
    loss_history: jax.Array


def solve_multiple_shooting(
    problem: MultipleShootingProblem,
    u_init: Optional[jax.Array] = None,
    outer_iters: int = 8,
    inner_iters: int = 300,
    lr: float = 1e-2,
    mu0: float = 50.0,
    mu_growth: float = 2.0,
) -> MultiShootingSolution:
    """Augmented-Lagrangian multiple shooting, fully jittable.

    The inner minimization is Adam over (segment start states, controls);
    the outer loop updates multipliers λ ← λ + μ c and grows μ — the
    standard replacement for IPOPT's interior-point handling of the knot
    equality constraints.
    """
    model = problem.model
    S, L, na = problem.num_segments, problem.seg_len, model.num_actions
    nq = model.nq
    dtype = model.mass.dtype
    if u_init is None:
        u_init = jnp.zeros((S, L, na), dtype=dtype)
    else:
        u_init = u_init.reshape(S, L, na)

    # Initialize segment starts by rolling out u_init (chained) — mirrors the
    # reference seeding shots from a single rollout.
    def init_starts(u):
        def body(s, su):
            final, _ = rollout(model, State(s[0], s[1]), su)
            return (final.q, final.v), (s[0], s[1])

        (_, _), starts = jax.lax.scan(body, (problem.x0.q, problem.x0.v), u)
        return starts

    starts_q0, starts_v0 = init_starts(u_init)

    lam0 = jnp.zeros((S - 1, 2 * nq), dtype=dtype)

    idx = jnp.asarray(model.actuated, dtype=jnp.int32)
    lo, hi = model.tau_lower[idx], model.tau_upper[idx]

    def full_loss(params, lam, mu):
        starts_q = jnp.concatenate([problem.x0.q[None], params["sq"]], axis=0)
        starts_v = jnp.concatenate([problem.x0.v[None], params["sv"]], axis=0)
        u = params["u"]
        qs, vs, fq, fv = problem.segment_rollouts(starts_q, starts_v, u)
        traj = Trajectory(
            q=qs.reshape(S * L, nq), v=vs.reshape(S * L, nq),
            u=u.reshape(S * L, na),
        )
        c = problem.defects(starts_q, starts_v, fq, fv)
        al = jnp.sum(lam * c) + 0.5 * mu * jnp.sum(c * c)
        return problem.loss(traj) + al, c

    opt = optax.adam(lr)

    def inner(params, lam, mu):
        opt_state = opt.init(params)

        def body(carry, _):
            p, os = carry
            (val, _), g = jax.value_and_grad(full_loss, has_aux=True)(p, lam, mu)
            updates, os = opt.update(g, os, p)
            p = optax.apply_updates(p, updates)
            p = {**p, "u": jnp.clip(p["u"], lo, hi)}
            return (p, os), val

        (params, _), hist = jax.lax.scan(body, (params, opt_state), None, length=inner_iters)
        return params, hist

    def outer_body(carry, _):
        params, lam, mu = carry
        params, hist = inner(params, lam, mu)
        _, c = full_loss(params, lam, mu)
        lam = lam + mu * c
        mu = mu * mu_growth
        return (params, lam, mu), hist

    params0 = dict(u=u_init, sq=starts_q0[1:], sv=starts_v0[1:])
    (params, lam, mu), hists = jax.lax.scan(
        outer_body, (params0, lam0, jnp.asarray(mu0, dtype=dtype)), None,
        length=outer_iters,
    )

    (final_val, c) = full_loss(params, jnp.zeros_like(lam0), 0.0)
    starts_q = jnp.concatenate([problem.x0.q[None], params["sq"]], axis=0)
    starts_v = jnp.concatenate([problem.x0.v[None], params["sv"]], axis=0)
    return MultiShootingSolution(
        u=params["u"].reshape(S * L, na),
        starts_q=starts_q,
        starts_v=starts_v,
        loss=final_val,
        defect_norm=jnp.linalg.norm(c),
        loss_history=hists.reshape(-1),
    )
