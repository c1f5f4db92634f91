"""iLQR/DDP: the jittable receding-horizon solver used by the MPC layer.

The reference's MPC re-solves an IPOPT MultiShot every replan
(`MPCLocal.cpp:180-300`). On TPU the equivalent "fast replan" is iLQR:
fixed iteration count, no data-dependent control flow, whole solve compiled
to one XLA program — so thousands of scenario solves run batched under
`vmap`/`shard_map` (BASELINE target: ≥1000 solves/s at H=100).

Standard Levenberg-regularized iLQR:
  * linearize dynamics along the trajectory with one vmapped
    `jax.jacobian` sweep (analytic step Jacobians via AD — the TPU
    equivalent of the reference's hand-built `BackpropSnapshot` Jacobians)
  * backward Riccati recursion with a lax.scan
  * parallel line search over a fixed alpha ladder, pick best
  * control limits via clamping in the forward rollout (naive boxQP)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from nimblephysics_tpu.models.model import Model, State
from nimblephysics_tpu.ops import linalg_small
from nimblephysics_tpu.simulation.step import step


@dataclasses.dataclass(frozen=True)
class ILQRConfig:
    iters: int = 20
    # scan unroll factor for the time loops: fusing k timesteps per XLA loop
    # iteration amortizes loop overhead for the tiny-op dynamics bodies
    unroll: int = 20
    reg_init: float = 1e-3
    reg_min: float = 1e-8
    reg_max: float = 1e8
    reg_up: float = 8.0
    reg_down: float = 0.5
    alphas: tuple = (1.0, 0.6, 0.3, 0.1, 0.03, 0.01)
    # Backward-pass algorithm:
    #   "sequential": lax.scan Riccati recursion, Tassa-style Vxx
    #     regularization (robust default; O(T) depth).
    #   "parallel": associative-scan temporal parallelization of the LQR
    #     backward pass (Särkkä & García-Fernández, "Temporal
    #     Parallelization of Dynamic Programming and LQR",
    #     arXiv:2104.03186) — O(log T) depth, with cost-side Levenberg
    #     regularization (luu + reg·I) so the per-step conditional value
    #     elements stay affine-quadratic. The fast path for long horizons
    #     on TPU where the sequential scan's ~T tiny-matrix latency chain
    #     dominates the solve.
    riccati: str = "sequential"
    # Linearization sweep in ilqr_solve_batch:
    #   "auto": contact-free models use the fused lane-batched JVP kernel
    #     (ops/pallas_linearize.py) — measured ~4x faster than the XLA
    #     jacfwd sweep at B=1024, H=100 AND ~1e4x closer to float64 (the
    #     XLA TPU path's transcendentals are low-precision). Frozen-
    #     contact models use the round-4 primal/tangent SPLIT kernels
    #     (linearize_pallas_split): the monolithic frozen-step JVP
    #     exceeds the Mosaic compile envelope at bench LCP sizes, the
    #     split halves compile and run ~8-20x faster than the hybrid
    #     jacfwd lane. NOTE: at the default block sizes the split path
    #     needs the scoped-vmem cap raised (jit(..., compiler_options=
    #     {"xla_tpu_scoped_vmem_limit_kib": 98304}) as bench.py does).
    #   "jvp": force the monolithic JVP lane kernel (contact too).
    #   "xla": always the vmapped jacfwd sweep.
    #   "chain": the CHAINED row-VJP kernels (ops/lane_chain.py) — for
    #     humanoid-class models whose split halves exceed the Mosaic
    #     compile envelope (Atlas, nq >= ~30); `chain_budget` bounds the
    #     per-kernel emitted-op estimate.
    linearize: str = "auto"
    chain_budget: int = 18000
    # PCG depth of the frozen-contact solve in the PLANNER kernels
    # (rollout + linearize). None = m+6, the exact-in-m default the plant
    # uses. With Jacobi preconditioning and identity rows on non-clamping
    # constraints, ~16 reproduces the full solve to ~1e-6 on typical
    # contact states at half the solve cost — a planner-accuracy knob,
    # not a plant-accuracy one (bench.py sets 16).
    planner_cg_iters: Optional[int] = None
    # Line-search rollout sweep in ilqr_solve_batch:
    #   "auto": the fused Pallas closed-loop rollout kernel whenever the
    #     model qualifies (contact-free, or frozen classes given) — even
    #     when `linearize="xla"` (the hybrid lane for models whose JVP
    #     kernel exceeds the Mosaic compile envelope but whose primal
    #     kernel compiles).
    #   "xla": always the scan-based rollout.
    rollout: str = "auto"


class ILQRSolution(NamedTuple):
    u: jax.Array           # (T, na)
    x: jax.Array           # (T+1, 2nq) optimal state trajectory
    cost: jax.Array
    cost_history: jax.Array
    K: jax.Array           # (T, na, 2nq) feedback gains (for MPC serving)
    k: jax.Array           # (T, na) feedforward terms


# Pivot-free unrolled Gauss-Jordan (ops/linalg_small.py): jnp.linalg
# solve/inv lower to serial pivoting loops on XLA:TPU — catastrophic inside
# scans (measured 7x slower than the sequential Riccati when used in the
# associative-scan combine). The matrices inverted here are SPD or I + C·J
# with C, J PSD (real eigenvalues >= 0), so pivot-free elimination is stable.
_gj_inv = linalg_small.inv_spd


def _parallel_riccati(fx, fu, lx, lu, lxx, luu, lux, Vx_T, Vxx_T, reg):
    """O(log T)-depth LQR backward pass via `lax.associative_scan`.

    Temporal parallelization of dynamic programming (Särkkä &
    García-Fernández, arXiv:2104.03186): each timestep contributes a
    conditional-value-function element `e_t = (A, b, C, eta, J)` encoding

        exp(-V(x_t, x_{t+1})) ∝ N(x_{t+1}; A x_t + b, C) ·
                                exp(eta^T x_t − ½ x_t^T J x_t)

    for the one-step cost-to-go with the control minimized out. Elements
    compose associatively (the same algebra as the parallel Kalman
    smoother), so a reverse `associative_scan` yields every suffix element
    [t, T] — whose (J, eta) ARE the Riccati value Hessian/linear term
    S_t, v_t — in O(log T) sequential depth instead of the O(T) chain of
    the classic recursion (reference: the per-step reverse sweep in
    `BackpropSnapshot::backprop`, /root/reference/dart/neural/
    BackpropSnapshot.cpp:121, chained over the horizon by
    `SingleShot::backpropGradientWrt`).

    Regularization is cost-side Levenberg (`luu + reg·I` baked into the
    leaves) rather than the sequential path's Tassa state-regularization —
    the elements must stay affine-quadratic for associativity to hold.
    At reg → 0 both paths compute the identical exact Riccati solution
    (tested in tests/test_trajectory.py).
    """
    T, nx, na = fu.shape[0], fx.shape[1], fu.shape[2]
    dtype = fx.dtype
    I_na = jnp.eye(na, dtype=dtype)
    I_nx = jnp.eye(nx, dtype=dtype)

    def leaf(fx_t, fu_t, lx_t, lu_t, lxx_t, luu_t, lux_t):
        # Complete the square in u to eliminate the cross term lux:
        #   u = ũ − U⁻¹(M x + r)  with  U = luu + reg·I, M = lux, r = lu
        U = luu_t + reg * I_na
        Ui = _gj_inv(U)                                    # SPD, pivot-free OK
        UiM = Ui @ lux_t                                   # (na,nx)
        Uir = Ui @ lu_t                                    # (na,)
        UiLt = Ui @ fu_t.T                                 # (na,nx)
        A = fx_t - fu_t @ UiM
        b = -fu_t @ Uir
        C = fu_t @ UiLt
        J = lxx_t - lux_t.T @ UiM
        eta = lux_t.T @ Uir - lx_t
        return A, b, 0.5 * (C + C.T), eta, 0.5 * (J + J.T)

    A, b, C, eta, J = jax.vmap(leaf)(fx, fu, lx, lu, lxx, luu, lux)
    # Terminal element: pure cost, no transition.
    zA = jnp.zeros((1, nx, nx), dtype=dtype)
    elems = (
        jnp.concatenate([A, zA], axis=0),
        jnp.concatenate([b, -Vx_T[None] * 0.0], axis=0),
        jnp.concatenate([C, zA], axis=0),
        jnp.concatenate([eta, -Vx_T[None]], axis=0),
        jnp.concatenate([J, Vxx_T[None]], axis=0),
    )

    def combine(e_later, e_earlier):
        # Under `associative_scan(reverse=True)` the first argument is the
        # suffix built from LATER timesteps: fn(a, b) with a = [j,k],
        # b = [i,j] → combined spans [i,k].
        A1, b1, C1, eta1, J1 = e_earlier
        A2, b2, C2, eta2, J2 = e_later
        Dinv = _gj_inv(I_nx + C1 @ J2)                      # (…,nx,nx)
        A2D = A2 @ Dinv
        A = A2D @ A1
        b = (A2D @ (b1 + (C1 @ eta2[..., None])[..., 0])[..., None])[..., 0] + b2
        C = A2D @ C1 @ jnp.swapaxes(A2, -1, -2) + C2
        # (I + J2 C1)⁻¹ = D⁻ᵀ for symmetric C1, J2.
        A1tDt = jnp.swapaxes(Dinv @ A1, -1, -2)
        eta = (A1tDt @ (eta2[..., None] - J2 @ b1[..., None]))[..., 0] + eta1
        J = A1tDt @ J2 @ A1 + J1
        return (A, b, 0.5 * (C + jnp.swapaxes(C, -1, -2)), eta,
                0.5 * (J + jnp.swapaxes(J, -1, -2)))

    suffix = jax.lax.associative_scan(combine, elems, reverse=True)
    # suffix[t] spans [t, T]: V_t(x) = ½ xᵀ S_t x − v_tᵀ x.
    S = suffix[4][1:]                                       # (T,nx,nx) = S_{t+1}
    v = suffix[3][1:]                                       # (T,nx)    = v_{t+1}

    def gains(fx_t, fu_t, lu_t, luu_t, lux_t, S_n, v_n):
        Quu = luu_t + reg * I_na + fu_t.T @ S_n @ fu_t
        Qu = lu_t - fu_t.T @ v_n
        Qux = lux_t + fu_t.T @ S_n @ fx_t
        Quu_inv, min_piv = linalg_small.inv_spd_pivots(Quu)
        ok = jnp.isfinite(min_piv) & (min_piv > 0.0)
        k_t = -(Quu_inv @ Qu)
        K_t = -(Quu_inv @ Qux)
        dv = jnp.array([k_t @ Qu, 0.5 * k_t @ (Quu @ k_t)])
        return K_t, k_t, ok, dv

    K, k, oks, dvs = jax.vmap(gains)(fx, fu, lu, luu, lux, S, v)
    return K, k, jnp.sum(dvs, axis=0), jnp.all(oks)


def _make_dyn(model: Model):
    def dyn(x, u):
        s = State.from_flat(x)
        s2 = step(model, s, u)
        return s2.flat()

    return dyn


def _make_frozen_dyn(model: Model, cg_iters=None):
    """Time-varying smooth planning dynamics on a frozen mode sequence
    (ops/frozen_contact.py): dyn(x, u, (cmask_t, us_t)) -> x'. The iLQR
    contact fast path — the reference's warm-start steady-state assumption
    (BoxedLcpConstraintSolver.cpp:422-458) applied to the whole replan."""
    from nimblephysics_tpu.ops.frozen_contact import (
        FrozenClasses,
        frozen_contact_step,
        gov_matrix,
    )

    gov = jnp.asarray(gov_matrix(model), dtype=model.mass.dtype)

    def dyn(x, u, cl):
        s = State.from_flat(x)
        tau = model.action_to_tau(u)
        s2 = frozen_contact_step(
            model, s, tau, FrozenClasses(cmask=cl[0], us=cl[1]), gov,
            cg_iters=cg_iters,
        )
        return s2.flat()

    return dyn


def ilqr_solve(
    model: Model,
    x0: State,
    u_init: jax.Array,
    running_cost: Callable[[jax.Array, jax.Array, jax.Array], jax.Array],
    final_cost: Callable[[jax.Array], jax.Array],
    config: ILQRConfig = ILQRConfig(),
    classes=None,
) -> ILQRSolution:
    """Minimize sum_t running_cost(x_t, u_t, t) + final_cost(x_T).

    x is the flat (q, v) state; u is the action vector (actuated dofs).
    Fully jittable; fixed iteration/linesearch structure.

    `classes` (a FrozenClasses with leading time axis, from
    `ops/frozen_contact.rollout_classes`): solve on the SMOOTH
    frozen-mode-sequence dynamics instead of the full LCP step — the
    contact-MPC fast path (see `solve_contact_mpc`).
    """
    T, na = u_init.shape
    nx = 2 * model.nq
    dtype = u_init.dtype
    xflat0 = x0.flat()

    if classes is None:
        _dyn0 = _make_dyn(model)

        def dyn(x, u, cl):
            return _dyn0(x, u)

        cl_seq = (jnp.zeros((T, 0), dtype), jnp.zeros((T, 0), dtype))
    else:
        dyn = _make_frozen_dyn(model)
        cl_seq = (classes.cmask, classes.us)

    idx = jnp.asarray(model.actuated, dtype=jnp.int32) if na else None
    u_lo = model.tau_lower[idx] if na else None
    u_hi = model.tau_upper[idx] if na else None

    ts = jnp.arange(T)

    def clamp(u):
        return jnp.clip(u, u_lo, u_hi)

    def rollout_controls(u):
        def body(x, inp):
            ut, cl = inp
            x2 = dyn(x, ut, cl)
            return x2, x2

        xT, xs = jax.lax.scan(body, xflat0, (u, cl_seq), unroll=config.unroll)
        return jnp.concatenate([xflat0[None], xs], axis=0)

    def traj_cost(xs, u):
        run = jnp.sum(jax.vmap(running_cost)(xs[:-1], u, ts))
        return run + final_cost(xs[-1])

    def rollout_with_gains(xs_ref, u_ref, K, k, alpha):
        """Closed-loop forward pass: u = u_ref + alpha k + K (x − x_ref)."""

        def body(x, inp):
            x_ref, u_ref_t, K_t, k_t, cl = inp
            u_t = clamp(u_ref_t + alpha * k_t + K_t @ (x - x_ref))
            x2 = dyn(x, u_t, cl)
            return x2, (x2, u_t)

        _, (xs, us) = jax.lax.scan(
            body, xflat0, (xs_ref[:-1], u_ref, K, k, cl_seq),
            unroll=config.unroll,
        )
        xs = jnp.concatenate([xflat0[None], xs], axis=0)
        return xs, us

    # Derivative oracles (vmapped over time). Forward-mode: nx+na input
    # tangents beat nx output cotangents through the ABA graph (~40% faster
    # measured on TPU for the cartpole step).
    dyn_jac = jax.vmap(jax.jacfwd(dyn, argnums=(0, 1)))
    cost_grad = jax.vmap(jax.grad(running_cost, argnums=(0, 1)))

    def cost_hess(xs, u):
        def h(x, u_t, t):
            hxx = jax.hessian(running_cost, argnums=0)(x, u_t, t)
            huu = jax.hessian(running_cost, argnums=1)(x, u_t, t)
            hux = jax.jacobian(jax.grad(running_cost, argnums=1), argnums=0)(x, u_t, t)
            return hxx, huu, hux

        return jax.vmap(h)(xs, u, ts)

    def backward(xs, u, reg):
        fx, fu = dyn_jac(xs[:-1], u, cl_seq)               # (T,nx,nx), (T,nx,na)
        lx, lu = cost_grad(xs[:-1], u, ts)
        lxx, luu, lux = cost_hess(xs[:-1], u)
        Vx_T = jax.grad(final_cost)(xs[-1])
        Vxx_T = jax.hessian(final_cost)(xs[-1])
        if config.riccati == "parallel":
            return _parallel_riccati(
                fx, fu, lx, lu, lxx, luu, lux, Vx_T, Vxx_T, reg
            )
        # zeros_like keeps shard_map varying-axes metadata consistent with
        # the traced values (a plain jnp.zeros would be replicated and break
        # the scan carry under shard_map)
        dV0 = jnp.zeros_like(Vx_T[:2])

        def bstep(carry, inp):
            Vx, Vxx, dV = carry
            fx_t, fu_t, lx_t, lu_t, lxx_t, luu_t, lux_t = inp
            Qx = lx_t + fx_t.T @ Vx
            Qu = lu_t + fu_t.T @ Vx
            Qxx = lxx_t + fx_t.T @ Vxx @ fx_t
            Quu = luu_t + fu_t.T @ Vxx @ fu_t
            Qux = lux_t + fu_t.T @ Vxx @ fx_t
            # Tassa-style state regularization (Control-Limited DDP, 2014):
            # add reg to Vxx inside the fu products — far more robust for
            # unstable dynamics than plain Quu + reg I.
            Vxx_reg = Vxx + reg * jnp.eye(Vxx.shape[0], dtype=dtype)
            Quu_reg = luu_t + fu_t.T @ Vxx_reg @ fu_t
            Qux_reg = lux_t + fu_t.T @ Vxx_reg @ fx_t
            # Pivot-free inverse; its min pivot doubles as the PD check
            # (jnp.linalg.cholesky/solve lower to serial pivoting loops on
            # TPU — ruinous inside this T-step scan body).
            Quu_inv, min_piv = linalg_small.inv_spd_pivots(Quu_reg)
            ok = jnp.isfinite(min_piv) & (min_piv > 0.0)
            k_t = -(Quu_inv @ Qu)
            K_t = -(Quu_inv @ Qux_reg)
            Vx2 = Qx + K_t.T @ Quu @ k_t + K_t.T @ Qu + Qux.T @ k_t
            Vxx2 = Qxx + K_t.T @ Quu @ K_t + K_t.T @ Qux + Qux.T @ K_t
            Vxx2 = 0.5 * (Vxx2 + Vxx2.T)
            dV2 = dV + jnp.array([k_t @ Qu, 0.5 * k_t @ Quu @ k_t])
            return (Vx2, Vxx2, dV2), (K_t, k_t, ok)

        (_, _, dV), (K, k, oks) = jax.lax.scan(
            bstep, (Vx_T, Vxx_T, dV0),
            (fx, fu, lx, lu, lxx, luu, lux),
            reverse=True,
            unroll=config.unroll,
        )
        return K, k, dV, jnp.all(oks)

    def iteration(carry, _):
        xs, u, cost, reg = carry
        K, k, dV, pd_ok = backward(xs, u, reg)

        alphas = jnp.asarray(config.alphas, dtype=dtype)

        def try_alpha(alpha):
            xs2, u2 = rollout_with_gains(xs, u, K, k, alpha)
            return traj_cost(xs2, u2), xs2, u2

        costs, xss, uss = jax.vmap(try_alpha)(alphas)
        best = jnp.argmin(costs)
        new_cost = costs[best]
        improved = (new_cost < cost) & pd_ok
        xs_n = jnp.where(improved, xss[best], xs)
        u_n = jnp.where(improved, uss[best], u)
        cost_n = jnp.where(improved, new_cost, cost)
        reg_n = jnp.where(
            improved,
            jnp.maximum(reg * config.reg_down, config.reg_min),
            jnp.minimum(reg * config.reg_up, config.reg_max),
        )
        return (xs_n, u_n, cost_n, reg_n), (cost_n, K, k)

    u0 = clamp(u_init)
    xs0 = rollout_controls(u0)
    cost0 = traj_cost(xs0, u0)
    reg0 = config.reg_init * jnp.ones_like(cost0)  # inherits shard_map vma
    (xs, u, cost, _), (hist, Ks, ks) = jax.lax.scan(
        iteration,
        (xs0, u0, cost0, reg0),
        None,
        length=config.iters,
    )
    return ILQRSolution(u=u, x=xs, cost=cost, cost_history=hist,
                        K=Ks[-1], k=ks[-1])


def solve_contact_mpc(
    model: Model,
    x0: State,
    u_init: jax.Array,
    running_cost: Callable[[jax.Array, jax.Array, jax.Array], jax.Array],
    final_cost: Callable[[jax.Array], jax.Array],
    config: ILQRConfig = ILQRConfig(),
    outer_iters: int = 2,
    classes=None,
):
    """Contact-model iLQR via frozen mode sequences (the MPC fast path).

    Alternates {one full-LCP rollout extracting the per-step active-set
    classes} with {an iLQR solve on the smooth frozen-mode dynamics} —
    the reference's steady-state replan structure, where the warm-started
    LCP classes stay fixed and each step is one linear solve
    (BoxedLcpConstraintSolver.cpp:422-458; MPCLocal reoptimize loop,
    MPCLocal.cpp:255-300). `classes` seeds the first inner solve (carry it
    across replans for MPC warm starting); pass None to bootstrap from
    `u_init`'s rollout.

    Returns (ILQRSolution evaluated on the TRUE constrained dynamics,
    final FrozenClasses for the next replan's warm start). Fully jittable.
    """
    from nimblephysics_tpu.ops.frozen_contact import rollout_classes
    from nimblephysics_tpu.simulation.step import rollout as full_rollout

    ts = jnp.arange(u_init.shape[0])
    u = u_init
    sol = None
    for _ in range(outer_iters):
        if classes is None or sol is not None:
            _, _, classes, _ = rollout_classes(model, x0, u)
        sol = ilqr_solve(
            model, x0, u, running_cost, final_cost, config, classes
        )
        u = sol.u
    # honest evaluation on the true constrained dynamics
    _, traj = full_rollout(model, x0, u)
    xs_true = jnp.concatenate([x0.flat()[None], traj.flat()], axis=0)
    cost_true = jnp.sum(
        jax.vmap(running_cost)(xs_true[:-1], u, ts)
    ) + final_cost(xs_true[-1])
    _, _, classes_out, _ = rollout_classes(model, x0, u)
    sol = sol._replace(x=xs_true, cost=cost_true)
    return sol, classes_out


def solve_contact_mpc_batch(
    model: Model,
    x0_flat: jax.Array,   # (B, 2nq)
    u_init: jax.Array,    # (B, T, na)
    running_cost,
    final_cost,
    config: ILQRConfig = ILQRConfig(),
    outer_iters: int = 2,
    block_b: int = 1024,
    classes=None,
    class_refresh: str = "rollout",
    refresh_fixed_point: int = 2,
):
    """Batched contact-model MPC solves on the frozen-mode fast path:
    `solve_contact_mpc` over B worlds with the fused Pallas pipeline doing
    the inner iLQR work. Returns (ILQRSolution, FrozenClasses for warm
    starting the next replan). Forward-only (serving path).

    `class_refresh` selects how the per-replan mode sequence is derived
    from the warm-started plan:
      * "rollout":   one full-LCP sequential rollout per world
        (`rollout_classes`) — the T-step scan of collision + PGS. Exact
        mode dynamics, but the replan's sequential bottleneck (measured
        ~0.8-1.1 s at B=1024, T=100 on v5e, as large as the whole fused
        iLQR).
      * "pointwise": fixed-point mode iteration, fully parallel — roll
        the plan out on the FUSED frozen kernel under the current
        classes, then reclassify every (world, step) point with one
        batched full-LCP solve (`classify_points`), repeated
        `refresh_fixed_point` times from an inactive-mode start (or once
        from `classes` when warm). At the fixed point the mode sequence
        satisfies the same consistency condition the frozen dynamics
        assumes; this is the reference's cached-LCP warm start
        (BoxedLcpConstraintSolver.cpp:422-458) updated in parallel
        rather than in sequence. The serving path (bench.py) uses this.
    """
    from nimblephysics_tpu.ops.contact import lcp_dim
    from nimblephysics_tpu.ops.frozen_contact import (
        FrozenClasses,
        classify_points,
        rollout_classes,
    )

    B, T, na = u_init.shape
    dtype = u_init.dtype
    m = lcp_dim(model)

    def classes_of(x0f, u):
        _, _, cl, _ = rollout_classes(model, State.from_flat(x0f), u)
        return cl

    classes_b = jax.vmap(classes_of)

    if class_refresh == "rollout":
        from nimblephysics_tpu.ops.frozen_contact import (
            fused_class_rollout_ok,
        )

        if fused_class_rollout_ok(model):
            # the whole T-step full-LCP mode rollout as ONE Pallas kernel
            # (worlds on lanes) — the XLA scan of tiny vmapped steps was
            # the measured replan bottleneck for limits-only models
            from nimblephysics_tpu.ops.pallas_rollout import (
                rollout_classes_pallas,
            )

            def classes_b(x0f, u):  # noqa: F811 — fused override
                _, cl = rollout_classes_pallas(
                    model, x0f, u, block_b=block_b
                )
                return cl

    if class_refresh == "pointwise":
        from nimblephysics_tpu.ops.pallas_rollout import rollout_gains_pallas

        K0 = jnp.zeros((B, T, na, 2 * model.nq), dtype)
        k0 = jnp.zeros((B, T, na), dtype)
        one_alpha = jnp.ones((1,), dtype)
        xs_dummy = jnp.zeros((B, T + 1, 2 * model.nq), dtype)
        tau_b = jax.vmap(jax.vmap(model.action_to_tau))

        if config.rollout == "auto":
            def refresh_rollout(cl, u):
                xss, _, _ = rollout_gains_pallas(
                    model, running_cost, final_cost, x0_flat, xs_dummy, u,
                    K0, k0, one_alpha, block_b=block_b,
                    classes=(cl.cmask, cl.us),
                    cg_iters=config.planner_cg_iters,
                )
                return xss[0][:, :-1]             # (B, T, nx) pre-step
        else:
            # XLA open-loop frozen rollout (humanoid-scale fallback: the
            # one-kernel rollout exceeds the Mosaic envelope, the XLA
            # scan compiles — round-5 Atlas bisect)
            dynf = _make_frozen_dyn(model, cg_iters=config.planner_cg_iters)
            idx_r = jnp.asarray(model.actuated, dtype=jnp.int32)
            u_lo_r = model.tau_lower[idx_r]
            u_hi_r = model.tau_upper[idx_r]

            def refresh_rollout(cl, u):
                def one(x0f, uu, cm, us):
                    def body(x, inp):
                        ut, c1, u1 = inp
                        ut = jnp.clip(ut, u_lo_r, u_hi_r)
                        return dynf(x, ut, (c1, u1)), x

                    _, xs = jax.lax.scan(body, x0f, (uu, cm, us))
                    return xs                      # (T, nx) pre-step

                return jax.vmap(one)(x0_flat, u, cl.cmask, cl.us)

        def refresh(cl, u):
            xs = refresh_rollout(cl, u)
            cl2, _ = classify_points(model, xs, tau_b(u))
            return cl2

        def classes_b(x0f_unused, u, warm=None):
            cl = warm
            n = refresh_fixed_point if warm is None else 1
            if cl is None:
                cl = FrozenClasses(
                    cmask=jnp.zeros((B, T, m), dtype),
                    us=jnp.zeros((B, T, m), dtype),
                )
            for _ in range(n):
                cl = refresh(cl, u)
            return cl

    u = u_init
    sol = None
    for _ in range(outer_iters):
        if classes is None or sol is not None:
            classes = classes_b(x0_flat, u)
        sol = ilqr_solve_batch(
            model, x0_flat, u, running_cost, final_cost, config,
            block_b=block_b, classes=classes,
        )
        u = sol.u
    # the returned classes warm-start the NEXT replan (the reference's
    # cached LCP solution carried across replans, MPCLocal.cpp:255-300).
    # They are classified directly on sol.x — the winning closed-loop
    # trajectory the solve just produced under `classes` — instead of
    # paying one more fused rollout to re-create the same states
    # (round-5 utilization lever: fold the final refresh's rollout into
    # the solve's own line-search output).
    if m > 0:
        tau_bo = jax.vmap(jax.vmap(model.action_to_tau))
        cl_out, _ = classify_points(model, sol.x[:, :-1], tau_bo(sol.u))
        return sol, cl_out
    return sol, classes_b(x0_flat, u)


def ilqr_solve_batch(
    model: Model,
    x0_flat: jax.Array,       # (B, 2nq)
    u_init: jax.Array,        # (B, T, na)
    running_cost: Callable[[jax.Array, jax.Array, jax.Array], jax.Array],
    final_cost: Callable[[jax.Array], jax.Array],
    config: ILQRConfig = ILQRConfig(),
    block_b: int = 1024,
    classes=None,
) -> ILQRSolution:
    """Natively batched iLQR with a lane-parallel Pallas Riccati backward.

    Semantically `vmap(ilqr_solve)` — same rollouts, same line search, same
    per-sample regularization schedule — but the backward pass runs as ONE
    `ops/pallas_riccati.py` kernel over the whole batch instead of B
    independent T-step scans of tiny ops. This is the fast path for the
    MPC serving workload (bench.py); the scan-based `ilqr_solve` remains
    the vmappable/differentiable reference.

    `classes` (a FrozenClasses pytree with leading (B, T) axes): solve on
    the frozen-mode contact dynamics — the fused kernels then run for
    contact models too (the contact-MPC fast path).

    Forward-only: the Pallas backward defines no AD rule.
    """
    B, T, na = u_init.shape
    dtype = u_init.dtype

    if classes is None:
        _dyn0 = _make_dyn(model)

        def dyn(x, u, cl):
            return _dyn0(x, u)

        cl_bt = (jnp.zeros((B, T, 0), dtype), jnp.zeros((B, T, 0), dtype))
    else:
        dyn = _make_frozen_dyn(model, cg_iters=config.planner_cg_iters)
        cl_bt = (classes.cmask, classes.us)

    idx = jnp.asarray(model.actuated, dtype=jnp.int32) if na else None
    u_lo = model.tau_lower[idx] if na else None
    u_hi = model.tau_upper[idx] if na else None
    ts = jnp.arange(T)

    def clamp(u):
        return jnp.clip(u, u_lo, u_hi)

    def rollout_controls_one(x0, u, cl):
        def body(x, inp):
            ut, cl_t = inp
            x2 = dyn(x, ut, cl_t)
            return x2, x2

        _, xs = jax.lax.scan(body, x0, (u, cl), unroll=config.unroll)
        return jnp.concatenate([x0[None], xs], axis=0)

    rollout_controls = jax.vmap(rollout_controls_one)

    def traj_cost_one(xs, u):
        run = jnp.sum(jax.vmap(running_cost)(xs[:-1], u, ts))
        return run + final_cost(xs[-1])

    traj_cost = jax.vmap(traj_cost_one)

    def rollout_gains_one(x0, xs_ref, u_ref, K, k, cl, alpha):
        def body(x, inp):
            x_ref, u_ref_t, K_t, k_t, cl_t = inp
            u_t = clamp(u_ref_t + alpha * k_t + K_t @ (x - x_ref))
            x2 = dyn(x, u_t, cl_t)
            return x2, (x2, u_t)

        _, (xs, us) = jax.lax.scan(
            body, x0, (xs_ref[:-1], u_ref, K, k, cl), unroll=config.unroll
        )
        return jnp.concatenate([x0[None], xs], axis=0), us

    rollout_gains = jax.vmap(
        rollout_gains_one, in_axes=(0, 0, 0, 0, 0, 0, None)
    )

    from nimblephysics_tpu.ops.contact import lcp_dim

    can_fuse = na > 0 and (lcp_dim(model) == 0 or classes is not None)
    fused_lin = config.linearize in ("auto", "jvp", "split", "vjp",
                                     "chain") and can_fuse
    fused = config.rollout == "auto" and can_fuse
    cl_kernel = None if classes is None else cl_bt
    if fused:
        from nimblephysics_tpu.ops.pallas_rollout import rollout_gains_pallas
    if fused_lin and classes is not None and config.linearize == "chain":
        from nimblephysics_tpu.ops.lane_chain import chained_linearize_vjp

        def dyn_jac(xs_bt, u_bt):
            return chained_linearize_vjp(
                model, xs_bt, u_bt, cl_kernel,
                cg_iters=config.planner_cg_iters,
                budget=config.chain_budget,
            )
    elif fused_lin and classes is not None and config.linearize in (
            "auto", "split", "vjp"):
        from nimblephysics_tpu.ops.pallas_linearize import (
            linear_position_update,
            linearize_pallas_split,
            linearize_pallas_vjp,
        )

        use_vjp = (config.linearize == "vjp") or (
            config.linearize == "auto"
            and linear_position_update(model) and model.nq >= 4
        )
        if use_vjp:
            # row-VJP refinement: only the v' half needs AD (nq cotangent
            # rows instead of nx+na JVP directions — ~1.8-2.4x less
            # per-point work); the q' rows are analytic for linearly-
            # integrating joints. nq >= 4: at tiny row counts the
            # per-grid-step overhead beats the flop saving (measured:
            # cartpole_limits nq=2 ran 2x slower on the row kernel).
            def dyn_jac(xs_bt, u_bt):
                return linearize_pallas_vjp(
                    model, xs_bt, u_bt, cl_kernel, block_b=block_b,
                    cg_iters=config.planner_cg_iters,
                )
        else:
            def dyn_jac(xs_bt, u_bt):
                return linearize_pallas_split(
                    model, xs_bt, u_bt, cl_kernel, block_b=block_b,
                    cg_iters=config.planner_cg_iters,
                )
    elif fused_lin:
        from nimblephysics_tpu.ops.pallas_linearize import linearize_pallas

        def dyn_jac(xs_bt, u_bt):
            return linearize_pallas(
                model, xs_bt, u_bt, block_b=block_b, classes=cl_kernel
            )
    else:
        def dyn_jac(xs_bt, u_bt):
            # chunk the jacfwd sweep over TIME: evaluating all B*T
            # linearizations at once materializes tens of GB of tangent
            # intermediates for contact models (observed 36.6G > 15.75G
            # HBM at B=1024, H=100 on the jump worm); a lax.map over
            # time-chunks caps the live set at B*Tc points
            B_, T_ = xs_bt.shape[0], xs_bt.shape[1]
            Tc = max(1, min(T_, 16384 // max(B_, 1)))
            if T_ % Tc != 0:
                Tc = 1
            n_c = T_ // Tc

            def one_chunk(args):
                xs_c, u_c, cl_c = args
                return jax.vmap(jax.vmap(jax.jacfwd(dyn, argnums=(0, 1))))(
                    xs_c, u_c, cl_c
                )

            def reshape_c(a):
                # (B, T, ...) -> (n_c, B, Tc, ...)
                return jnp.swapaxes(
                    a.reshape((B_, n_c, Tc) + a.shape[2:]), 0, 1
                )

            cl_c = jax.tree_util.tree_map(reshape_c, cl_bt)
            fx_c, fu_c = jax.lax.map(
                one_chunk, (reshape_c(xs_bt), reshape_c(u_bt), cl_c)
            )

            def unshape(a):
                a = jnp.swapaxes(a, 0, 1)  # (B, n_c, Tc, ...)
                return a.reshape((B_, T_) + a.shape[3:])

            return unshape(fx_c), unshape(fu_c)
    cost_grad = jax.vmap(jax.vmap(jax.grad(running_cost, argnums=(0, 1))))

    def hess_one(x, u_t, t):
        hxx = jax.hessian(running_cost, argnums=0)(x, u_t, t)
        huu = jax.hessian(running_cost, argnums=1)(x, u_t, t)
        hux = jax.jacobian(jax.grad(running_cost, argnums=1), argnums=0)(x, u_t, t)
        return hxx, huu, hux

    cost_hess = jax.vmap(jax.vmap(hess_one))

    from nimblephysics_tpu.ops.pallas_riccati import riccati_backward_pallas

    def backward(xs, u, reg):
        fx, fu = dyn_jac(xs[:, :-1], u)
        tsb = jnp.broadcast_to(ts, (B, T))
        lx, lu = cost_grad(xs[:, :-1], u, tsb)
        lxx, luu, lux = cost_hess(xs[:, :-1], u, tsb)
        Vx_T = jax.vmap(jax.grad(final_cost))(xs[:, -1])
        Vxx_T = jax.vmap(jax.hessian(final_cost))(xs[:, -1])
        if config.riccati == "parallel":
            # O(log T) associative-scan LQR in XLA — the humanoid-scale
            # fallback when the lane-Riccati kernel exceeds VMEM
            return jax.vmap(_parallel_riccati)(
                fx, fu, lx, lu, lxx, luu, lux, Vx_T, Vxx_T, reg
            )
        return riccati_backward_pallas(
            fx, fu, lx, lu, lxx, luu, lux, Vx_T, Vxx_T, reg, block_b=block_b
        )

    def iteration(carry, _):
        xs, u, cost, reg = carry
        K, k, _, pd_ok = backward(xs, u, reg)

        alphas = jnp.asarray(config.alphas, dtype=dtype)

        if fused:
            # the whole A-alpha closed-loop line search as one Pallas
            # rollout kernel ((alpha, world) pairs on lanes)
            xss, uss, costs = rollout_gains_pallas(
                model, running_cost, final_cost,
                x0_flat, xs, u, K, k, alphas, block_b=block_b,
                classes=cl_kernel, cg_iters=config.planner_cg_iters,
            )
        else:
            def try_alpha(alpha):
                xs2, u2 = rollout_gains(x0_flat, xs, u, K, k, cl_bt, alpha)
                return traj_cost(xs2, u2), xs2, u2

            costs, xss, uss = jax.vmap(try_alpha)(alphas)  # (A,B), (A,B,...)
        best = jnp.argmin(costs, axis=0)                # (B,)
        barange = jnp.arange(B)
        new_cost = costs[best, barange]
        improved = (new_cost < cost) & pd_ok
        xs_n = jnp.where(improved[:, None, None], xss[best, barange], xs)
        u_n = jnp.where(improved[:, None, None], uss[best, barange], u)
        cost_n = jnp.where(improved, new_cost, cost)
        reg_n = jnp.where(
            improved,
            jnp.maximum(reg * config.reg_down, config.reg_min),
            jnp.minimum(reg * config.reg_up, config.reg_max),
        )
        return (xs_n, u_n, cost_n, reg_n), (cost_n, K, k)

    u0 = clamp(u_init)
    if fused:
        # the initial open-loop rollout through the fused kernel too —
        # an XLA scan of the frozen step is a sequential tiny-op chain
        # (the same bottleneck class as the sequential mode rollout)
        nx_ = x0_flat.shape[-1]
        xss0, _, costs0 = rollout_gains_pallas(
            model, running_cost, final_cost, x0_flat,
            jnp.zeros((B, T + 1, nx_), dtype), u0,
            jnp.zeros((B, T, na, nx_), dtype),
            jnp.zeros((B, T, na), dtype),
            jnp.ones((1,), dtype), block_b=block_b,
            classes=cl_kernel, cg_iters=config.planner_cg_iters,
        )
        xs0, cost0 = xss0[0], costs0[0]
    else:
        xs0 = rollout_controls(x0_flat, u0, cl_bt)
        cost0 = traj_cost(xs0, u0)
    reg0 = jnp.full((B,), config.reg_init, dtype=dtype)
    (xs, u, cost, _), (hist, Ks, ks) = jax.lax.scan(
        iteration, (xs0, u0, cost0, reg0), None, length=config.iters
    )
    return ILQRSolution(u=u, x=xs, cost=cost, cost_history=hist,
                        K=Ks[-1], k=ks[-1])
