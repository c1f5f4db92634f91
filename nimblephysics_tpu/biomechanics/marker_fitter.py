"""Marker fitting — the `MarkerFitter` bilevel pipeline, TPU-style.

Reference (`MarkerFitter::runKinematicsPipeline`, MarkerFitter.hpp:633):
fit skeleton SCALES + marker OFFSETS (subject-level) and per-frame POSES
(trial-level) to mocap point clouds via IPOPT bilevel optimization with
multithreaded per-frame IK. Here the whole bilevel problem is ONE jitted
Adam solve over the joint parameter pytree {scales, offsets, poses}:
per-frame terms vmap over the trial, subject-level variables broadcast,
and the anthropometric prior is a differentiable regularizer.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from nimblephysics_tpu.biomechanics.markers import MarkerSet, marker_world_positions
from nimblephysics_tpu.biomechanics.scaling import scale_bodies
from nimblephysics_tpu.models.model import Model


class MarkerFitResult(NamedTuple):
    scales: jax.Array        # (nb, 3)
    offsets: jax.Array       # (n_markers, 3) fitted marker offsets
    poses: jax.Array         # (T, nq)
    loss_history: jax.Array
    marker_rmse: jax.Array   # final RMS marker distance


def _gn_frame(model: Model, markers: MarkerSet, q0, obs_t, w_t,
              iters: int = 10, damping: float = 1e-5):
    """Single-frame damped Gauss-Newton IK step loop (the reference's
    per-frame Newton IK, math/IKSolver); accepts only improving steps."""
    nq = model.nq

    def res_fn(q):
        pred = marker_world_positions(model, markers, q)
        return ((pred - obs_t) * w_t).reshape(-1)

    def body(q, _):
        r = res_fn(q)
        J = jax.jacfwd(res_fn)(q)
        H = J.T @ J + damping * jnp.eye(nq, dtype=q.dtype)
        dq = jnp.linalg.solve(H, J.T @ r)
        q2 = q - dq
        better = jnp.sum(res_fn(q2) ** 2) < jnp.sum(r * r)
        return jnp.where(better, q2, q), None

    q, _ = jax.lax.scan(body, q0, None, length=iters)
    return q


def ik_polish(
    model: Model,
    markers: MarkerSet,
    observed: jax.Array,       # (T, nm, 3)
    w: jax.Array,              # (T, nm, 1) weights
    poses: jax.Array,          # (T, nq)
    iters: int = 10,
    damping: float = 1e-5,
) -> jax.Array:
    """Per-frame damped Gauss-Newton IK polish, vmapped over frames
    (the reference's per-frame Newton IK inside the kinematics pipeline,
    MarkerFitter.hpp:633)."""
    return jax.vmap(
        lambda q0, o, ww: _gn_frame(model, markers, q0, o, ww, iters, damping)
    )(poses, observed, w)


def sequential_ik_track(
    model: Model,
    markers: MarkerSet,
    observed: jax.Array,       # (T, nm, 3)
    w: jax.Array,              # (T, nm, 1)
    q0: jax.Array,             # (nq,) starting pose (model default pose)
    first_iters: int = 40,
    track_iters: int = 6,
) -> jax.Array:
    """Track the trial sequentially: solve frame 0 from the default pose,
    then initialize each frame's GN from the previous frame's solution —
    temporal continuity keeps every frame in the same kinematic basin
    (per-frame independent inits fall into mirrored/twisted limb minima).
    This is the reference pipeline's IK-init role (MarkerFitter's
    per-trial initial IK pass)."""
    q_first = _gn_frame(model, markers, q0, observed[0], w[0],
                        iters=first_iters)

    def step(q_prev, inputs):
        obs_t, w_t = inputs
        q = _gn_frame(model, markers, q_prev, obs_t, w_t, iters=track_iters)
        return q, q

    _, q_track = jax.lax.scan(step, q_first, (observed, w))
    return q_track


class BilevelFitResult(NamedTuple):
    scales: jax.Array        # (nb, 3)
    offsets: jax.Array       # (n_markers, 3) fitted marker offsets
    poses: jax.Array         # (n_trials, T, nq) inner-IK poses
    loss_history: jax.Array  # (outer_iters,)
    marker_rmse: jax.Array


def fit_markers_bilevel(
    model: Model,
    markers: MarkerSet,
    trials,                              # (T,nm,3) or list of (T_i,nm,3)
    masks=None,                          # matching (T,nm) bool per trial
    q_inits=None,                        # matching (T,nq) per trial
    outer_iters: int = 150,
    inner_gn_iters: int = 4,
    lr: float = 3e-2,
    scale_bounds: tuple = (0.7, 1.4),
    regularize_offsets: float = 1.0,
    regularize_scales: float = 1e-3,
    scale_prior=None,
    final_inner_iters: int = 12,
) -> BilevelFitResult:
    """TRUE bilevel marker fit — the reference MarkerFitter's structure
    (MarkerFitter.hpp:625-900): an OUTER optimization over the subject-
    level variables (body scales + marker offsets) whose objective is
    evaluated at the INNER argmin — per-frame IK poses solved for every
    outer iterate — rather than the joint {scales, offsets, poses}
    first-order solve of `fit_markers`.

    TPU-first factoring of the same structure:
      * inner solver: damped Gauss-Newton IK, vmapped over every frame of
        every trial at once (the reference's per-frame IPOPT/Newton
        thread pool becomes one batched kernel), warm-started from the
        previous outer iterate's poses;
      * outer gradient: by the envelope theorem, at an inner optimum
        ∂q*/∂θ contributes nothing to dL/dθ (∂L/∂q = 0), so the outer
        step differentiates the marker loss wrt (scales, offsets) at
        frozen poses — exactly the reduced gradient the reference's
        bilevel IPOPT formulation uses, with no unrolled-inner AD;
      * multi-trial: trials are padded to a common length and batched; a
        single (scales, offsets) serves all trials (the reference's
        multi-trial kinematics pipeline).
    """
    if not isinstance(trials, (list, tuple)):
        trials = [trials]
    n_trials = len(trials)
    dtype = model.mass.dtype
    nm = len(markers.names)
    nq, nb = model.nq, model.num_bodies
    T_max = max(t.shape[0] for t in trials)

    obs = jnp.zeros((n_trials, T_max, nm, 3), dtype)
    w = jnp.zeros((n_trials, T_max, nm, 1), dtype)
    for i, tr in enumerate(trials):
        tr = jnp.asarray(tr, dtype)
        Ti = tr.shape[0]
        mk = (jnp.ones((Ti, nm), bool) if masks is None or masks[i] is None
              else jnp.asarray(masks[i], bool))
        obs = obs.at[i, :Ti].set(jnp.nan_to_num(tr))
        w = w.at[i, :Ti].set(mk.astype(dtype)[..., None])

    lo_s, hi_s = jnp.log(scale_bounds[0]), jnp.log(scale_bounds[1])

    def build(theta):
        scales = jnp.exp(jnp.clip(theta["log_scales"], lo_s, hi_s))
        m2 = scale_bodies(model, scales)
        mk_s = markers.scaled(scales)
        mk2 = mk_s.with_offsets(mk_s.offsets + theta["d_offsets"])
        return m2, mk2, scales

    # ---- inner solver: batched per-frame GN IK at fixed theta ---------
    def inner_solve(theta, poses, n_iters):
        m2, mk2, _ = build(theta)
        flat_q = poses.reshape(n_trials * T_max, nq)
        flat_o = obs.reshape(n_trials * T_max, nm, 3)
        flat_w = w.reshape(n_trials * T_max, nm, 1)
        q2 = jax.vmap(
            lambda q0, o, ww: _gn_frame(m2, mk2, q0, o, ww, n_iters)
        )(flat_q, flat_o, flat_w)
        return q2.reshape(n_trials, T_max, nq)

    def outer_loss(theta, poses):
        m2, mk2, scales = build(theta)
        pred = jax.vmap(jax.vmap(
            lambda q: marker_world_positions(m2, mk2, q)
        ))(poses)
        err = (pred - obs) * w
        data = jnp.sum(err * err) / jnp.maximum(jnp.sum(w), 1.0)
        reg = regularize_offsets * jnp.mean(theta["d_offsets"] ** 2)
        reg += regularize_scales * jnp.mean(theta["log_scales"] ** 2)
        if scale_prior is not None:
            reg += -1e-3 * scale_prior.log_pdf(scales)
        return data + reg

    # ---- initial inner poses: sequential tracking per trial -----------
    if q_inits is None:
        poses0 = jnp.stack([
            sequential_ik_track(
                model, markers, obs[i], w[i], jnp.zeros(nq, dtype)
            )
            for i in range(n_trials)
        ])
    else:
        poses0 = jnp.stack([jnp.asarray(q, dtype) for q in q_inits])

    theta0 = dict(
        log_scales=jnp.zeros((nb, 3), dtype),
        d_offsets=jnp.zeros((nm, 3), dtype),
    )
    opt = optax.adam(optax.cosine_decay_schedule(lr, outer_iters, alpha=0.1))

    def outer_step(carry, _):
        theta, poses, opt_state = carry
        # inner argmin (warm-started); envelope theorem: freeze poses
        poses = jax.lax.stop_gradient(
            inner_solve(theta, poses, inner_gn_iters)
        )
        val, g = jax.value_and_grad(outer_loss)(theta, poses)
        updates, opt_state = opt.update(g, opt_state, theta)
        return (optax.apply_updates(theta, updates), poses, opt_state), val

    (theta, poses, _), hist = jax.lax.scan(
        outer_step, (theta0, poses0, opt.init(theta0)), None,
        length=outer_iters,
    )
    # final tight inner solve on the fitted subject geometry
    poses = inner_solve(theta, poses, final_inner_iters)

    m2, mk2, scales = build(theta)
    pred = jax.vmap(jax.vmap(
        lambda q: marker_world_positions(m2, mk2, q)
    ))(poses)
    err = (pred - obs) * w
    rmse = jnp.sqrt(jnp.sum(err * err) / jnp.maximum(jnp.sum(w), 1.0))
    return BilevelFitResult(
        scales=scales,
        offsets=mk2.offsets,
        poses=poses,
        loss_history=hist,
        marker_rmse=rmse,
    )


def find_joint_centers(
    model: Model,
    markers: MarkerSet,
    observed,
    mask=None,
):
    """Closed-form joint-center estimation from marker clouds (reference
    MarkerFitter::findJointCenters, MarkerFitter.hpp:760) — delegates to
    the IKInitializer's center-of-rotation least squares. Returns
    (centers_world (T, nb, 3) with nan where unobserved, valid (nb,))."""
    from nimblephysics_tpu.biomechanics.ik_initializer import (
        body_cluster_poses,
        closed_form_joint_centers,
    )
    import numpy as np

    observed = np.asarray(observed, np.float64)
    if mask is None:
        mask = ~np.any(np.isnan(observed), axis=-1)
    clusters = body_cluster_poses(
        model, markers, np.nan_to_num(observed), np.asarray(mask, bool)
    )
    centers, jvalid, _, _ = closed_form_joint_centers(model, clusters)
    return centers, jvalid


def fit_markers(
    model: Model,
    markers: MarkerSet,
    observed: jax.Array,                 # (T, n_markers, 3)
    observed_mask: Optional[jax.Array] = None,   # (T, n_markers) bool
    q_init: Optional[jax.Array] = None,  # (T, nq)
    iters: int = 600,
    lr: float = 2e-2,
    scale_bounds: tuple = (0.7, 1.4),
    regularize_offsets: float = 1.0,
    regularize_scales: float = 1e-3,
    smooth_poses: float = 1e-3,
    scale_prior=None,                    # optional Anthropometrics
) -> MarkerFitResult:
    """Jointly fit (scales, marker offsets, per-frame poses)."""
    T = observed.shape[0]
    nm = len(markers.names)
    nq, nb = model.nq, model.num_bodies
    dtype = model.mass.dtype
    if observed_mask is None:
        observed_mask = jnp.ones((T, nm), dtype=bool)
    w = observed_mask.astype(dtype)[..., None]
    if q_init is None:
        q_init = jnp.zeros((nq,), dtype=dtype)
    q_init = jnp.asarray(q_init, dtype=dtype)
    if q_init.ndim == 1:
        # single starting pose: sequential GN tracking builds the initial
        # trajectory (frame-to-frame continuity avoids mirrored-limb basins)
        q_init = sequential_ik_track(model, markers, observed, w, q_init)

    params0 = dict(
        log_scales=jnp.zeros((nb, 3), dtype=dtype),
        d_offsets=jnp.zeros((nm, 3), dtype=dtype),
        poses=q_init,
    )
    lo_s, hi_s = jnp.log(scale_bounds[0]), jnp.log(scale_bounds[1])

    def build(params):
        scales = jnp.exp(jnp.clip(params["log_scales"], lo_s, hi_s))
        m2 = scale_bodies(model, scales)
        mk2 = markers.scaled(scales).with_offsets(
            markers.scaled(scales).offsets + params["d_offsets"]
        )
        return m2, mk2, scales

    def loss(params):
        m2, mk2, scales = build(params)
        pred = jax.vmap(lambda q: marker_world_positions(m2, mk2, q))(
            params["poses"]
        )
        err = (pred - observed) * w
        data = jnp.sum(err * err) / jnp.maximum(jnp.sum(w), 1.0)
        reg = regularize_offsets * jnp.mean(params["d_offsets"] ** 2)
        reg += regularize_scales * jnp.mean(params["log_scales"] ** 2)
        if smooth_poses > 0 and T > 1:
            dq = params["poses"][1:] - params["poses"][:-1]
            reg += smooth_poses * jnp.mean(dq * dq)
        if scale_prior is not None:
            reg += -1e-3 * scale_prior.log_pdf(scales)
        return data + reg

    # Staged optimization (the reference's pipeline structure,
    # MarkerFitter::runKinematicsPipeline, MarkerFitter.hpp:633:
    # initial per-frame IK -> joint scale/offset/pose bilevel): stage 1
    # fits POSES ONLY (scales/offsets frozen) so the kinematics land in
    # the right basin before the subject-level variables can compensate;
    # stage 2 optimizes the joint pytree with a cosine-decayed step.
    def masked_stage(params, n_steps, mask_fn, schedule):
        opt = optax.adam(schedule)
        opt_state = opt.init(params)

        def body(carry, _):
            p, s = carry
            val, g = jax.value_and_grad(loss)(p)
            g = mask_fn(g)
            updates, s = opt.update(g, s, p)
            return (optax.apply_updates(p, updates), s), val

        (params, _), hist = jax.lax.scan(
            body, (params, opt_state), None, length=n_steps
        )
        return params, hist

    n1 = max(1, iters // 3)
    n2 = max(1, iters - n1)

    def poses_only(g):
        return dict(
            log_scales=jnp.zeros_like(g["log_scales"]),
            d_offsets=jnp.zeros_like(g["d_offsets"]),
            poses=g["poses"],
        )

    def polish(params, gn_iters=10):
        m2, mk2, _ = build(params)
        q2 = ik_polish(m2, mk2, observed, w, params["poses"], iters=gn_iters)
        return {**params, "poses": q2}

    # stage 1: coarse per-frame pose fit (Adam basin-finding + GN landing)
    params, hist1 = masked_stage(params0, n1, poses_only, lr)
    params = polish(params)
    # stage 2: joint bilevel (scales/offsets/poses), then a final GN
    # landing on the fitted subject geometry
    params, hist2 = masked_stage(
        params, n2, lambda g: g,
        optax.cosine_decay_schedule(lr, n2, alpha=0.05),
    )
    params = polish(params)
    hist = jnp.concatenate([hist1, hist2])

    m2, mk2, scales = build(params)
    pred = jax.vmap(lambda q: marker_world_positions(m2, mk2, q))(params["poses"])
    err = (pred - observed) * w
    rmse = jnp.sqrt(jnp.sum(err * err) / jnp.maximum(jnp.sum(w), 1.0))
    return MarkerFitResult(
        scales=scales,
        offsets=mk2.offsets,
        poses=params["poses"],
        loss_history=hist,
        marker_rmse=rmse,
    )
