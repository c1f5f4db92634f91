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
    regularize_scales: float = 0.1,
    smooth_poses: float = 0.01,
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
        q_init = jnp.zeros((T, nq), dtype=dtype)

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

    opt = optax.adam(lr)

    def body(carry, _):
        p, s = carry
        val, g = jax.value_and_grad(loss)(p)
        updates, s = opt.update(g, s, p)
        return (optax.apply_updates(p, updates), s), val

    (params, _), hist = jax.lax.scan(
        body, (params0, opt.init(params0)), None, length=iters
    )

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
