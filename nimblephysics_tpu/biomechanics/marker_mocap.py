"""`MarkerMocap` — the user-facing one-stop mocap-processing wrapper.

Role parity with the reference's Python-level `MarkerMocap`
(/root/reference/python/nimblephysics/marker_mocap.py) and the
`MarkerFitter::runKinematicsPipeline` entry point
(/root/reference/dart/biomechanics/MarkerFitter.hpp:633): load a generic
OpenSim model, feed it marker clouds (TRC or C3D), and get back a scaled
skeleton, fitted marker offsets, per-frame poses, and an error report —
optionally followed by the dynamics pipeline when force plates are
available (the AddBiomechanics server flow, SURVEY.md §3.4).

Everything heavy is one jitted solve (`fit_markers`) — the reference's
multithreaded IPOPT bilevel is replaced by a batched first-order bilevel
on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.biomechanics.markers import (
    IKErrorReport,
    MarkerSet,
    marker_world_positions,
)
from nimblephysics_tpu.biomechanics.marker_fitter import (
    MarkerFitResult,
    fit_markers,
)
from nimblephysics_tpu.biomechanics.scaling import scale_bodies
from nimblephysics_tpu.models.model import Model, State


@dataclasses.dataclass
class MarkerMocapResult:
    model: Model                 # scaled skeleton
    poses: jax.Array             # (T, nq)
    scales: jax.Array            # (nb, 3)
    offsets: jax.Array           # fitted marker offsets (n_markers, 3)
    markers: MarkerSet           # marker set with fitted offsets
    report: IKErrorReport


class MarkerMocap:
    """Fit a generic model to marker data.

    >>> mocap = MarkerMocap.from_osim("subject.osim")
    >>> result = mocap.fit_trc("trial.trc")
    >>> result.report.root_mean_error
    """

    def __init__(self, model: Model, markers: MarkerSet,
                 state: Optional[State] = None):
        self.model = model
        self.markers = markers
        self.state = state

    @staticmethod
    def from_osim(path: str, ignore_joint_types: Sequence[str] = ()):
        from nimblephysics_tpu.utils.osim_parser import parse_osim

        model, state, markers = parse_osim(
            path, ignore_joint_types=tuple(ignore_joint_types)
        )
        return MarkerMocap(model, markers, state)

    # ------------------------------------------------------------------
    def fit_points(
        self,
        observed: jax.Array,                  # (T, n_markers, 3)
        mask: Optional[jax.Array] = None,
        labels: Optional[Sequence[str]] = None,
        iters: int = 600,
        **kwargs,
    ) -> MarkerMocapResult:
        """Run the kinematics pipeline on an observed marker-cloud tensor.
        `labels` reorders/filters observation columns to this model's
        marker names (unknown labels are dropped, missing ones masked)."""
        markers = self.markers
        T = observed.shape[0]
        if labels is not None:
            order = {n: i for i, n in enumerate(labels)}
            cols, keep = [], []
            for j, name in enumerate(markers.names):
                if name in order:
                    cols.append(order[name])
                    keep.append(j)
            keep_idx = jnp.asarray(keep, dtype=jnp.int32)
            col_idx = jnp.asarray(cols, dtype=jnp.int32)
            markers = MarkerSet(
                names=tuple(markers.names[j] for j in keep),
                body_indices=tuple(markers.body_indices[j] for j in keep),
                offsets=markers.offsets[keep_idx],
            )
            m = (
                mask[:, col_idx]
                if mask is not None
                else ~jnp.any(jnp.isnan(observed[:, col_idx]), axis=-1)
            )
            observed = jnp.nan_to_num(observed[:, col_idx])
        else:
            m = (
                mask
                if mask is not None
                else ~jnp.any(jnp.isnan(observed), axis=-1)
            )
            observed = jnp.nan_to_num(observed)

        if "q_init" not in kwargs and self.state is not None:
            # start sequential IK tracking from the model's default pose
            kwargs = {**kwargs, "q_init": self.state.q}
        fit: MarkerFitResult = jax.jit(
            lambda obs, mm: fit_markers(
                self.model, markers, obs, observed_mask=mm, iters=iters,
                **kwargs,
            )
        )(observed, m)

        scaled = scale_bodies(self.model, fit.scales)
        fitted_markers = MarkerSet(
            names=markers.names,
            body_indices=markers.body_indices,
            offsets=fit.offsets,
        )
        report = IKErrorReport(
            scaled, fitted_markers, fit.poses, observed, observed_mask=m
        )
        return MarkerMocapResult(
            model=scaled, poses=fit.poses, scales=fit.scales,
            offsets=fit.offsets, markers=fitted_markers, report=report,
        )

    def fit_trc(self, path: str, max_frames: int = 100, stride: int = 1,
                **kwargs) -> MarkerMocapResult:
        """Kinematics pipeline straight from a .trc marker file."""
        from nimblephysics_tpu.utils.osim_parser import load_trc

        _, labels, pts, mask = load_trc(path)
        pts = pts[::stride][:max_frames]
        mask = mask[::stride][:max_frames]
        return self.fit_points(
            jnp.asarray(np.nan_to_num(pts)),
            mask=jnp.asarray(mask),
            labels=labels,
            **kwargs,
        )

    def fit_c3d(self, path: str, max_frames: int = 100, stride: int = 1,
                **kwargs) -> MarkerMocapResult:
        """Kinematics pipeline straight from a .c3d file."""
        from nimblephysics_tpu.biomechanics.c3d import load_c3d

        c3d = load_c3d(path)
        pts = c3d.points[::stride][:max_frames]          # (T, n, 3)
        res = c3d.residuals[::stride][:max_frames]
        mask = (res >= 0) & ~np.any(np.isnan(pts), axis=-1)
        return self.fit_points(
            jnp.asarray(np.nan_to_num(pts)),
            mask=jnp.asarray(mask),
            labels=list(c3d.point_labels),
            **kwargs,
        )

    # ------------------------------------------------------------------
    def evaluate_performance(
        self,
        result: MarkerMocapResult,
        gold_model: Model,
        gold_markers: MarkerSet,
        gold_poses: jax.Array,
    ) -> dict:
        """Compare a fit against a gold-standard (manually scaled) model +
        IK (reference: MarkerMocap.evaluatePerformance). Returns error
        stats on shared markers."""
        shared = [n for n in result.markers.names if n in gold_markers.names]
        gi = [gold_markers.names.index(n) for n in shared]
        fi = [result.markers.names.index(n) for n in shared]
        gold_pred = jax.vmap(
            lambda q: marker_world_positions(gold_model, gold_markers, q)
        )(gold_poses)[:, jnp.asarray(gi)]
        T = min(gold_pred.shape[0], result.poses.shape[0])
        fit_pred = jax.vmap(
            lambda q: marker_world_positions(result.model, result.markers, q)
        )(result.poses)[:, jnp.asarray(fi)]
        err = jnp.linalg.norm(gold_pred[:T] - fit_pred[:T], axis=-1)
        return dict(
            shared_markers=len(shared),
            rmse=float(jnp.sqrt(jnp.mean(err**2))),
            max_error=float(jnp.max(err)),
        )
