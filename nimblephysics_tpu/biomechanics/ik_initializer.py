"""Closed-form IK initialization — the `IKInitializer` pipeline.

Reference: `dart/biomechanics/IKInitializer.cpp` (4,151 LoC) — before any
optimization runs, estimate (a) per-joint centers from marker clusters,
(b) per-body scales from inter-joint-center distances, and (c) per-frame
poses, all in closed form (`runFullPipeline`: closedFormMDSJointCenter
Solver → estimateGroupScalesClosedForm → estimatePosesWithIK).  The
MarkerFitter then starts its bilevel fit from this initialization instead
of from the generic model.

TPU-style factoring: the closed-form stages are one-time host-side linear
algebra per subject (the reference also runs them on CPU); the per-frame
pose recovery reuses the jitted sequential Gauss-Newton IK that the
marker fitter's inner loop runs on accelerator.

Pipeline math (same estimators as the reference, different organization):

  1. CLUSTER POSES.  Each body with >=3 observed markers gets a per-frame
     similarity transform (R, t, s) from its model-frame marker offsets
     to the observed cloud (Umeyama closed form).  The s estimates are a
     first closed-form body-scale signal; the rigid parts give segment
     kinematics without any joint model.
  2. JOINT CENTERS.  For a joint between parent p and child c, the center
     is one point fixed in BOTH segment frames:  R_p(t) a_p + t_p(t) =
     R_c(t) a_c + t_c(t) for all t — a 6-unknown linear least squares
     over the trial (the classic center-of-rotation estimator; the role
     of the reference's closedFormMDSJointCenterSolver /
     ChangPollard2007).  Axis-degenerate joints (hinges barely moving)
     are regularized toward the model's anchor points.
  3. SCALES.  Bodies bounded by two estimated joint centers scale by the
     measured inter-center distance over the model's anchor distance
     (estimateGroupScalesClosedForm); remaining bodies fall back to the
     cluster-pose scale, then to the subject-height ratio.
  4. POSES.  estimatePosesWithIK: sequential damped Gauss-Newton IK on
     the scaled skeleton (frame-to-frame warm starts).

Golden regression: tests/test_biomech_regression.py runs this pipeline on
the reference's Arnold2013Synthetic dataset against the committed gold
coordinates, at the reference's own acceptance threshold
(test_Arnold2013Synthetic_IKInitializer.cpp:167: avg per-dof pose error
< 0.06 with unknown scales).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from nimblephysics_tpu.biomechanics.markers import MarkerSet
from nimblephysics_tpu.biomechanics.scaling import scale_bodies
from nimblephysics_tpu.models.model import Model
from nimblephysics_tpu.ops import dynamics as dyn


# ---------------------------------------------------------------------------
# Stage primitives (kept as standalone functions — also used directly by
# tests and by MarkerFitter.find_joint_centers)
# ---------------------------------------------------------------------------


def estimate_joint_center(marker_trajs: Sequence[np.ndarray]) -> np.ndarray:
    """Gamage–Lasenby sphere fit: marker_trajs = list of (T, 3) marker
    paths whose distance to a common (quasi-stationary) center is
    constant. Returns the (3,) center minimizing
    sum_m sum_t (||p_mt − c||² − r_m²)²."""
    A = np.zeros((3, 3))
    b = np.zeros(3)
    for traj in marker_trajs:
        p = np.asarray(traj, dtype=np.float64)
        pbar = p.mean(axis=0)
        d = p - pbar
        sq = np.einsum("ti,ti->t", p, p)
        sqbar = sq.mean()
        A += 2.0 * (d.T @ d)
        b += np.einsum("ti,t->i", d, sq - sqbar)
    return np.linalg.solve(A + 1e-12 * np.eye(3), b)


def estimate_joint_centers_in_segment_frames(
    parent_markers: Dict[str, np.ndarray],
    child_markers: Dict[str, np.ndarray],
) -> np.ndarray:
    """Gamage–Lasenby on the union of both segments' marker paths (each
    keeps constant distance to the true center in quasi-stationary
    trials)."""
    trajs = list(parent_markers.values()) + list(child_markers.values())
    return estimate_joint_center(trajs)


def segment_lengths_from_centers(
    centers: Dict[str, np.ndarray], chain: Sequence[Tuple[str, str]]
) -> Dict[Tuple[str, str], float]:
    """Bone lengths from consecutive joint centers — the scale signal
    IKInitializer feeds the MarkerFitter."""
    return {
        (a, b): float(np.linalg.norm(centers[a] - centers[b]))
        for a, b in chain
    }


def umeyama(src: np.ndarray, dst: np.ndarray, with_scale: bool = True):
    """Closed-form similarity transform dst ≈ s R src + t (Umeyama 1991).
    src, dst: (k, 3). Returns (R (3,3), t (3,), s float)."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    ds = src - mu_s
    dd = dst - mu_d
    cov = dd.T @ ds / len(src)
    U, S, Vt = np.linalg.svd(cov)
    sign = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1.0, 1.0, sign])
    R = U @ D @ Vt
    var_s = np.einsum("ki,ki->", ds, ds) / len(src)
    s = float((S[0] + S[1] + sign * S[2]) / max(var_s, 1e-12)) \
        if with_scale else 1.0
    t = mu_d - s * (R @ mu_s)
    return R, t, s


class ClusterPoses(NamedTuple):
    """Per-body per-frame similarity poses from marker clouds."""

    R: np.ndarray        # (T, nb, 3, 3)
    t: np.ndarray        # (T, nb, 3)
    s: np.ndarray        # (nb,) median cluster scale
    valid: np.ndarray    # (T, nb) bool — >=3 markers observed that frame


def body_cluster_poses(
    model: Model,
    markers: MarkerSet,
    observed: np.ndarray,       # (T, nm, 3)
    mask: np.ndarray,           # (T, nm) bool
) -> ClusterPoses:
    """Stage 1: per-frame similarity pose of every marker cluster."""
    T, nm, _ = observed.shape
    nb = model.num_bodies
    offs = np.asarray(markers.offsets, np.float64)
    by_body: Dict[int, List[int]] = {}
    for i, b in enumerate(markers.body_indices):
        by_body.setdefault(int(b), []).append(i)

    R = np.tile(np.eye(3), (T, nb, 1, 1))
    t = np.zeros((T, nb, 3))
    valid = np.zeros((T, nb), bool)
    s_est: List[List[float]] = [[] for _ in range(nb)]
    for b, idxs in by_body.items():
        if len(idxs) < 3:
            continue
        local = offs[idxs]
        # degenerate (collinear) clusters can't define a frame
        if np.linalg.matrix_rank(local - local.mean(0), tol=1e-9) < 2:
            continue
        for f in range(T):
            ok = [i for i in idxs if mask[f, i]]
            if len(ok) < 3:
                continue
            li = [idxs.index(i) for i in ok]
            Rf, tf, sf = umeyama(local[li], observed[f, ok])
            R[f, b] = Rf
            t[f, b] = tf
            valid[f, b] = True
            s_est[b].append(sf)
    s = np.array([np.median(v) if v else np.nan for v in s_est])
    return ClusterPoses(R, t, s, valid)


def closed_form_joint_centers(
    model: Model,
    clusters: ClusterPoses,
    reg: float = 1e-3,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Stage 2: per-joint center-of-rotation least squares.

    Returns (centers_world (T, nb, 3), valid (nb,), anchors_parent
    (nb, 3), anchors_child (nb, 3)) — joint j connects parents[j] → j;
    anchors are the estimated center in each body's cluster frame."""
    T = clusters.R.shape[0]
    nb = model.num_bodies
    T_pj_p = np.asarray(model.T_pj.p, np.float64)
    T_cj_p = np.asarray(model.T_cj.p, np.float64)
    centers = np.full((T, nb, 3), np.nan)
    a_p_out = np.zeros((nb, 3))
    a_c_out = np.zeros((nb, 3))
    jvalid = np.zeros(nb, bool)
    for j in range(nb):
        p = model.parents[j]
        if p < 0:
            continue
        frames = np.where(clusters.valid[:, p] & clusters.valid[:, j])[0]
        if len(frames) < 5:
            continue
        # rows: R_p a_p − R_c a_c = t_c − t_p
        A = np.zeros((3 * len(frames) + 6, 6))
        b = np.zeros(3 * len(frames) + 6)
        for r, f in enumerate(frames):
            A[3 * r: 3 * r + 3, :3] = clusters.R[f, p]
            A[3 * r: 3 * r + 3, 3:] = -clusters.R[f, j]
            b[3 * r: 3 * r + 3] = clusters.t[f, j] - clusters.t[f, p]
        # Tikhonov toward the model's (cluster-scaled) anchors: hinge
        # joints leave the along-axis component unobservable
        sp = clusters.s[p] if np.isfinite(clusters.s[p]) else 1.0
        sc = clusters.s[j] if np.isfinite(clusters.s[j]) else 1.0
        lam = reg * len(frames)
        A[-6:-3, :3] = lam * np.eye(3)
        b[-6:-3] = lam * sp * T_pj_p[j]
        A[-3:, 3:] = lam * np.eye(3)
        b[-3:] = lam * sc * T_cj_p[j]
        sol, *_ = np.linalg.lstsq(A, b, rcond=None)
        a_p, a_c = sol[:3], sol[3:]
        a_p_out[j] = a_p
        a_c_out[j] = a_c
        jvalid[j] = True
        for f in range(T):
            w = []
            if clusters.valid[f, p]:
                w.append(clusters.R[f, p] @ a_p + clusters.t[f, p])
            if clusters.valid[f, j]:
                w.append(clusters.R[f, j] @ a_c + clusters.t[f, j])
            if w:
                centers[f, j] = np.mean(w, axis=0)
    return centers, jvalid, a_p_out, a_c_out


def estimate_group_scales_closed_form(
    model: Model,
    centers: np.ndarray,      # (T, nb, 3) world joint centers (nan invalid)
    jvalid: np.ndarray,       # (nb,)
    cluster_scales: np.ndarray,   # (nb,) stage-1 similarity scales
    height_m: Optional[float] = None,
) -> np.ndarray:
    """Stage 3: per-body isotropic scales.

    Primary signal: for body b bounded by its own joint center and a
    child's joint center, scale = measured mean center distance / model
    anchor distance. Fallbacks: the body's cluster-pose scale, then the
    subject-height ratio, then the mean of resolved scales."""
    nb = model.num_bodies
    T_pj_p = np.asarray(model.T_pj.p, np.float64)
    T_cj_p = np.asarray(model.T_cj.p, np.float64)
    children: Dict[int, List[int]] = {}
    for j in range(nb):
        if model.parents[j] >= 0:
            children.setdefault(model.parents[j], []).append(j)

    scales = np.full(nb, np.nan)
    for b in range(nb):
        ratios = []
        for ch in children.get(b, []):
            if not (jvalid[b] and jvalid[ch]):
                continue
            d_model = np.linalg.norm(T_cj_p[b] - T_pj_p[ch])
            if d_model < 1e-6:
                continue
            d = np.linalg.norm(centers[:, b] - centers[:, ch], axis=-1)
            d = d[np.isfinite(d)]
            if len(d) == 0:
                continue
            ratios.append(float(np.median(d)) / float(d_model))
        if ratios:
            scales[b] = float(np.mean(ratios))
        elif np.isfinite(cluster_scales[b]):
            scales[b] = float(cluster_scales[b])

    if height_m is not None:
        h_model = _model_height(model)
        if h_model > 0.1:
            default = height_m / h_model
        else:
            default = np.nan
    else:
        default = np.nan
    if not np.isfinite(default):
        found = scales[np.isfinite(scales)]
        default = float(found.mean()) if len(found) else 1.0
    scales = np.where(np.isfinite(scales), scales, default)
    return np.clip(scales, 0.5, 2.0)


def _model_height(model: Model) -> float:
    """Neutral-pose extent of the joint anchors along the up axis
    (−gravity) — the denominator of the subject-height scale ratio."""
    q0 = jnp.zeros(model.nq, dtype=model.mass.dtype)
    kin = dyn.forward_kinematics(model, q0)
    g = np.asarray(model.gravity, np.float64)
    up = -g / max(np.linalg.norm(g), 1e-9)
    heights = []
    for j in range(model.num_bodies):
        p = model.parents[j]
        pj = np.asarray(model.T_pj.p, np.float64)[j]
        if p >= 0:
            w = np.asarray(kin.T_wb[p].apply(jnp.asarray(pj)))
        else:
            w = pj
        heights.append(float(np.dot(w, up)))
    return max(heights) - min(heights) if heights else 0.0


# ---------------------------------------------------------------------------
# The pipeline object (reference: IKInitializer::runFullPipeline)
# ---------------------------------------------------------------------------


class IKInitializerResult(NamedTuple):
    poses: np.ndarray          # (T, nq)
    scales: np.ndarray         # (nb, 3) isotropic per-body scales
    joint_centers: np.ndarray  # (T, nb, 3) world (nan where unobserved)
    joint_valid: np.ndarray    # (nb,) bool
    model: Model               # scaled skeleton
    markers: MarkerSet         # scaled marker set


def run_ik_initializer(
    model: Model,
    markers: MarkerSet,
    observed,                   # (T, nm, 3)
    mask=None,                  # (T, nm) bool
    height_m: Optional[float] = None,
    known_scales: Optional[np.ndarray] = None,   # (nb, 3) skip stages 1-3
    ik_first_iters: int = 40,
    ik_track_iters: int = 6,
) -> IKInitializerResult:
    """Full closed-form pipeline: cluster poses → joint centers → scales
    → sequential IK poses (reference IKInitializer::runFullPipeline;
    with `known_scales` it mirrors the knownScalesInAdvance branch:
    closedFormMDSJointCenterSolver + estimatePosesWithIK only)."""
    from nimblephysics_tpu.biomechanics.marker_fitter import (
        sequential_ik_track,
    )

    observed = np.asarray(observed, np.float64)
    T, nm, _ = observed.shape
    if mask is None:
        mask = ~np.any(np.isnan(observed), axis=-1)
    mask = np.asarray(mask, bool)
    observed = np.nan_to_num(observed)

    clusters = body_cluster_poses(model, markers, observed, mask)
    centers, jvalid, _, _ = closed_form_joint_centers(model, clusters)
    if known_scales is not None:
        scales = np.asarray(known_scales, np.float64)
        if scales.ndim == 1:
            scales = np.repeat(scales[:, None], 3, axis=1)
    else:
        s_iso = estimate_group_scales_closed_form(
            model, centers, jvalid, clusters.s, height_m
        )
        scales = np.repeat(s_iso[:, None], 3, axis=1)

    dtype = model.mass.dtype
    scales_j = jnp.asarray(scales, dtype)
    model_s = scale_bodies(model, scales_j)
    markers_s = markers.scaled(scales_j)

    w = jnp.asarray(mask, dtype)[..., None]
    q0 = jnp.zeros(model.nq, dtype)
    poses = sequential_ik_track(
        model_s, markers_s, jnp.asarray(observed, dtype), w, q0,
        first_iters=ik_first_iters, track_iters=ik_track_iters,
    )
    return IKInitializerResult(
        poses=np.asarray(poses),
        scales=scales,
        joint_centers=centers,
        joint_valid=jvalid,
        model=model_s,
        markers=markers_s,
    )
