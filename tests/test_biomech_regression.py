"""Golden-data regression: the reference's own Arnold2013Synthetic suite
(unittests/regression/test_Arnold2013Synthetic_MarkerFitter.cpp).

Runs the marker-fitting kinematics pipeline on the reference's committed
regression dataset (data/regression/Arnold2013Synthetic): fit the UNSCALED
generic model to the walk2 marker trajectories, then compare fitted poses
against the golden IK coordinates with the reference's acceptance
threshold (average per-dof pose error < 0.05 rad/m,
test_Arnold2013Synthetic_MarkerFitter.cpp:359-370).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from nimblephysics_tpu.biomechanics.marker_mocap import MarkerMocap
from nimblephysics_tpu.utils.osim_parser import load_mot, load_trc

DATA = "/root/reference/data/regression/Arnold2013Synthetic"

needs_data = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference regression data not present"
)


def _run_subject(subject: str, stride: int = 6, iters: int = 3000):
    times, labels, pts, mask = load_trc(
        f"{DATA}/{subject}/trials/walk2/markers.trc"
    )
    cols, gold = load_mot(f"{DATA}/{subject}/coordinates.sto")
    T = min(pts.shape[0], gold.shape[0])

    mocap = MarkerMocap.from_osim(f"{DATA}/unscaled_generic.osim")
    res = mocap.fit_points(
        jnp.asarray(pts[:T:stride]),
        mask=jnp.asarray(mask[:T:stride]),
        labels=list(labels),
        iters=iters,
    )

    gold_t = gold[:T:stride]
    col_map = {c: i for i, c in enumerate(cols)}
    errs = []
    for i, name in enumerate(res.model.dof_names):
        if name in col_map:
            errs.append(
                np.abs(np.asarray(res.poses[:, i]) - gold_t[:, col_map[name]]).mean()
            )
    return float(np.mean(errs)), float(res.report.root_mean_squared_error), res


@needs_data
def test_arnold2013_subject01_marker_fitter_golden():
    avg_pose_err, rmse, res = _run_subject("subject01")
    # the reference's own regression threshold
    # (test_Arnold2013Synthetic_MarkerFitter.cpp:359: threshold = 0.05)
    assert avg_pose_err < 0.05, f"avg per-dof pose error {avg_pose_err}"
    # synthetic noiseless markers: the kinematic fit must be ~mm-exact
    assert rmse < 2e-3, f"marker RMSE {rmse}"
    # fitted scales are physical
    s = np.asarray(res.scales)
    assert (s > 0.7).all() and (s < 1.4).all()


@needs_data
@pytest.mark.slow
@pytest.mark.parametrize(
    "subject", ["subject02", "subject04", "subject18", "subject19"]
)
def test_arnold2013_remaining_subjects_marker_fitter_golden(subject):
    """The rest of the reference's Arnold2013Synthetic battery
    (test_Arnold2013Synthetic_MarkerFitter.cpp:435-463: subjects 01, 02,
    04, 18, 19 — subject01 is covered above), at the reference's own
    acceptance thresholds (:359-377): average per-dof pose error < 0.05
    and average marker RMSE < 0.01 m."""
    avg_pose_err, rmse, res = _run_subject(subject)
    assert avg_pose_err < 0.05, f"{subject}: avg per-dof pose error {avg_pose_err}"
    assert rmse < 0.01, f"{subject}: marker RMSE {rmse}"
    s = np.asarray(res.scales)
    assert (s > 0.7).all() and (s < 1.4).all()
