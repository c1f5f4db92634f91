"""AddBiomechanics-style subject pipeline on a REAL subject (welk002).

Loads the unscaled generic OpenSim model (v4, spline CustomJoints) and the
subject's manually-scaled model + IK trial from the reference data, then:
  1. synthesizes "mocap" marker clouds from the manually-scaled model
     playing the manual IK motion (ground truth available => errors are
     measurable),
  2. runs the marker-fitting pipeline (scales + offsets + poses) starting
     from the UNSCALED generic model,
  3. reports marker RMSE and writes the result as a binary subject file.

This is the `MarkerFitter::runKinematicsPipeline` +
`SubjectOnDisk::writeB3D` flow (MarkerFitter.hpp:633, SubjectOnDisk.cpp).
"""

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.biomechanics import (
    IKErrorReport,
    fit_markers,
    marker_world_positions,
    scale_bodies,
    write_subject,
)
from nimblephysics_tpu.utils.osim_parser import load_mot, parse_osim

BASE = "/root/reference/data/osim/welk002"


def main():
    generic, s0g, markers_g = parse_osim(f"{BASE}/unscaled_generic.osim")
    scaled, s0s, markers_s = parse_osim(f"{BASE}/manually_scaled.osim")
    print(f"model: {generic.num_bodies} bodies, nq={generic.nq}, "
          f"{len(markers_g.names)} markers")

    cols, mot = load_mot(f"{BASE}/manual_ik.mot")
    T = 25
    frames = np.linspace(0, len(mot) - 1, T).astype(int)
    # the .mot column order matches the model's coordinate order after
    # 'time'; angles are degrees in OpenSim mot files
    qs = np.deg2rad(mot[frames, 1:1 + scaled.nq])
    # translations (pelvis tx/ty/tz are dofs 3-5 of the root custom joint)
    qs[:, 3:6] = mot[frames, 4:7]
    qs = jnp.asarray(qs, dtype=scaled.mass.dtype)

    # synthesize mocap from the scaled subject
    common = [n for n in markers_g.names if n in markers_s.names]
    idx_s = [markers_s.names.index(n) for n in common]
    idx_g = [markers_g.names.index(n) for n in common]
    import dataclasses

    mk_s = dataclasses.replace(
        markers_s,
        names=tuple(common),
        body_indices=tuple(markers_s.body_indices[i] for i in idx_s),
        offsets=markers_s.offsets[jnp.asarray(idx_s)],
    )
    mk_g = dataclasses.replace(
        markers_g,
        names=tuple(common),
        body_indices=tuple(markers_g.body_indices[i] for i in idx_g),
        offsets=markers_g.offsets[jnp.asarray(idx_g)],
    )
    observed = jax.vmap(lambda q: marker_world_positions(scaled, mk_s, q))(qs)
    print(f"synthesized {T} frames x {len(common)} markers of mocap")

    # stage 1 (round-4 pipeline): closed-form IKInitializer — cluster
    # poses -> joint centers -> bone scales -> sequential IK, no
    # optimizer (IKInitializer::runFullPipeline)
    from nimblephysics_tpu.biomechanics import run_ik_initializer

    init = run_ik_initializer(generic, mk_g, np.asarray(observed))
    print(f"IKInitializer: {int(init.joint_valid.sum())} closed-form joint "
          f"centers, scales [{init.scales.min():.3f}, {init.scales.max():.3f}]")

    # stage 2: TRUE bilevel fit (outer scales/offsets, inner per-frame GN
    # IK, envelope-theorem gradients) warm-started from the initializer
    from nimblephysics_tpu.biomechanics import fit_markers_bilevel

    bres = fit_markers_bilevel(
        generic, mk_g, observed, q_inits=[jnp.asarray(init.poses)],
        outer_iters=80,
    )
    print(f"bilevel marker RMSE: {float(bres.marker_rmse)*1000:.1f} mm")

    # stage 3: the joint Adam fit (the fast single-program alternative)
    result = fit_markers(
        generic, mk_g, observed, q_init=qs, iters=600, lr=1e-2,
        regularize_offsets=5.0, regularize_scales=1e-2, smooth_poses=1e-3,
    )
    print(f"marker RMSE after fit: {float(result.marker_rmse)*1000:.1f} mm")

    report = IKErrorReport(
        scale_bodies(generic, result.scales),
        mk_g.scaled(result.scales).with_offsets(result.offsets),
        result.poses, observed,
    )
    print(f"IKErrorReport: rmse={report.root_mean_squared_error*1000:.1f} mm, "
          f"max={report.max_error*1000:.1f} mm")

    write_subject(
        "/tmp/welk002.ntpusubj",
        [dict(name="manual_ik", dt=0.01, q=np.asarray(result.poses),
              v=np.zeros_like(result.poses), tau=np.zeros_like(result.poses))],
        subject_meta=dict(source="welk002", synthesized=True),
    )
    print("wrote /tmp/welk002.ntpusubj")


if __name__ == "__main__":
    main()
