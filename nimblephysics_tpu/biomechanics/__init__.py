"""Biomechanics toolkit — maps `dart/biomechanics/` (52 kLoC).

TPU re-design: every fitting pipeline (marker fitting, dynamics fitting,
scaling) is a differentiable loss over the model's parameter pytree solved
with jitted optimizers, instead of bespoke IPOPT TNLP wrappers. Body
scaling is a pure model transform, markers are data, and all per-frame
work batches with vmap.
"""

from nimblephysics_tpu.biomechanics.scaling import scale_bodies  # noqa: F401
from nimblephysics_tpu.biomechanics.markers import (  # noqa: F401
    MarkerSet,
    IKErrorReport,
    marker_world_positions,
)
from nimblephysics_tpu.biomechanics.marker_fitter import (  # noqa: F401
    BilevelFitResult,
    MarkerFitResult,
    find_joint_centers,
    fit_markers,
    fit_markers_bilevel,
)
from nimblephysics_tpu.biomechanics.ik_initializer import (  # noqa: F401
    IKInitializerResult,
    run_ik_initializer,
)
from nimblephysics_tpu.biomechanics.anthropometrics import Anthropometrics  # noqa: F401
from nimblephysics_tpu.biomechanics.c3d import load_c3d, C3DFile  # noqa: F401
from nimblephysics_tpu.biomechanics.subject_on_disk import (  # noqa: F401
    SubjectOnDisk,
    write_subject,
)
from nimblephysics_tpu.biomechanics.marker_mocap import (  # noqa: F401
    MarkerMocap,
    MarkerMocapResult,
)
from nimblephysics_tpu.biomechanics.dynamics_fitter import (  # noqa: F401
    run_dynamics_pipeline,
    zero_linear_residuals,
    estimate_foot_ground_contacts,
    fit_inertia,
    root_residuals,
)
from nimblephysics_tpu.biomechanics.lilypad import (  # noqa: F401
    LilypadCell,
    LilypadSolver,
)
from nimblephysics_tpu.biomechanics.batch_gait_id import (  # noqa: F401
    batch_gait_inverse_dynamics,
    GaitInverseDynamicsResult,
)
from nimblephysics_tpu.biomechanics.b3d import (  # noqa: F401
    B3DSubject,
    load_b3d,
    write_b3d,
    MissingGRFReason,
)
