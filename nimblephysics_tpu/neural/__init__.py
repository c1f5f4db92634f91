"""Gradient-engine API surface — functional `dart/neural`.

The reference's 16.7 kLoC of hand-derived Jacobian machinery
(BackpropSnapshot, ConstrainedGroupGradientMatrices,
DifferentiableContactConstraint, WithRespectTo) collapses on TPU to: a
differentiable step (AD + the LCP active-set custom_vjp) plus these
convenience oracles exposing the same quantities by name."""

from nimblephysics_tpu.neural.jacobians import (  # noqa: F401
    StepJacobians,
    step_jacobians,
    backprop_state,
)
from nimblephysics_tpu.neural.mappings import (  # noqa: F401
    IKMapping,
    ik_solve,
)
