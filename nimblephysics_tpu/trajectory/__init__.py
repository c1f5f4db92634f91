"""Trajectory optimization: shooting problems and solvers.

Functional counterpart of `dart/trajectory/` (Problem/SingleShot/MultiShot/
LossFn/Optimizers). The TPU design inverts the reference's architecture:
instead of an IPOPT event loop calling C++ callbacks, the WHOLE solve is a
jitted fixed-iteration program (lax.scan over optimizer steps), so thousands
of independent solves batch with vmap/shard_map."""

from nimblephysics_tpu.trajectory.shooting import (  # noqa: F401
    SingleShootingProblem,
    MultipleShootingProblem,
    solve_single_shooting,
    solve_multiple_shooting,
)
from nimblephysics_tpu.trajectory.ilqr import ilqr_solve, ILQRConfig  # noqa: F401
