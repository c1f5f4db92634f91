"""nimblephysics_tpu — a TPU-native differentiable rigid-body physics framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Nimble
(RobotControlLab/nimblephysics): differentiable articulated-body simulation with
analytical gradients through frictional contact (boxed LCP), trajectory
optimization (single/multiple shooting), real-time MPC, and system ID —
built TPU-first: pure functions, fixed shapes, `vmap` over worlds,
`lax.scan` over horizons, `shard_map` over device meshes.

Reference layer map: /root/reference SURVEY.md §1. This package is NOT a
port — skeletons are data (topology tables + parameter pytrees), a step is
a pure function `step(model, state, control) -> state`.
"""

__version__ = "0.1.0"

from nimblephysics_tpu.models.model import Model, State  # noqa: F401
