"""Device-mesh parallelism: scenario and shooting-segment sharding."""

from nimblephysics_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    sharded_mpc_solves,
    sharded_multishoot_step,
)
