"""Virtual-mesh scaling report: fixed per-device batch, 1 vs N devices.

Run on the 8-virtual-device CPU mesh (the same harness the driver's
dryrun_multichip uses):

    env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE \
        JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        PYTHONPATH=/root/repo python parallel_scaling_report.py

Writes MULTICHIP_SCALING.md. Virtual CPU devices share host cores, so the
meaningful number is WEAK-scaling overhead: per-replan wall time at fixed
per-device batch should stay ~flat as devices are added IF the program's
collectives are cheap (one psum per solve) — growth beyond core
contention indicates sharding overhead in the program itself.
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

_NCPU = os.cpu_count() or 1
if _NCPU < 8:
    # Round-2 lesson: timing 8 virtual devices on a 2-core host measures
    # core oversubscription (observed 3.54x at 8 devices ~ 4x
    # oversubscription), not sharding overhead. The equivalence tests in
    # tests/test_multichip.py carry the correctness signal; a timing table
    # here would add noise dressed as data.
    with open("MULTICHIP_SCALING.md", "w") as f:
        f.write(
            "# Virtual-mesh weak-scaling: NOT MEASURED on this host\n\n"
            f"Host has {_NCPU} cores; timing an 8-virtual-device CPU mesh "
            "here measures core oversubscription, not sharding overhead "
            "(round-2 measured 3.54x at 8 devices = ~4x oversubscription "
            "on 2 cores). Sharded==vmap equivalence is asserted in "
            "tests/test_multichip.py; real scaling needs >=8 physical "
            "cores or multi-chip hardware.\n"
        )
    print(f"skipped: {_NCPU} cores < 8 (wrote MULTICHIP_SCALING.md stub)")
    raise SystemExit(0)

jax.config.update("jax_enable_x64", True)

from nimblephysics_tpu.models import builders
from nimblephysics_tpu.parallel.sharding import make_mesh, sharded_mpc_solves


def time_devices(n_dev: int, per_device_b: int, H: int = 40, iters: int = 6,
                 reps: int = 5) -> float:
    model = builders.cartpole(dt=0.02)
    nq, na = model.nq, model.num_actions
    B = per_device_b * n_dev

    def running(x, u, t):
        return 1.0 * x[1] ** 2 + 0.1 * x[0] ** 2 + 1e-3 * jnp.sum(u**2)

    def final(x):
        return 20.0 * x[1] ** 2 + jnp.sum(x[2:] ** 2)

    mesh = make_mesh((("dp", n_dev),), jax.devices()[:n_dev])
    solve = sharded_mpc_solves(model, mesh, running, final, horizon=H, iters=iters)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(0, 0.15, (B, 2 * nq)))
    uw = jnp.zeros((B, H, na))
    out = solve(x0, uw)
    float(jnp.sum(out[0]))  # sync
    t0 = time.time()
    for _ in range(reps):
        out = solve(x0, uw)
        float(jnp.sum(out[0]))
    return (time.time() - t0) / reps


def main():
    per_dev = 16
    rows = []
    for n in (1, 2, 4, 8):
        dt = time_devices(n, per_dev)
        rows.append((n, per_dev * n, dt))
        print(f"devices={n} B={per_dev * n} t={dt * 1e3:.1f} ms")

    t1 = rows[0][2]
    lines = [
        "# Virtual-mesh weak-scaling (8-virtual-device CPU mesh)",
        "",
        "Cartpole MPC replans, H=40, 6 iLQR iterations, 16 worlds per",
        "device, `sharded_mpc_solves` over a dp mesh axis. Virtual devices",
        "share host cores, so ideal weak scaling here is CONSTANT time per",
        "step only up to core count; the sharding-overhead signal is the",
        "normalized column. (Real-ICI scaling needs multi-chip hardware —",
        "unavailable in this image; the same program scales the mesh by",
        "construction.)",
        "",
        "| devices | total B | time/replan-batch (ms) | vs 1-device |",
        "|---|---|---|---|",
    ]
    for n, B, dt in rows:
        lines.append(f"| {n} | {B} | {dt * 1e3:.1f} | {dt / t1:.2f}x |")
    lines.append("")
    with open("MULTICHIP_SCALING.md", "w") as f:
        f.write("\n".join(lines))
    print("wrote MULTICHIP_SCALING.md")


if __name__ == "__main__":
    main()
