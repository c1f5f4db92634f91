"""Per-kernel compile bisection at Atlas scale (round-5 verdict #1).

No Atlas-scale MPC program compiled on this image in round 4 — the remote
compile helper exits with an undiagnosed HTTP 500 on every variant tried
(BIGMODEL_STUDY.md wall 4/4b). This script isolates WHICH pieces of the
MPC pipeline die, by compiling each one in its OWN subprocess (a helper
crash kills the process) and logging rc + wall time + program-size
metrics. Run:

    env PYTHONPATH=/root/.axon_site:/root/repo python \
        scripts/atlas_compile_bisect.py            # drives all pieces
    ... python scripts/atlas_compile_bisect.py <piece>   # one piece

Pieces (all at B_ATLAS worlds, H_ATLAS steps; env-overridable):
  xla_step       jit(vmap(frozen_contact_step))           — XLA only
  xla_rollout    jit(scan_T(vmap(frozen_contact_step)))   — XLA only
  xla_classify   jit(classify_points at B*T points)       — XLA full LCP
  riccati        riccati_backward_pallas at nx=66
  rollout_pallas rollout_gains_pallas (fused step kernel)
  lin_vjp        linearize_pallas_vjp (split row-VJP kernels)
  chain_rollout  chained step kernels (ops/lane_chain.py) — scan over T
  chain_lin      chained row-VJP linearize (ops/lane_chain.py)
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

B = int(os.environ.get("B_ATLAS", "256"))
H = int(os.environ.get("H_ATLAS", "50"))
CG = int(os.environ.get("CG_ATLAS", "16"))
BUDGET = int(os.environ.get("CHAIN_BUDGET", "18000"))

PIECES = ["xla_step", "xla_rollout", "xla_classify", "riccati",
          "rollout_pallas", "lin_vjp", "chain_rollout", "chain_lin"]


def run_piece(piece: str) -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from nimblephysics_tpu.models.humanoid import atlas_planner
    from nimblephysics_tpu.models.model import State
    from nimblephysics_tpu.ops.contact import lcp_dim
    from nimblephysics_tpu.ops.frozen_contact import (
        FrozenClasses, classify_points, frozen_contact_step)

    planner, s0 = atlas_planner()
    m = lcp_dim(planner)
    nq, na = planner.nq, planner.num_actions
    nx = 2 * nq
    copts = {"xla_tpu_scoped_vmem_limit_kib": 98304}
    key = jax.random.PRNGKey(0)
    x0 = jnp.tile(s0.flat()[None].astype(jnp.float32), (B, 1))
    x0 = x0 + 0.01 * jax.random.normal(key, x0.shape, dtype=x0.dtype)
    u = 0.01 * jax.random.normal(key, (B, H, na), jnp.float32)
    cm = jnp.zeros((B, H, m), jnp.float32)
    us = jnp.zeros((B, H, m), jnp.float32)
    t0 = time.time()

    if piece == "xla_step":
        def step1(xf, uu, c1, u1):
            s2 = frozen_contact_step(
                planner, State.from_flat(xf), planner.action_to_tau(uu),
                FrozenClasses(c1, u1), cg_iters=CG)
            return s2.flat()

        f = jax.jit(jax.vmap(step1), compiler_options=copts)
        out = f(x0, u[:, 0], cm[:, 0], us[:, 0])
        out.block_until_ready()

    elif piece == "xla_rollout":
        def step1(xf, uu, c1, u1):
            s2 = frozen_contact_step(
                planner, State.from_flat(xf), planner.action_to_tau(uu),
                FrozenClasses(c1, u1), cg_iters=CG)
            return s2.flat()

        def roll(x0b, ub, cmb, usb):
            def body(x, inp):
                ut, c1, u1 = inp
                x2 = jax.vmap(step1)(x, ut, c1, u1)
                return x2, x2

            _, xs = jax.lax.scan(
                body, x0b,
                (ub.swapaxes(0, 1), cmb.swapaxes(0, 1), usb.swapaxes(0, 1)))
            return xs

        f = jax.jit(roll, compiler_options=copts)
        out = f(x0, u, cm, us)
        out.block_until_ready()

    elif piece == "xla_classify":
        xs = jnp.broadcast_to(x0[:, None, :], (B, H, nx))
        taus = jax.vmap(jax.vmap(planner.action_to_tau))(u)
        f = jax.jit(lambda a, b: classify_points(planner, a, b)[0],
                    compiler_options=copts)
        out = f(xs, taus)
        out.cmask.block_until_ready()

    elif piece == "riccati":
        from nimblephysics_tpu.ops.pallas_riccati import (
            riccati_backward_pallas)

        fx = jnp.zeros((B, H, nx, nx)) + jnp.eye(nx)
        fu = jnp.zeros((B, H, nx, na)) + 0.01
        lx = jnp.zeros((B, H, nx)); lu = jnp.zeros((B, H, na))
        lxx = jnp.zeros((B, H, nx, nx)) + jnp.eye(nx)
        luu = jnp.zeros((B, H, na, na)) + jnp.eye(na)
        lux = jnp.zeros((B, H, na, nx))
        VxT = jnp.zeros((B, nx)); VxxT = jnp.zeros((B, nx, nx)) + jnp.eye(nx)
        reg = jnp.full((B,), 1e-3)
        f = jax.jit(lambda *a: riccati_backward_pallas(*a),
                    compiler_options=copts)
        K, k, _, ok = f(fx, fu, lx, lu, lxx, luu, lux, VxT, VxxT, reg)
        K.block_until_ready()

    elif piece == "rollout_pallas":
        from nimblephysics_tpu.ops.pallas_rollout import rollout_gains_pallas

        def rc(x, uu, t):
            return 1e-5 * jnp.sum(uu ** 2) + (x[nq - 2] - 0.9) ** 2

        def fc(x):
            return 10.0 * jnp.sum(x[nq:] ** 2)

        K0 = jnp.zeros((B, H, na, nx)); k0 = jnp.zeros((B, H, na))
        xsr = jnp.zeros((B, H + 1, nx))
        f = jax.jit(
            lambda *a: rollout_gains_pallas(
                planner, rc, fc, *a, jnp.ones((1,), jnp.float32),
                block_b=128, classes=(cm, us), cg_iters=CG)[2],
            compiler_options=copts)
        out = f(x0, xsr, u, K0, k0)
        out.block_until_ready()

    elif piece == "lin_vjp":
        from nimblephysics_tpu.ops.pallas_linearize import linearize_pallas_vjp

        xs = jnp.broadcast_to(x0[:, None, :], (B, H, nx))
        f = jax.jit(
            lambda a, b: linearize_pallas_vjp(
                planner, a, b, (cm, us), block_b=128, cg_iters=CG)[0],
            compiler_options=copts)
        out = f(xs, u)
        out.block_until_ready()

    elif piece == "chain_rollout":
        from nimblephysics_tpu.ops.lane_chain import chained_step_rollout

        def rc(x, uu, t):
            return 1e-5 * jnp.sum(uu ** 2) + (x[nq - 2] - 0.9) ** 2

        f = jax.jit(
            lambda a, b, c, d: chained_step_rollout(
                planner, rc, a, b, (c, d), cg_iters=CG,
                budget=BUDGET)[1],
            compiler_options=copts)
        out = f(x0, u, cm, us)
        out.block_until_ready()

    elif piece == "chain_lin":
        from nimblephysics_tpu.ops.lane_chain import chained_linearize_vjp

        xs = jnp.broadcast_to(x0[:, None, :], (B, H, nx))
        f = jax.jit(
            lambda a, b: chained_linearize_vjp(
                planner, a, b, (cm, us), cg_iters=CG,
                budget=BUDGET)[0],
            compiler_options=copts)
        out = f(xs, u)
        out.block_until_ready()

    elif piece.startswith("step_compose"):
        # compile a COMPOSITION of step chunks [a, b] in one jit (one
        # pallas_call per chunk, chained through the packed boundaries) —
        # isolates whether the helper dies on multi-payload programs
        import numpy as _np

        from nimblephysics_tpu.ops.lane_chain import (
            _run_chain_lanes, _step_chain_for)

        parts = piece.split("_")
        a, b = int(parts[-2]), int(parts[-1])
        nx = 2 * nq
        sfc, chain = _step_chain_for(planner, m, nx, na, jnp.float32, CG,
                                     BUDGET, False)

        # truncate the chain to chunks [a, b]
        class _Sub:
            chunks = chain.chunks[a:b + 1]
            bounds = chain.bounds[a:b + 1]
            bound_metas = chain.bound_metas[a:b + 1]
            bound_rows = chain.bound_rows[a:b + 1]
            n_chunks = b - a + 1
            eval_chunk = (lambda self, i, *args, **kw:
                          chain.eval_chunk(a + i, *args, **kw))
        sub = _Sub()

        def nel(v):
            return int(_np.prod(v.aval.shape))

        in_vars = (sfc.primal_view.invars if a == 0 else chain.bounds[a - 1])
        outs = (sfc.bound_vars if b == chain.n_chunks - 1
                else chain.bounds[b])
        out_meta = [(tuple(v.aval.shape), v.aval.dtype, nel(v))
                    for v in outs]

        class _SfView:
            n_consts = sfc.n_consts
            consts2d = sfc.consts2d
            _cvals = staticmethod(sfc._cvals)
            primal_view = type("V", (), {"invars": list(in_vars)})
            bound_meta = out_meta
            n_boundary_f32 = sum(mm[2] for mm in out_meta)

        # sub's LAST chunk must emit out_meta; patch bounds alignment:
        sub.bounds = chain.bounds[a:b] + []
        sub.bound_metas = chain.bound_metas[a:b] + []
        sub.bound_rows = chain.bound_rows[a:b] + []

        S_b, G = 1, 2
        rows = [nel(v) for v in in_vars]
        args = [jnp.zeros((r, G, S_b, 128), jnp.float32) for r in rows]
        f = jax.jit(
            lambda *ar: _run_chain_lanes(_SfView, sub, list(ar), rows, G,
                                         S_b, False),
            compiler_options=copts)
        out = f(*args)
        out.block_until_ready()

    elif piece.startswith("step_chunk"):
        # compile ONE chunk of the chained step kernel in isolation
        from functools import partial

        import numpy as _np
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from nimblephysics_tpu.ops.lane_chain import (
            _step_chain_for, pack_rows, unpack_rows)
        from nimblephysics_tpu.ops.pallas_linearize import _const_spec

        ci = int(piece.split("_")[-1])
        nx = 2 * nq
        sfc, chain = _step_chain_for(planner, m, nx, na, jnp.float32, CG,
                                     BUDGET, False)
        in_vars = (sfc.primal_view.invars if ci == 0
                   else chain.bounds[ci - 1])
        outs = (sfc.bound_vars if ci == chain.n_chunks - 1
                else chain.bounds[ci])

        def nel(v):
            return int(_np.prod(v.aval.shape))

        in_meta = [(tuple(v.aval.shape), v.aval.dtype, nel(v))
                   for v in in_vars]
        out_meta = [(tuple(v.aval.shape), v.aval.dtype, nel(v))
                    for v in outs]
        rows_in = sum(mm[2] for mm in in_meta)
        rows_out = sum(mm[2] for mm in out_meta)
        S_b, G = 1, 2
        bt = (S_b, 128)

        def kernel(*refs):
            const_refs = refs[:sfc.n_consts]
            lit, pre = sfc._cvals([cr[...] for cr in const_refs])
            packed = jax.lax.squeeze(refs[sfc.n_consts][...], (1,))
            vals = unpack_rows(packed, in_meta, bt)
            env = dict(zip(in_vars, vals))
            envb = {v: True for v in in_vars}
            o = chain.eval_chunk(ci, env, envb, bt, lit, pre)
            refs[-1][...] = jax.lax.expand_dims(
                pack_rows(o, out_meta, bt), (1,))

        lane_spec = lambda rows: pl.BlockSpec(  # noqa: E731
            (rows, 1, S_b, 128), lambda i: (0, i, 0, 0),
            memory_space=pltpu.VMEM)
        f = jax.jit(
            lambda a: pl.pallas_call(
                kernel, grid=(G,),
                in_specs=[_const_spec(c) for c in sfc.consts2d]
                + [lane_spec(rows_in)],
                out_specs=lane_spec(rows_out),
                out_shape=jax.ShapeDtypeStruct(
                    (rows_out, G, S_b, 128), jnp.float32),
                interpret=False,
            )(*sfc.consts2d, a),
            compiler_options=copts)
        out = f(jnp.zeros((rows_in, G, S_b, 128), jnp.float32))
        out.block_until_ready()
        print(f"  chunk {ci}: est {chain.chunk_costs[ci]} "
              f"rows_in {rows_in} rows_out {rows_out}", flush=True)

    else:
        raise SystemExit(f"unknown piece {piece}")

    print(f"PIECE {piece}: OK compile+run {time.time() - t0:.0f}s",
          flush=True)


def drive() -> None:
    log_path = os.environ.get("ATLAS_BISECT_LOG",
                              "/root/repo/.scratch5/atlas_bisect.json")
    results = {}
    if os.path.exists(log_path):
        with open(log_path) as f:
            results = json.load(f)
    only = os.environ.get("ATLAS_PIECES", "")
    pieces = only.split(",") if only else PIECES
    for piece in pieces:
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), piece],
            capture_output=True, text=True, timeout=3600 * 2,
            env=os.environ,
        )
        results[piece] = {
            "rc": p.returncode,
            "secs": round(time.time() - t0, 1),
            "tail": (p.stdout + p.stderr)[-500:],
            "B": B, "H": H,
        }
        print(f"{piece}: rc={p.returncode} {results[piece]['secs']}s",
              flush=True)
        with open(log_path, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_piece(sys.argv[1])
    else:
        drive()
