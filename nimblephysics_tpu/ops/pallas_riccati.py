"""Pallas TPU kernel: lane-parallel batched Riccati backward pass for iLQR.

The sequential backward pass (trajectory/ilqr.py `bstep`) is a T-step
`lax.scan` whose body is ~20 tiny (B, nx, nx) ops — each scan step is an
HBM round trip of a few KB, so the whole pass is op-launch-latency bound
(the measured bulk of an MPC replan; NOTES_ROUND2.md profiling). This
kernel runs the identical recursion with the BATCH on the VPU lane axis:

  * every matrix entry (e.g. Vxx[i,j]) is one (block_b,)-wide lane vector
    of worlds; a 4x4 matmul is 64 fused multiply-adds of lane vectors,
  * ALL per-step inputs (fx, fu, lx, lu, lxx, luu, lux) are packed into
    one (T, E, B) array host-side so the pipeline issues ONE large DMA
    per time-chunk instead of ~10 tiny ones (measured 30x difference:
    per-step blocks were DMA-latency bound at ~29 ms, within noise of
    the XLA scan),
  * the grid walks time in chunks of `t_chunk` steps (innermost grid
    dim, reversed); within a chunk the value-function carry (Vx, Vxx,
    dV, ok) stays in registers, and it persists across chunks in VMEM
    scratch,
  * Quu_reg⁻¹ is the same pivot-free Gauss-Jordan as ops/linalg_small.py
    (min pivot doubles as the positive-definiteness certificate),
    unrolled on lane scalars,
  * T is padded up to a chunk multiple with IDENTITY steps
    (fx=I, luu=I, everything else 0) that provably leave the carry
    unchanged, processed first in reverse order.

Math mirrors the reference's per-step backward chain rule
(`BackpropSnapshot::backprop`, /root/reference/dart/neural/
BackpropSnapshot.cpp:121, composed over the horizon by
`SingleShot::backpropGradientWrt`) in its iLQR form with Tassa-style
state regularization — matches ILQRConfig(riccati="sequential") up to
float reassociation (tested in tests/test_pallas.py).

Forward-only: the MPC serving path never differentiates through the
planner. AD through this kernel is an error; use the XLA paths for that.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Vec = jax.Array          # (block_b,) lane vector
Mat = List[List[Vec]]    # rows x cols of lane vectors


def _mm(A: Mat, B: Mat) -> Mat:
    """A (r x s) @ B (s x c) on lane vectors."""
    r, s, c = len(A), len(B), len(B[0])
    return [
        [sum(A[i][k] * B[k][j] for k in range(s)) for j in range(c)]
        for i in range(r)
    ]


def _mTm(A: Mat, B: Mat) -> Mat:
    """Aᵀ @ B where A is (s x r): result (r x c)."""
    s, r, c = len(A), len(A[0]), len(B[0])
    return [
        [sum(A[k][i] * B[k][j] for k in range(s)) for j in range(c)]
        for i in range(r)
    ]


def _mTv(A: Mat, v: List[Vec]) -> List[Vec]:
    """Aᵀ v where A is (s x r): result (r,)."""
    s, r = len(A), len(A[0])
    return [sum(A[k][i] * v[k] for k in range(s)) for i in range(r)]


def _mv(A: Mat, v: List[Vec]) -> List[Vec]:
    return [sum(A[i][k] * v[k] for k in range(len(v))) for i in range(len(A))]


def _madd(A: Mat, B: Mat) -> Mat:
    return [[a + b for a, b in zip(ra, rb)] for ra, rb in zip(A, B)]


def _inv_spd_lanes(A: Mat) -> Tuple[Mat, Vec]:
    """Pivot-free Gauss-Jordan inverse of an SPD lane matrix.

    Same elimination as linalg_small.inv_spd_pivots, unrolled on lane
    scalars; returns (A⁻¹, min pivot)."""
    n = len(A)
    if n == 1:
        piv = A[0][0]
        return [[1.0 / piv]], piv
    one = jnp.ones_like(A[0][0])
    zero = jnp.zeros_like(A[0][0])
    M = [
        [A[i][j] for j in range(n)] + [one if i == j else zero for j in range(n)]
        for i in range(n)
    ]
    min_piv = None
    for k in range(n):
        piv = M[k][k]
        min_piv = piv if min_piv is None else jnp.minimum(min_piv, piv)
        inv_p = 1.0 / piv
        row = [m * inv_p for m in M[k]]
        for i in range(n):
            if i == k:
                continue
            f = M[i][k]
            M[i] = [M[i][j] - f * row[j] for j in range(2 * n)]
        M[k] = row
    return [[M[i][n + j] for j in range(n)] for i in range(n)], min_piv


def _stack(rows: Sequence[Vec], e_pad: int) -> jax.Array:
    rows = list(rows)
    if len(rows) < e_pad:
        rows = rows + [jnp.zeros_like(rows[0])] * (e_pad - len(rows))
    return jnp.stack(rows)


def _pad8(e: int) -> int:
    return -(-e // 8) * 8


def _offsets(nx: int, na: int):
    """Row offsets of each per-step quantity in the packed (T, E, B) input."""
    ofx = 0
    ofu = ofx + nx * nx
    olx = ofu + nx * na
    olu = olx + nx
    olxx = olu + na
    oluu = olxx + nx * nx
    olux = oluu + na * na
    E = olux + na * nx
    return ofx, ofu, olx, olu, olxx, oluu, olux, E


def _riccati_kernel(
    nx: int, na: int, t_chunk: int, n_chunks: int,
    steps_ref,      # (t_chunk, E_pad, Bt) — packed fx|fu|lx|lu|lxx|luu|lux
    const_ref,      # (Ec_pad, Bt)        — VxT | VxxT | reg
    out_ref,        # (t_chunk, Eo_pad, Bt) — K | k
    dvok_ref,       # (8, Bt)             — rows 0,1 = dV; row 2 = ok
    carry_s,        # VMEM scratch (pad8(nx + nx*nx + 3), Bt)
):
    c = pl.program_id(1)
    ofx, ofu, olx, olu, olxx, oluu, olux, _ = _offsets(nx, na)
    nxx = nx * nx

    @pl.when(c == 0)
    def _():
        const = const_ref[...]
        rows = [const[i] for i in range(nx + nxx)]
        zero = jnp.zeros_like(rows[0])
        one = jnp.ones_like(rows[0])
        carry_s[...] = _stack(rows + [zero, zero, one], carry_s.shape[0])

    carry = carry_s[...]
    Vx = [carry[i] for i in range(nx)]
    Vxx = [[carry[nx + i * nx + j] for j in range(nx)] for i in range(nx)]
    dv0, dv1, ok = carry[nx + nxx], carry[nx + nxx + 1], carry[nx + nxx + 2]
    reg = const_ref[nx + nxx]

    for r in reversed(range(t_chunk)):
        st = steps_ref[r]
        fx = [[st[ofx + i * nx + j] for j in range(nx)] for i in range(nx)]
        fu = [[st[ofu + i * na + j] for j in range(na)] for i in range(nx)]
        lx = [st[olx + i] for i in range(nx)]
        lu = [st[olu + a] for a in range(na)]
        lxx = [[st[olxx + i * nx + j] for j in range(nx)] for i in range(nx)]
        luu = [[st[oluu + a * na + b] for b in range(na)] for a in range(na)]
        lux = [[st[olux + a * nx + i] for i in range(nx)] for a in range(na)]

        Qx = [a + b for a, b in zip(lx, _mTv(fx, Vx))]
        Qu = [a + b for a, b in zip(lu, _mTv(fu, Vx))]
        W = _mm(Vxx, fx)                     # (nx, nx)
        Wu = _mm(Vxx, fu)                    # (nx, na)
        Qxx = _madd(lxx, _mTm(fx, W))
        Quu = _madd(luu, _mTm(fu, Wu))
        Qux = _madd(lux, _mTm(fu, W))
        # Tassa state regularization: Vxx_reg = Vxx + reg·I inside the fu
        # products -> Quu_reg = Quu + reg·fuᵀfu, Qux_reg = Qux + reg·fuᵀfx.
        fuTfu = _mTm(fu, fu)
        fuTfx = _mTm(fu, fx)
        Quu_reg = [
            [Quu[a][b] + reg * fuTfu[a][b] for b in range(na)]
            for a in range(na)
        ]
        Qux_reg = [
            [Qux[a][i] + reg * fuTfx[a][i] for i in range(nx)]
            for a in range(na)
        ]
        Quu_inv, min_piv = _inv_spd_lanes(Quu_reg)
        ok = ok * (jnp.isfinite(min_piv) & (min_piv > 0.0)).astype(ok.dtype)
        k_t = [-u for u in _mv(Quu_inv, Qu)]
        K_t = [[-x for x in row] for row in _mm(Quu_inv, Qux_reg)]

        Quu_k = _mv(Quu, k_t)
        Vx = [
            Qx[i]
            + sum(K_t[a][i] * (Quu_k[a] + Qu[a]) + Qux[a][i] * k_t[a]
                  for a in range(na))
            for i in range(nx)
        ]
        KtQuu = _mTm(K_t, Quu)               # (nx, na)
        V1 = _mm(KtQuu, K_t)                 # Kᵀ Quu K
        V2 = _mTm(K_t, Qux)                  # Kᵀ Qux
        Vn = [
            [Qxx[i][j] + V1[i][j] + V2[i][j] + V2[j][i] for j in range(nx)]
            for i in range(nx)
        ]
        Vxx = [
            [0.5 * (Vn[i][j] + Vn[j][i]) for j in range(nx)]
            for i in range(nx)
        ]
        dv0 = dv0 + sum(k_t[a] * Qu[a] for a in range(na))
        dv1 = dv1 + 0.5 * sum(k_t[a] * Quu_k[a] for a in range(na))

        out_ref[r] = _stack(
            [K_t[a][i] for a in range(na) for i in range(nx)] + k_t,
            out_ref.shape[1],
        )

    carry_s[...] = _stack(
        [Vx[i] for i in range(nx)]
        + [Vxx[i][j] for i in range(nx) for j in range(nx)]
        + [dv0, dv1, ok],
        carry_s.shape[0],
    )

    @pl.when(c == n_chunks - 1)
    def _():
        zero = jnp.zeros_like(dv0)
        dvok_ref[...] = _stack([dv0, dv1, ok], 8)


def riccati_backward_pallas(
    fx: jax.Array,   # (B, T, nx, nx)
    fu: jax.Array,   # (B, T, nx, na)
    lx: jax.Array,   # (B, T, nx)
    lu: jax.Array,   # (B, T, na)
    lxx: jax.Array,  # (B, T, nx, nx)
    luu: jax.Array,  # (B, T, na, na)
    lux: jax.Array,  # (B, T, na, nx)
    Vx_T: jax.Array,   # (B, nx)
    Vxx_T: jax.Array,  # (B, nx, nx)
    reg: jax.Array,    # (B,)
    block_b: int = 1024,
    t_chunk: int = None,
    interpret: bool = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Batched Riccati backward pass; returns (K, k, dV, ok) with
    K (B, T, na, nx), k (B, T, na), dV (B, 2), ok (B,) bool — identical
    semantics to the sequential scan in trajectory/ilqr.py."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, nx, na = fu.shape[0], fu.shape[1], fu.shape[2], fu.shape[3]
    dtype = fx.dtype
    # live lane values scale ~O(nx^2): shrink the lane block for larger
    # state dims, and raise the scoped-VMEM limit rather than dropping
    # below 256 lanes (2 vregs) — v5e has headroom above the 16MB default
    est_live = 10 * (nx * nx + na * na + na * nx + nx)
    while block_b > 256 and est_live * 4 * block_b > (8 << 20):
        block_b //= 2
    # humanoid-scale state dims (nx = 66 measured, round-5 Atlas bisect)
    # overflow scoped VMEM even at 256 lanes: allow one full lane row
    # before giving up
    while block_b > 128 and est_live * 4 * block_b > (40 << 20):
        block_b //= 2
    vmem_limit = min(100 << 20, max(16 << 20, 8 * est_live * 4 * block_b))
    B_pad = -(-B // block_b) * block_b
    pb = B_pad - B

    _, _, _, _, _, _, _, E = _offsets(nx, na)
    E_pad = _pad8(E)
    if t_chunk is None:
        if interpret:
            # interpret mode re-traces the unrolled chunk body per grid
            # step — keep it tiny (tests run this path on CPU).
            t_chunk = 1
        else:
            # chunk for ~2 MB per (steps) block per buffer (double-buffered)
            step_bytes = E_pad * block_b * dtype.itemsize
            t_chunk = max(1, min(T, (2 << 20) // max(step_bytes, 1)))
    n_chunks = -(-T // t_chunk)
    T_pad = n_chunks * t_chunk
    pt = T_pad - T

    def padB(x):
        return jnp.pad(x, ((0, pb),) + ((0, 0),) * (x.ndim - 1))

    # Pack per-step inputs: (B, T, ...) -> (T, E, B) rows in _offsets order.
    packed = jnp.concatenate(
        [
            padB(a).reshape(B_pad, T, -1)
            for a in (fx, fu, lx, lu, lxx, luu, lux)
        ],
        axis=-1,
    ).transpose(1, 2, 0)                                   # (T, E, B_pad)
    if pt:
        # identity steps (fx=I, luu=I, rest 0): leave the carry unchanged.
        row = jnp.zeros((E,), dtype)
        eye_x = jnp.eye(nx, dtype=dtype).reshape(-1)
        eye_u = jnp.eye(na, dtype=dtype).reshape(-1)
        ofx, _, _, _, _, oluu, _, _ = _offsets(nx, na)
        row = row.at[ofx:ofx + nx * nx].set(eye_x)
        row = row.at[oluu:oluu + na * na].set(eye_u)
        pad_steps = jnp.broadcast_to(row[None, :, None], (pt, E, B_pad))
        packed = jnp.concatenate([packed, pad_steps], axis=0)
    packed = jnp.pad(packed, ((0, 0), (0, E_pad - E), (0, 0)))

    # Constants: VxT | VxxT | reg rows.
    nxx = nx * nx
    Ec_pad = _pad8(nx + nxx + 1)
    reg_pad = padB(reg)
    if pb:
        reg_pad = reg_pad.at[B:].set(1.0)
    const = jnp.concatenate(
        [padB(Vx_T), padB(Vxx_T).reshape(B_pad, nxx), reg_pad[:, None]],
        axis=-1,
    ).T                                                     # (nx+nxx+1, B_pad)
    const = jnp.pad(const, ((0, Ec_pad - const.shape[0]), (0, 0)))

    Eo_pad = _pad8(na * nx + na)
    Bb = B_pad // block_b
    grid = (Bb, n_chunks)

    kernel = partial(_riccati_kernel, nx, na, t_chunk, n_chunks)
    out_p, dvok_p = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (t_chunk, E_pad, block_b),
                lambda bb, c: (n_chunks - 1 - c, 0, bb),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((Ec_pad, block_b), lambda bb, c: (0, bb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (t_chunk, Eo_pad, block_b),
                lambda bb, c: (n_chunks - 1 - c, 0, bb),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((8, block_b), lambda bb, c: (0, bb),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, Eo_pad, B_pad), dtype),
            jax.ShapeDtypeStruct((8, B_pad), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((_pad8(nx + nxx + 3), block_b), dtype),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit
        ),
        interpret=interpret,
    )(packed, const)

    # unpack: (T_pad, Eo, B) -> (B, T, ...)
    Kk = out_p[:T, :, :B].transpose(2, 0, 1)               # (B, T, Eo_pad)
    K = Kk[:, :, : na * nx].reshape(B, T, na, nx)
    k = Kk[:, :, na * nx: na * nx + na]
    dV = dvok_p[:2, :B].T
    ok = dvok_p[2, :B] > 0.5
    return K, k, dV, ok
