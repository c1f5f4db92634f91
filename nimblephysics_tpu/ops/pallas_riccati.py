"""Pallas TPU kernel: lane-parallel batched Riccati backward pass for iLQR.

The sequential backward pass (trajectory/ilqr.py `bstep`) is a T-step
`lax.scan` whose body is ~20 tiny (B, nx, nx) ops — on TPU each scan step
is an HBM round trip of a few KB, so the whole pass is latency-bound (the
measured bulk of an MPC replan; NOTES_ROUND2.md profiling). This kernel
runs the identical recursion with the BATCH on the VPU lane axis:

  * every matrix entry (e.g. Vxx[i,j]) is one (block_b,)-wide vector of
    worlds; a 4x4 matmul is 64 fused multiply-adds of lane vectors,
  * the time loop is the (innermost) Pallas grid dimension — per-step
    inputs fx_t, fu_t, l*_t stream HBM -> VMEM double-buffered by the
    pipeline while the value-function carry (Vx, Vxx, dV, ok) lives in
    VMEM scratch across grid steps,
  * Quu_reg⁻¹ is the same pivot-free Gauss-Jordan as ops/linalg_small.py
    (min pivot doubles as the positive-definiteness certificate), unrolled
    on lane scalars.

Math mirrors the reference's per-step backward chain rule
(`BackpropSnapshot::backprop`, /root/reference/dart/neural/
BackpropSnapshot.cpp:121, composed over the horizon by
`SingleShot::backpropGradientWrt`) in its iLQR form with Tassa-style
state regularization — bit-compatible with ILQRConfig(riccati="sequential")
up to float reassociation (tested in tests/test_pallas.py).

Forward-only: the MPC serving path never differentiates through the
planner. AD through this kernel raises; use the XLA paths for that.
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


def _mat_rows(block: jax.Array, rows: int, cols: int) -> Mat:
    """(E_pad, Bt) block -> rows x cols nested list of (Bt,) lane vectors."""
    return [[block[r * cols + c] for c in range(cols)] for r in range(rows)]


def _vec_rows(block: jax.Array, n: int) -> List[Vec]:
    return [block[i] for i in range(n)]


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
    # M = [A | I] as lane scalars
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
    """Stack lane vectors into an (e_pad, Bt) array, zero-padding rows."""
    rows = list(rows)
    if len(rows) < e_pad:
        rows = rows + [jnp.zeros_like(rows[0])] * (e_pad - len(rows))
    return jnp.stack(rows)


def _pad8(e: int) -> int:
    return -(-e // 8) * 8


def _riccati_kernel(
    nx: int, na: int, T: int,
    fx_ref, fu_ref, lx_ref, lu_ref, lxx_ref, luu_ref, lux_ref,
    VxT_ref, VxxT_ref, reg_ref,
    K_ref, k_ref, dV_ref, ok_ref,
    Vx_s, Vxx_s, dV_s, ok_s,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        Vx_s[...] = VxT_ref[...]
        Vxx_s[...] = VxxT_ref[...]
        dV_s[...] = jnp.zeros_like(dV_s)
        ok_s[...] = jnp.ones_like(ok_s)

    reg = reg_ref[0]
    fx = _mat_rows(fx_ref[0], nx, nx)
    fu = _mat_rows(fu_ref[0], nx, na)
    lx = _vec_rows(lx_ref[0], nx)
    lu = _vec_rows(lu_ref[0], na)
    lxx = _mat_rows(lxx_ref[0], nx, nx)
    luu = _mat_rows(luu_ref[0], na, na)
    lux = _mat_rows(lux_ref[0], na, nx)
    Vx = _vec_rows(Vx_s[...], nx)
    Vxx = _mat_rows(Vxx_s[...], nx, nx)

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
        [Quu[a][b] + reg * fuTfu[a][b] for b in range(na)] for a in range(na)
    ]
    Qux_reg = [
        [Qux[a][i] + reg * fuTfx[a][i] for i in range(nx)] for a in range(na)
    ]
    Quu_inv, min_piv = _inv_spd_lanes(Quu_reg)
    ok_t = (jnp.isfinite(min_piv) & (min_piv > 0.0)).astype(min_piv.dtype)
    k_t = [-u for u in _mv(Quu_inv, Qu)]
    K_t = [[-x for x in row] for row in _mm(Quu_inv, Qux_reg)]

    Quu_k = _mv(Quu, k_t)
    Vx2 = [
        Qx[i]
        + sum(K_t[a][i] * (Quu_k[a] + Qu[a]) + Qux[a][i] * k_t[a]
              for a in range(na))
        for i in range(nx)
    ]
    KtQuu = _mTm(K_t, Quu)               # (nx, na)
    V1 = _mm(KtQuu, K_t)                 # Kᵀ Quu K
    V2 = _mTm(K_t, Qux)                  # Kᵀ Qux
    Vxx2 = [
        [
            Qxx[i][j] + V1[i][j] + V2[i][j] + V2[j][i]
            for j in range(nx)
        ]
        for i in range(nx)
    ]
    Vxx2 = [
        [0.5 * (Vxx2[i][j] + Vxx2[j][i]) for j in range(nx)] for i in range(nx)
    ]

    dv0 = dV_s[0] + sum(k_t[a] * Qu[a] for a in range(na))
    dv1 = dV_s[1] + 0.5 * sum(k_t[a] * Quu_k[a] for a in range(na))

    K_ref[0] = _stack([K_t[a][i] for a in range(na) for i in range(nx)],
                      _pad8(na * nx))
    k_ref[0] = _stack(k_t, _pad8(na))
    Vx_s[...] = _stack(Vx2, _pad8(nx))
    Vxx_s[...] = _stack([Vxx2[i][jj] for i in range(nx) for jj in range(nx)],
                        _pad8(nx * nx))
    dV_s[...] = _stack([dv0, dv1], 8)
    ok_s[...] = ok_s[...] * ok_t[None]
    dV_ref[...] = dV_s[...]
    ok_ref[...] = ok_s[...]


def _pack(x: jax.Array, e_pad: int) -> jax.Array:
    """(B, T, ...) -> (T, e_pad, B) batch-last with zero-padded entry axis."""
    B, T = x.shape[0], x.shape[1]
    flat = x.reshape(B, T, -1).transpose(1, 2, 0)
    e = flat.shape[1]
    return jnp.pad(flat, ((0, 0), (0, e_pad - e), (0, 0)))


def _pack0(x: jax.Array, e_pad: int) -> jax.Array:
    """(B, ...) -> (e_pad, B)."""
    flat = x.reshape(x.shape[0], -1).T
    return jnp.pad(flat, ((0, e_pad - flat.shape[0]), (0, 0)))


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
    interpret: bool = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Batched Riccati backward pass; returns (K, k, dV, ok) with
    K (B, T, na, nx), k (B, T, na), dV (B, 2), ok (B,) bool — identical
    semantics to the sequential scan in trajectory/ilqr.py."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, nx, na = fu.shape[0], fu.shape[1], fu.shape[2], fu.shape[3]
    dtype = fx.dtype
    B_pad = -(-B // block_b) * block_b
    pb = B_pad - B

    def padB(x):
        return jnp.pad(x, ((0, pb),) + ((0, 0),) * (x.ndim - 1))

    e_xx, e_xa, e_x, e_a, e_aa, e_ax = (
        _pad8(nx * nx), _pad8(nx * na), _pad8(nx), _pad8(na),
        _pad8(na * na), _pad8(na * nx),
    )
    fx_p = _pack(padB(fx), e_xx)
    fu_p = _pack(padB(fu), e_xa)
    lx_p = _pack(padB(lx), e_x)
    lu_p = _pack(padB(lu), e_a)
    lxx_p = _pack(padB(lxx), e_xx)
    # padding worlds must stay PD: identity luu, zero everything else
    luu_pad = padB(luu)
    if pb:
        eye = jnp.broadcast_to(jnp.eye(na, dtype=dtype), (pb, T, na, na))
        luu_pad = luu_pad.at[B:].set(eye)
    luu_p = _pack(luu_pad, e_aa)
    lux_p = _pack(padB(lux), e_ax)
    VxT_p = _pack0(padB(Vx_T), e_x)
    VxxT_p = _pack0(padB(Vxx_T), e_xx)
    reg_pad = padB(reg)
    if pb:
        reg_pad = reg_pad.at[B:].set(1.0)
    reg_p = reg_pad[None, :]                     # (1, B_pad)

    Bb = B_pad // block_b
    grid = (Bb, T)

    def t_spec(e):
        return pl.BlockSpec((1, e, block_b), lambda bb, j: (T - 1 - j, 0, bb),
                            memory_space=pltpu.VMEM)

    def c_spec(e):
        return pl.BlockSpec((e, block_b), lambda bb, j: (0, bb),
                            memory_space=pltpu.VMEM)

    kernel = partial(_riccati_kernel, nx, na, T)
    K_p, k_p, dV_p, ok_p = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            t_spec(e_xx), t_spec(e_xa), t_spec(e_x), t_spec(e_a),
            t_spec(e_xx), t_spec(e_aa), t_spec(e_ax),
            c_spec(e_x), c_spec(e_xx),
            pl.BlockSpec((1, block_b), lambda bb, j: (0, bb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            t_spec(e_ax), t_spec(e_a), c_spec(8), c_spec(8),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, e_ax, B_pad), dtype),
            jax.ShapeDtypeStruct((T, e_a, B_pad), dtype),
            jax.ShapeDtypeStruct((8, B_pad), dtype),
            jax.ShapeDtypeStruct((8, B_pad), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((_pad8(nx), block_b), dtype),
            pltpu.VMEM((_pad8(nx * nx), block_b), dtype),
            pltpu.VMEM((8, block_b), dtype),
            pltpu.VMEM((8, block_b), dtype),
        ],
        interpret=interpret,
    )(fx_p, fu_p, lx_p, lu_p, lxx_p, luu_p, lux_p, VxT_p, VxxT_p, reg_p)

    # unpack: (T, e, B) -> (B, T, ...)
    K = K_p[:, : na * nx, :B].transpose(2, 0, 1).reshape(B, T, na, nx)
    k = k_p[:, :na, :B].transpose(2, 0, 1)
    dV = dV_p[:2, :B].T
    ok = ok_p[0, :B] > 0.5
    return K, k, dV, ok
