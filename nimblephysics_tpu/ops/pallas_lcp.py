"""Pallas TPU kernel: batched boxed-LCP projected Gauss-Seidel.

The XLA formulation of PGS (ops/lcp.py) emits a sequential chain of tiny
ops per row update — each a full HBM round trip when the batch is large.
This kernel keeps a tile of worlds resident in VMEM and runs all sweeps
in-register: one kernel launch instead of iters*m chained XLA ops.

TPU layout: the BATCH dimension is the 128-wide lane dimension (arrays are
stored batch-last: A (m, m, B), b/x (m, B)); the LCP dimension m rides the
sublane axis and is padded to a multiple of 8 by the wrapper. Every row
update is a (B,)-wide vector op.

This is the forward solver; gradients flow through the implicit-rule
`boxed_lcp` (ops/lcp.py) which can call this kernel as its primal.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e20


def _pgs_kernel(iters: int, findex: Tuple[int, ...], m_real: int,
                A_ref, b_ref, lo_ref, hi_ref, fs_ref, x0_ref, out_ref):
    A = A_ref[:]          # (m, m, Bb)
    b = b_ref[:]          # (m, Bb)
    lo = lo_ref[:]
    hi = hi_ref[:]
    fs = fs_ref[:]
    x = x0_ref[:]

    def sweep(_, x):
        for i in range(m_real):
            Aii = A[i, i, :]
            inv_diag = jnp.where(jnp.abs(Aii) > 1e-12, 1.0 / Aii, 0.0)
            resid = jnp.sum(A[i] * x, axis=0) - b[i]       # (Bb,)
            xi = x[i] - resid * inv_diag
            if findex[i] >= 0:
                f_hi = fs[i] * jnp.maximum(x[findex[i]], 0.0)
                lo_i, hi_i = -f_hi, f_hi
            else:
                lo_i, hi_i = lo[i], hi[i]
            xi = jnp.clip(xi, lo_i, hi_i)
            row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) == i
            x = jnp.where(row, xi[None, :], x)
        return x

    out_ref[:] = jax.lax.fori_loop(0, iters, sweep, x)


def pallas_pgs_batched(
    A: jax.Array,        # (B, m, m)
    b: jax.Array,        # (B, m)
    lo: jax.Array,
    hi: jax.Array,
    fscale: jax.Array,
    x0: jax.Array,
    findex: Tuple[int, ...],
    iters: int = 60,
    block_b: int = 256,
    interpret: bool = None,
) -> jax.Array:
    """Batched PGS on TPU via one Pallas kernel. Pads B to a multiple of
    block_b and m to a multiple of 8 internally. `interpret` defaults to
    True off-TPU (tests on the CPU backend)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, m = b.shape
    dtype = b.dtype
    m_pad = -(-m // 8) * 8
    B_pad = -(-B // block_b) * block_b

    def pad_bm(x2):
        return jnp.pad(x2, ((0, B_pad - B), (0, m_pad - m)))

    A_p = jnp.pad(A, ((0, B_pad - B), (0, m_pad - m), (0, m_pad - m)))
    # batch-last layouts
    A_t = jnp.transpose(A_p, (1, 2, 0))              # (m, m, B)
    b_t = pad_bm(b).T
    lo_t = pad_bm(lo).T
    hi_t = pad_bm(hi).T
    fs_t = pad_bm(fscale).T
    x0_t = pad_bm(x0).T

    grid = (B_pad // block_b,)
    kernel = partial(_pgs_kernel, iters, tuple(findex), m)
    out_t = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, B_pad), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_pad, m_pad, block_b), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, block_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, block_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, block_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, block_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, block_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_pad, block_b), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(A_t, b_t, lo_t, hi_t, fs_t, x0_t)
    return out_t.T[:B, :m]
