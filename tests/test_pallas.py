"""Pallas batched-PGS kernel vs the XLA solver (interpret mode on CPU;
bit-exact on TPU hardware)."""

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.ops import lcp as lcp_mod
from nimblephysics_tpu.ops.pallas_lcp import pallas_pgs_batched


def test_pallas_pgs_matches_xla():
    rng = np.random.default_rng(0)
    B, nc = 16, 2
    m = 3 * nc
    G = rng.standard_normal((B, m, m + 3))
    A = np.einsum("bij,bkj->bik", G, G) / m + 1e-2 * np.eye(m)
    b = rng.standard_normal((B, m))
    lo = np.zeros((B, m))
    hi = np.full((B, m), 1e20)
    fs = np.zeros((B, m))
    findex = []
    for k in range(nc):
        findex.extend([-1, 3 * k, 3 * k])
        fs[:, 3 * k + 1] = 0.7
        fs[:, 3 * k + 2] = 0.7
        hi[:, 3 * k + 1] = 0.0
        hi[:, 3 * k + 2] = 0.0
    findex = tuple(findex)

    args = tuple(map(jnp.asarray, (A, b, lo, hi, fs, np.zeros((B, m)))))
    x_xla = jax.vmap(
        lambda A, b, lo, hi, fs, x0: lcp_mod.pgs_solve(
            A, b, lo, hi, fs, x0, findex, 60
        )
    )(*args)
    x_pal = pallas_pgs_batched(*args, findex, 60, block_b=16)
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x_xla), atol=1e-10)
