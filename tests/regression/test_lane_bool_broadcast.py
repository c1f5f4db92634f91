"""Regression: Mosaic "Insertion of minor dim that is not a no-op only
supported for 32-bit types" on i1 vectors.

Round-4 bug: `lane_eval`'s `_bcast` broadcast unbatched traced BOOL
vectors (comparison results on hoisted-const boundary values) with
`val[..., None]` — an i1 minor-dim insertion Mosaic rejects, which
blocked the first compile of the split contact linearize kernels. Fixed
by routing bool broadcasts through i32. This repro evaluates the exact
graph shape (select_n on an unbatched traced bool condition) through
`lane_eval` and checks values; the TPU compile itself is covered by the
bench kernels.
"""

import numpy as np

import jax
import jax.numpy as jnp

from nimblephysics_tpu.ops.lanevmap import lane_eval


def test_unbatched_traced_bool_broadcast_values():
    def fn(thresh, x):
        cond = thresh > 0.5            # unbatched traced bool vector
        return jnp.where(cond, x, -x)

    closed = jax.make_jaxpr(fn)(jnp.zeros(8), jnp.zeros(8))
    bt = (2, 128)
    thresh = jnp.linspace(0.0, 1.0, 8)
    x = jnp.ones((8,) + bt) * jnp.arange(8.0)[:, None, None]
    (out,) = lane_eval(
        closed.jaxpr, closed.consts, [thresh, x], [False, True], bt
    )
    expect = np.where(np.linspace(0, 1, 8) > 0.5, np.arange(8.0),
                      -np.arange(8.0))
    np.testing.assert_allclose(np.asarray(out[:, 0, 0]), expect)


def test_bcast_bool_roundtrip():
    from nimblephysics_tpu.ops.lanevmap import _bcast

    def run(v):
        return _bcast(v, False, (2, 128))

    v = jnp.asarray([True, False, True])
    out = jax.jit(run)(v)
    assert out.dtype == jnp.bool_
    assert out.shape == (3, 2, 128)
    np.testing.assert_array_equal(np.asarray(out[:, 0, 0]), [True, False, True])
