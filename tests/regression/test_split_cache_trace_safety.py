"""Regression: the split-kernel cache leaking tracers / serving stale
entries.

Round-4 bugs (both observed as order-dependent test failures):
  1. `_split_fn_for` cached by `id(model)`; a GC'd model's id can be
     reused by a new allocation, silently serving a different model's
     split. Fixed by holding a strong model reference and checking
     identity.
  2. Constructing the SplitJVPFn during an ambient trace (the iLQR scan)
     recorded the gov matrix + hoisted consts as tracers of that trace,
     which the cache then leaked into later traces
     (UnexpectedTracerError). Fixed with ensure_compile_time_eval.
"""

import numpy as np

import jax
import jax.numpy as jnp

from nimblephysics_tpu.models import builders
from nimblephysics_tpu.ops.contact import lcp_dim
from nimblephysics_tpu.ops.pallas_linearize import (
    _SPLIT_CACHE,
    _split_fn_for,
)


def test_split_built_inside_trace_is_reusable_outside():
    model = builders.jump_worm(dt=0.001)
    nx, na, m = 2 * model.nq, model.num_actions, lcp_dim(model)
    _SPLIT_CACHE.clear()

    # First construction INSIDE a scan trace (bug 2's trigger)
    def body(c, _):
        sf = _split_fn_for(model, m, nx, na, jnp.float32)
        return c + jnp.float32(sf.n_boundary_f32), None

    out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=1)
    # consts cached from the traced construction must be CONCRETE
    sf = _split_fn_for(model, m, nx, na, jnp.float32)
    for c in sf.consts2d:
        assert not isinstance(c, jax.core.Tracer), "cache leaked a tracer"
    # and usable in a FRESH trace without UnexpectedTracerError
    val = jax.jit(lambda: sf.consts2d[0].sum())()
    assert np.isfinite(float(val))


def test_split_cache_rejects_stale_identity():
    model_a = builders.jump_worm(dt=0.001)
    model_b = builders.jump_worm(dt=0.002)
    nx, na, m = 2 * model_a.nq, model_a.num_actions, lcp_dim(model_a)
    _SPLIT_CACHE.clear()
    sf_a = _split_fn_for(model_a, m, nx, na, jnp.float32)
    # poison the cache with model_b's key pointing at model_a's entry
    # (simulating id reuse); the identity check must rebuild, not serve it
    key_b = (id(model_b), m, nx, na, "float32", None)
    _SPLIT_CACHE[key_b] = (model_a, sf_a)
    sf_b = _split_fn_for(model_b, m, nx, na, jnp.float32)
    assert sf_b is not sf_a, "stale cache entry served for a different model"
