"""Native C++ components: seqlock control buffer under concurrent churn,
ticker precision, and the golden LCP vs the device PGS solver."""

import threading
import time

import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.native import (
    RtControlBuffer,
    lcp_gold,
    ticker_now,
    ticker_sleep_until,
)
from nimblephysics_tpu.ops import lcp as lcp_mod


def test_rt_buffer_basic():
    buf = RtControlBuffer(horizon=5, na=2)
    assert buf.control_at(0.0) == (None, None)
    u = np.arange(10, dtype=np.float64).reshape(5, 2)
    buf.publish(start_time=1.0, dt=0.1, u=u)
    idx, out = buf.control_at(1.05)
    assert idx == 0 and np.allclose(out, [0, 1])
    idx, out = buf.control_at(1.25)
    assert idx == 2 and np.allclose(out, [4, 5])
    idx, out = buf.control_at(99.0)
    assert idx == 4 and np.allclose(out, [8, 9])  # clamp to plan end
    idx, out = buf.control_at(0.0)
    assert idx == 0  # clamp to plan start


def test_rt_buffer_concurrent_publish_read():
    """Reader must always see a CONSISTENT plan row (never a torn mix of two
    plans) while the publisher swaps buffers at full speed."""
    H, NA = 20, 4
    buf = RtControlBuffer(horizon=H, na=NA)
    stop = threading.Event()
    torn = []

    def publisher():
        k = 0
        while not stop.is_set():
            k += 1
            u = np.full((H, NA), float(k))
            buf.publish(0.0, 0.01, u)

    def reader():
        while not stop.is_set():
            idx, out = buf.control_at(0.05)
            if out is not None:
                # all entries of a row must come from the same plan
                if not np.all(out == out[0]):
                    torn.append(out.copy())

    threads = [threading.Thread(target=publisher)] + [
        threading.Thread(target=reader) for _ in range(3)
    ]
    for t in threads:
        t.start()
    time.sleep(1.0)
    stop.set()
    for t in threads:
        t.join()
    assert buf.num_published > 100
    assert not torn, torn[:3]


def test_ticker_precision():
    t0 = ticker_now()
    ticker_sleep_until(t0 + 0.05)
    elapsed = ticker_now() - t0
    assert 0.0499 <= elapsed < 0.06, elapsed


def _random_contact_lcp(rng, n_contacts, mu=0.6):
    """Build a PSD contact-structured boxed LCP."""
    m = 3 * n_contacts
    G = rng.standard_normal((m, m + 3))
    A = G @ G.T / m + 1e-3 * np.eye(m)
    b = rng.standard_normal(m)
    lo = np.zeros(m)
    hi = np.full(m, 1e20)
    fscale = np.zeros(m)
    findex = np.full(m, -1, dtype=np.int32)
    for k in range(n_contacts):
        for d in (1, 2):
            lo[3 * k + d] = 0.0
            hi[3 * k + d] = 0.0
            fscale[3 * k + d] = mu
            findex[3 * k + d] = 3 * k
    return A, b, lo, hi, fscale, findex


def test_lcp_gold_complementarity():
    rng = np.random.default_rng(0)
    for trial in range(5):
        A, b, lo, hi, fscale, findex = _random_contact_lcp(rng, 3)
        x, resid = lcp_gold(A, b, lo, hi, fscale, findex)
        assert resid < 1e-7, (trial, resid)


def test_device_pgs_matches_native_gold():
    """The 60-sweep device PGS solution must agree with the deeply-converged
    native solver on contact-structured problems (the reference's
    Dantzig-vs-PGS cross-check role)."""
    rng = np.random.default_rng(1)
    for trial in range(5):
        A, b, lo, hi, fscale, findex = _random_contact_lcp(rng, 2)
        x_gold, resid = lcp_gold(A, b, lo, hi, fscale, findex)
        assert resid < 1e-7
        x_dev = np.asarray(
            lcp_mod.pgs_solve(
                jnp.asarray(A), jnp.asarray(b), jnp.asarray(lo),
                jnp.asarray(hi), jnp.asarray(fscale), jnp.zeros(len(b)),
                tuple(int(i) for i in findex), 400,
            )
        )
        np.testing.assert_allclose(x_dev, x_gold, atol=2e-4,
                                   err_msg=f"trial {trial}")
