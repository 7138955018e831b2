"""Accurate fp32 transcendentals (ops/fastmath.py).

On TPU these replace exp/expm1 lowerings measured at ~11/~900 ulp (the
former aa_repeats d1 gate outlier's root cause); on CPU the libm path
is used, so the polynomial implementation is exercised here by forcing
_use_poly — its accuracy contract (~1-2 ulp) must hold anywhere IEEE
fp32 arithmetic does."""
import numpy as np
import pytest

import jax.numpy as jnp

from libpll2_tpu.ops import fastmath


@pytest.fixture()
def force_poly(monkeypatch):
    monkeypatch.setattr(fastmath, "_use_poly", lambda z: True)


def _ulp_err(got, ref):
    rel = np.abs(got.astype(np.float64) - ref) / np.maximum(
        np.abs(ref), np.finfo(np.float64).tiny)
    return rel / 1.1920929e-7


def test_exp32_accuracy(force_poly):
    rng = np.random.default_rng(0)
    z = rng.uniform(-80, 11, 50000).astype(np.float32)
    got = np.asarray(fastmath.exp32(jnp.asarray(z)))
    assert _ulp_err(got, np.exp(z.astype(np.float64))).max() < 2.0


def test_expm1_32_accuracy(force_poly):
    rng = np.random.default_rng(1)
    z = np.concatenate([rng.uniform(-0.4, 0.4, 25000),
                        rng.uniform(-30, 5, 25000)]).astype(np.float32)
    got = np.asarray(fastmath.expm1_32(jnp.asarray(z)))
    assert _ulp_err(got, np.expm1(z.astype(np.float64))).max() < 4.0


def test_extremes_and_nan(force_poly):
    z = jnp.asarray(np.array([-200.0, 0.0, 100.0, np.nan], np.float32))
    e = np.asarray(fastmath.exp32(z))
    assert e[0] == 0.0 and e[1] == 1.0 and np.isinf(e[2])
    assert np.isnan(e[3])              # NaN must propagate
    m = np.asarray(fastmath.expm1_32(z))
    assert m[0] == -1.0 and m[1] == 0.0 and np.isinf(m[2])
    assert np.isnan(m[3])


def test_passthrough_off_tpu():
    """Without the force, CPU keeps libm (cross-program bit-equality
    contract of the fp32 engine paths, see _use_poly docstring)."""
    import jax
    if jax.default_backend() == "tpu":
        pytest.skip("poly path active on TPU by design")
    z = jnp.asarray(np.float32([0.5, -2.0]))
    np.testing.assert_array_equal(np.asarray(fastmath.exp32(z)),
                                  np.asarray(jnp.exp(z)))
