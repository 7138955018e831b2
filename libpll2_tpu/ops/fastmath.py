"""Accurate fp32 transcendentals for TPU.

XLA:TPU lowers `exp` to a hardware approximation measured at ~11 ulp
mean / ~39 ulp max on this chip, and `expm1` up to ~900 ulp near zero
(tools/diag_aa_repeats_phase2.py methodology; even `exp2` of integer
arguments is not exact). Those errors are systematic, so they do not
average out over sites: they were the dominant term of the aa_repeats
d1 gate error (1.9e-3, VERDICT r4 weak #3 — swapping in correctly
rounded exp values alone moved it to 1.3e-4), and `expm1` feeds every
P-matrix entry (ops/pmatrix.py, reference core_pmatrix.c:189-223).

`exp32`/`expm1_32` below are classic Cephes-style implementations built
from IEEE fp32 adds/multiplies (exact on the VPU) with an EXACT 2^n
scaling via exponent-field bitcast: ~1 ulp, a handful of FMAs per
element, negligible next to the states^2 einsums that consume the
results. Non-fp32 inputs (the CPU fp64 validation mode, where XLA
uses libm-quality lowering) pass through to jnp.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Cephes ln2 split: C1 has 15 trailing zero bits, so n * C1 is exact for
# |n| < 2^15 (fp32 exp range needs |n| <= 127).
_LN2_HI = 0.693359375
_LN2_LO = -2.12194440e-4
_INV_LN2 = 1.44269504088896341

# Taylor coefficients 1/k! for exp(r), |r| <= ln2/2 = 0.3466:
# degree-7 remainder r^8/8! < 5e-9 — below fp32 round-off.
_EXP_COEFS = (1.0 / 5040, 1.0 / 720, 1.0 / 120, 1.0 / 24,
              1.0 / 6, 0.5, 1.0, 1.0)


def _poly_exp(r):
    p = jnp.asarray(_EXP_COEFS[0], r.dtype)
    for c in _EXP_COEFS[1:]:
        p = p * r + jnp.asarray(c, r.dtype)
    return p


def _exp2i(n):
    """Exact 2**n for integral float n in [-126, 127] via the exponent
    field (jnp.exp2 is itself approximate on TPU)."""
    biased = (n.astype(jnp.int32) + 127) << 23
    return jax.lax.bitcast_convert_type(biased, jnp.float32)


def _use_poly(z) -> bool:
    """Polynomial path only for fp32 traced toward a TPU backend: the
    CPU lowering (libm) is already correctly rounded, and the polynomial
    would let per-program FMA-contraction differences break the CPU
    paths' cross-program bit-equality contract (test_pallas)."""
    return z.dtype == jnp.float32 and jax.default_backend() == "tpu"


def exp32(z):
    """~1-ulp exp for fp32 arrays on TPU; jnp.exp otherwise."""
    z = jnp.asarray(z)
    if not _use_poly(z):
        return jnp.exp(z)
    zc = jnp.clip(z, -87.0, 88.0)
    n = jnp.round(zc * jnp.asarray(_INV_LN2, jnp.float32))
    r = (zc - n * jnp.asarray(_LN2_HI, jnp.float32)) \
        - n * jnp.asarray(_LN2_LO, jnp.float32)
    e = _poly_exp(r) * _exp2i(n)
    # arguments past the clip window: exact 0 / inf as IEEE exp gives;
    # NaN must propagate (round(NaN)->int is unspecified and the range
    # guards are False for NaN — a finite garbage value would hide an
    # upstream failure the isfinite checks rely on catching)
    e = jnp.where(z < -87.0, 0.0, e)
    e = jnp.where(z > 88.0, jnp.inf, e)
    return jnp.where(jnp.isnan(z), z, e)


def expm1_32(z):
    """~1-ulp expm1 for fp32 arrays on TPU; jnp.expm1 otherwise.

    |z| <= ln2/2: direct Taylor z * P(z) (relative accuracy preserved as
    expm1 -> 0, where the TPU lowering loses ~3 digits); otherwise
    exp32(z) - 1 (exact subtraction is harmless there since
    |exp(z) - 1| >= 0.29)."""
    z = jnp.asarray(z)
    if not _use_poly(z):
        return jnp.expm1(z)
    # z * (1 + z/2 + z^2/6 + ... ): degree-8 total, remainder < 1e-9
    p = jnp.asarray(1.0 / 40320, jnp.float32)
    for c in (1.0 / 5040, 1.0 / 720, 1.0 / 120, 1.0 / 24, 1.0 / 6,
              0.5, 1.0):
        p = p * z + jnp.asarray(c, jnp.float32)
    small = z * p
    # |NaN| <= c is False, so NaN falls through to exp32, which
    # propagates it
    return jnp.where(jnp.abs(z) <= 0.3466, small, exp32(z) - 1.0)
