"""MXU pass-rate probe: the roofline underlying the 20-state kernel.

Measures fp32/bf16 column throughput of Pallas dots on the real chip.
Findings on v5e (2026-08, this probe + tools/profile_aa.py):

  * the systolic array is PASS-QUANTIZED: [20,20], [80,80] and [128,128]
    dots all stream ~5-7 G columns/s — K and M below 128 do not speed a
    pass up, so packing work into K is free until 128;
  * fp32 inputs run at bf16-pass speed (Mosaic's default jnp.dot demotes
    f32 operands to ONE bf16 pass, ~1.2e-3 relative error — the reason
    the fused kernel splits operands explicitly instead);
  * precision=HIGHEST costs ~4.8x a default pass (~6 passes);
  * => fp32-class accuracy costs >= 2 passes (bit-split bf16 hi/lo with
    the lo terms K-stacked into the same dot), giving the 20-state
    fused kernel a hard dot ceiling of ~1.5 G site-updates/s for
    'split' mode and ~3 G for raw 'bf16' mode at R=4.

Methodology: iterate dots inside a fori_loop with a DIFFERENT matrix
slice per iteration (hoist-proof), accumulate (DCE-proof), and fetch a
scalar sum (the axon tunnel's block_until_ready does not reliably block)
with two trip counts differenced (dispatch-latency-proof).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

rng = np.random.default_rng(0)


def make(m, k, t, iters, dtype, prec=None, nmat=8):
    def kern(a_ref, x_ref, o_ref):
        x = x_ref[...].astype(dtype)

        def body(i, acc):
            aa = a_ref[pl.ds((i % nmat) * m, m), :]
            return acc + jnp.dot(aa, x, preferred_element_type=jnp.float32,
                                 precision=prec)
        o_ref[...] = jax.lax.fori_loop(0, iters, body,
                                       jnp.zeros((m, t), jnp.float32))

    @jax.jit
    def run(a, x):
        r = pl.pallas_call(
            kern, grid=(8,),
            in_specs=[pl.BlockSpec((nmat * m, k), lambda j: (0, 0)),
                      pl.BlockSpec((k, t), lambda j: (0, j))],
            out_specs=pl.BlockSpec((m, t), lambda j: (0, j)),
            out_shape=jax.ShapeDtypeStruct((m, t * 8), jnp.float32))(a, x)
        return jnp.sum(r)

    return (run, jnp.asarray(rng.random((nmat * m, k)), dtype),
            jnp.asarray(rng.random((k, t * 8)), jnp.float32))


def timeit(m, k, t, dtype, prec=None, lo=500, hi=5000, name=""):
    res = {}
    for iters in (lo, hi):
        run, a, x = make(m, k, t, iters, dtype, prec)
        float(run(a, x))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            float(run(a, x))
            best = min(best, time.perf_counter() - t0)
        res[iters] = best
    dt = (res[hi] - res[lo]) / ((hi - lo) * 8)
    print(f"{name:36s} {dt*1e6:7.3f} us/dot {t/dt/1e9:7.2f} G col/s "
          f"{2*m*k*t/dt/1e12:7.2f} TF useful")


if __name__ == "__main__":
    print("devices:", jax.devices())
    f32, bf16 = jnp.float32, jnp.bfloat16
    H = jax.lax.Precision.HIGHEST
    timeit(128, 128, 512, f32, name="f32(->bf16 pass) [128,128]@[...,512]")
    timeit(80, 80, 512, f32, name="f32(->bf16 pass) [80,80]@[...,512]")
    timeit(20, 20, 512, f32, name="f32(->bf16 pass) [20,20]@[...,512]")
    timeit(80, 80, 512, bf16, name="bf16 [80,80]@[...,512]")
    timeit(80, 20, 512, bf16, name="bf16 [80,20]@[...,512] (tip stack)")
    timeit(80, 240, 512, bf16, name="bf16 [80,240]@[...,512] (split K)")
    timeit(80, 80, 512, f32, H, name="f32 HIGHEST [80,80]@[...,512]")
    timeit(80, 80, 2048, bf16, lo=200, hi=2000,
           name="bf16 [80,80]@[...,2048]")
