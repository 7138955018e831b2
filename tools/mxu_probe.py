"""MXU roofline probe for the 20-state (AA) kernel redesign.

Times pure Pallas dot kernels on the real chip to answer:
  1. Does an [80,80]@[80,T] fp32 dot cost the same as [128,128]@[128,T]?
     (pass granularity: is the systolic array pass-quantized at 128?)
  2. What is fp32 vs bf16 column throughput? (how many passes is fp32?)

Each iteration's dot reads a DIFFERENT matrix slice from a stack of 8 so
Mosaic cannot hoist the dot out of the loop; iterations accumulate into
one register block (no DCE) but are otherwise independent (pipelined).
Differenced trip counts (never single dispatches — the axon tunnel is
~30 ms/dispatch).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def make_dot_kernel(m, k, t, iters, dtype, acc_dtype):
    def kern(a_ref, x_ref, o_ref):
        x = x_ref[...]

        def body(i, acc):
            a = a_ref[pl.ds((i % 8) * m, m), :]
            return acc + jnp.dot(a, x, preferred_element_type=acc_dtype)

        acc = jax.lax.fori_loop(
            0, iters, body, jnp.zeros((m, t), acc_dtype))
        o_ref[...] = acc

    @jax.jit
    def run(a, x):
        return pl.pallas_call(
            kern,
            grid=(8,),
            in_specs=[
                pl.BlockSpec((8 * m, k), lambda j: (0, 0)),
                pl.BlockSpec((k, t), lambda j: (0, j)),
            ],
            out_specs=pl.BlockSpec((m, t), lambda j: (0, j)),
            out_shape=jax.ShapeDtypeStruct((m, t * 8), acc_dtype),
        )(a, x)

    a = jnp.asarray(np.random.rand(8 * m, k), dtype)
    x = jnp.asarray(np.random.rand(k, t * 8), dtype)
    return run, a, x


def time_case(name, m, k, t, dtype, acc, iters_hi=20000, iters_lo=2000):
    runs = {}
    for it in (iters_lo, iters_hi):
        run, a, x = make_dot_kernel(m, k, t, it, dtype, acc)
        run(a, x).block_until_ready()
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            run(a, x).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        runs[it] = best
    dt = (runs[iters_hi] - runs[iters_lo]) / (iters_hi - iters_lo) / 8
    cols = t
    col_rate = cols / dt
    flops = 2 * m * k * cols / dt
    print(f"{name:34s} {dt*1e6:8.2f} us/dot  {col_rate/1e9:6.2f} G col/s"
          f"  {flops/1e12:6.2f} TFLOP/s")
    return col_rate


if __name__ == "__main__":
    print("devices:", jax.devices())
    f32, bf16 = jnp.float32, jnp.bfloat16
    time_case("f32 [128,128]@[128,512]", 128, 128, 512, f32, f32)
    time_case("f32 [80,80]@[80,512]", 80, 80, 512, f32, f32)
    time_case("f32 [120,120]@[120,512]", 120, 120, 512, f32, f32)
    time_case("f32 [32,32]@[32,512]", 32, 32, 512, f32, f32)
    time_case("f32 [20,20]@[20,512]", 20, 20, 512, f32, f32)
    time_case("bf16 [128,128]@[128,512]", 128, 128, 512, bf16, f32)
    time_case("bf16 [80,80]@[80,512]", 80, 80, 512, bf16, f32)
    time_case("f32 [128,128]@[128,2048]", 128, 128, 2048, f32, f32,
              iters_hi=5000, iters_lo=500)
    time_case("f32 [80,80]@[80,2048]", 80, 80, 2048, f32, f32,
              iters_hi=5000, iters_lo=500)
    time_case("f32 [80,80]@[80,128]", 80, 80, 128, f32, f32)
    time_case("f32 [160,160]@[160,512]", 160, 160, 512, f32, f32)
