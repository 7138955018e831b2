"""Pallas TPU kernel for the site-repeats class-column pool.

The XLA pool path (ops/partials.py update_partials_repeats_pool) executes
the operation list as a lax.scan; with class compression the per-op math
shrinks to a few percent of dense work, and the scan's fixed per-step cost
(~10 us of gather/scatter/launch bookkeeping) dominates — repeats were
0.76x dense on TPU despite doing 13% of the FLOPs. This kernel removes
that overhead:

  * the WHOLE class-column pool lives in VMEM for the duration of one
    call (typically a few MB: the pooled layout is 10x smaller than the
    dense buffers — repeats.FlatLayout);
  * one pallas_call per identity-profile run, grid = (ops in run,):
    TPU grid steps execute in order, so in-place postorder dependencies
    hold; per-step cost is ~1 us instead of ~10;
  * class permutes are blocked lane gathers: Mosaic's dynamic gather
    handles one 128-lane vreg of source at a time, so each 128-wide
    output chunk loops over source blocks, gathers within the block and
    selects by quotient — cheap VPU ops instead of the O(W^2) MXU MACs
    of a one-hot matmul. Because classes are numbered in first-occurrence
    order on both parent and child, the source indices of one output
    chunk cluster into a narrow band of blocks (measured mean span 1-4.5
    blocks at 246x4465 vs 35 blocks total), so each chunk's loop runs
    only over its precomputed [lo, hi) block band (SMEM-prefetched,
    dynamic fori_loop bounds) — near-O(W) in practice. Identity runs
    (repeats disabled on both ends) skip the permute entirely;
  * per-site scaling semantics identical to the XLA path (max(x) < t
    form; scaler counts as f32 rows, exact to 2^24).

fp32 only (the TPU fast path; fp64 validation uses the XLA pool path).
Pool offsets are lane-aligned by construction (repeats.bucket_width).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _run_kernel(fields_ref,     # [n, 8] int32 (SMEM, prefetched)
                lo_l_ref,       # [n, W/128] int32 (SMEM) block-band lo
                hi_l_ref,       # [n, W/128] int32 (SMEM) block-band hi
                lo_r_ref,       # [n, W/128] int32 (SMEM)
                hi_r_ref,       # [n, W/128] int32 (SMEM)
                gl_ref,         # [1, 1, W] int32 (blocked per op)
                gr_ref,         # [1, 1, W] int32
                pm_ref,         # [E, R, s, s] f32 (VMEM resident)
                pool_ref,       # [RS, T] f32 (VMEM resident, aliased out)
                sc_ref,         # [8, T2] f32 (VMEM resident, aliased out)
                pool_out,       # aliased with pool_ref
                sc_out,         # aliased with sc_ref
                buf_l,          # VMEM [rs+8, W] scratch: term + scaler row
                buf_r,          # VMEM [rs+8, W] scratch
                tmp,            # VMEM [rs+8, W] pre-permute staging
                *, rates: int, states: int, W: int,
                ident_l: bool, ident_r: bool,
                threshold: float, factor: float):
    i = pl.program_id(0)
    f32 = jnp.float32
    rs = rates * states
    thresh = jnp.asarray(float(threshold), f32)
    fact = jnp.asarray(float(factor), f32)

    def off(col):
        return pl.multiple_of(fields_ref[i, col], LANE)

    p_off, psc_off = off(0), off(1)
    c1_off, m1, s1_off = off(2), fields_ref[i, 3], off(4)
    c2_off, m2, s2_off = off(5), fields_ref[i, 6], off(7)

    nrows = rs + 8

    def term_into(buf, c_off, m, s_off, idx_ref, lo_ref, hi_ref, ident):
        """buf[:rs] <- permuted P @ child window; buf[rs] <- permuted
        child scaler row. Mosaic's dynamic gather spans a single source
        vreg along lanes, so the permute stages the term in `tmp` and,
        per 128-wide output chunk, loops over that chunk's [lo, hi)
        source-block band: gather within the block, select by index
        quotient."""
        win = pool_out[:, pl.ds(c_off, W)]                   # [rs, W]
        pm = pm_ref[pl.ds(m, 1)][0]                          # [R, s, s]
        rows = []
        for r in range(rates):
            crow = win[r * states:(r + 1) * states]          # [s, W]
            acc = jnp.zeros((states, W), f32)
            for j in range(states):
                acc = acc + pm[r, :, j][:, None] * crow[j][None, :]
            rows.append(acc)
        t = jnp.concatenate(
            rows + [sc_out[0:8, pl.ds(s_off, W)]], axis=0)
        # t: [rs + 8, W]; rows rs.. carry the (identical) scaler rows
        if ident:
            buf[...] = t
            return
        tmp[...] = t

        def chunk(c, _):
            c0 = pl.multiple_of(c * LANE, LANE)
            sel = idx_ref[0, 0, pl.ds(c0, LANE)]             # [LANE]
            q = sel // LANE
            rb = jnp.broadcast_to((sel % LANE)[None, :], (nrows, LANE))

            def src_blk(b, acc):
                b0 = pl.multiple_of(b * LANE, LANE)
                blk = tmp[:, pl.ds(b0, LANE)]                # [nrows, LANE]
                g = jnp.take_along_axis(blk, rb, axis=1)
                return jnp.where((q == b)[None, :], g, acc)

            acc = jax.lax.fori_loop(lo_ref[i, c], hi_ref[i, c], src_blk,
                                    jnp.zeros((nrows, LANE), f32))
            buf[:, pl.ds(c0, LANE)] = acc
            return 0

        jax.lax.fori_loop(0, W // LANE, chunk, 0)

    term_into(buf_l, c1_off, m1, s1_off, gl_ref, lo_l_ref, hi_l_ref,
              ident_l)
    term_into(buf_r, c2_off, m2, s2_off, gr_ref, lo_r_ref, hi_r_ref,
              ident_r)
    x = buf_l[0:rs, :] * buf_r[0:rs, :]                      # [rs, W]
    small = jnp.max(x, axis=0) < thresh                      # [W]
    x = jnp.where(small[None, :], x * fact, x)
    new_sc = (buf_l[rs:rs + 1, :] + buf_r[rs:rs + 1, :]
              + small[None, :].astype(f32))                  # [1, W]

    pool_out[:, pl.ds(p_off, W)] = x
    sc_out[:, pl.ds(psc_off, W)] = jnp.broadcast_to(new_sc, (8, W))


def pool_pallas(clv_flat: jnp.ndarray,  # [R, s, T]
                sc_flat: jnp.ndarray,   # [T2] i32
                pmatrix: jnp.ndarray,   # [E,R,s,s]
                buckets,  # tuple of (fields, gl, gr)
                scale_threshold: float,
                scale_factor: float,
                rates: int, states: int,
                profiles=(),
                interpret: bool = False):
    """All identity-profile runs over the VMEM-resident pool; returns
    (clv_flat, sc_flat) like the XLA pool path. fp32 only.

    Un-jitted entry point, for use INSIDE an enclosing jit (engine /
    bench loops). CRITICAL: the `buckets` arrays must reach the trace as
    jit ARGUMENTS or host numpy constants — a closed-over *device* array
    becomes a jaxpr constvar, which defeats the pallas input/output
    aliasing and makes the call re-copy the whole pool per grid step
    (measured ~300x slower at 246x4465 scale)."""
    R, s, T = clv_flat.shape
    rs = R * s
    pool = clv_flat.reshape(rs, T)
    scp = jnp.tile(sc_flat.astype(jnp.float32)[None, :], (8, 1))
    pm = pmatrix.astype(jnp.float32)

    for (fields, gl, gr), (il, ir) in zip(buckets, profiles):
        n = fields.shape[0]
        W = gl.shape[-1]
        nblk = W // LANE

        def band(g):
            # per (op, output-chunk) source-block band [lo, hi): classes
            # are numbered in first-occurrence order on both ends, so the
            # band is narrow (mean 1-4.5 blocks measured at 246x4465).
            # Loop-invariant in the engine/bench fori_loops -> hoisted.
            q = (g.reshape(n, nblk, LANE) // LANE).astype(jnp.int32)
            return q.min(axis=2), q.max(axis=2) + 1     # [n, nblk] each
        lo_l, hi_l = band(gl)
        lo_r, hi_r = band(gr)
        gl = gl.reshape(n, 1, W)
        gr = gr.reshape(n, 1, W)
        kernel = partial(_run_kernel, rates=R, states=s, W=W,
                         ident_l=il, ident_r=ir,
                         threshold=scale_threshold, factor=scale_factor)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, 1, W), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((1, 1, W), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec(pm.shape, lambda i, *_: (0, 0, 0, 0)),
                pl.BlockSpec(pool.shape, lambda i, *_: (0, 0)),
                pl.BlockSpec(scp.shape, lambda i, *_: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec(pool.shape, lambda i, *_: (0, 0)),
                pl.BlockSpec(scp.shape, lambda i, *_: (0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((rs + 8, W), jnp.float32),
                pltpu.VMEM((rs + 8, W), jnp.float32),
                pltpu.VMEM((rs + 8, W), jnp.float32),
            ],
        )
        pool, scp = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct(pool.shape, jnp.float32),
                jax.ShapeDtypeStruct(scp.shape, jnp.float32),
            ],
            input_output_aliases={8: 0, 9: 1},
            compiler_params=pltpu.CompilerParams(
                # the pool + its aliased output + pipeline copies exceed
                # the 16 MB scoped-vmem default; v5e has far more VMEM
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(fields, lo_l, hi_l, lo_r, hi_r, gl, gr, pm, pool, scp)

    return (pool.reshape(R, s, T).astype(clv_flat.dtype),
            scp[0].astype(sc_flat.dtype))


# Eager/public entry point (partition.update_partials): buckets arrive as
# jit arguments here, which is the fast aliasing-friendly form.
update_partials_repeats_pool_pallas = jax.jit(
    pool_pallas, static_argnames=('profiles', 'rates', 'states',
                                  'scale_threshold', 'scale_factor',
                                  'interpret'))
