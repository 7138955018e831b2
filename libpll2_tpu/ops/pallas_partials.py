"""Pallas TPU kernel for the hot operation: batched CLV pruning updates.

One tree level = W independent Felsenstein pruning steps. The XLA path
(ops/partials.py) materializes gathered child copies, runs two einsums, the
product, the underflow mask, and a scatter — five HBM passes over
[W, R, s, S] data. This kernel fuses everything into one pass:

    grid = (W ops, S/TILE site tiles); per step the pipeline DMAs the two
    child CLV blocks (rows chosen by scalar-prefetched node indices), the
    two P-matrices and the two child scaler blocks into VMEM, computes

        x = (Pl @ left) * (Pr @ right)         (per rate, states unrolled)
        mask = all_states_and_rates(x < threshold)
        out = where(mask, x * 2^64, x);  new_scaler = sc1 + sc2 + mask

    and writes the compact level outputs. The states contraction is an
    unrolled multiply-accumulate on the VPU — for 4..20 states the MXU's
    128x128 tiles would be mostly padding; sites ride the 128-wide lanes.

fp32 only (the TPU fast path; fp64 validation stays on the XLA path).
Scalar-prefetch carries the per-op index table so one compiled kernel
serves every topology of a given (W, R, s, S) shape.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _site_tile(sites: int) -> int:
    import os
    forced = int(os.environ.get("PLL_PALLAS_TILE", "0"))
    if forced and sites % forced == 0:
        return forced
    for t in (2048, 1024, 512, 256, LANE):
        if sites % t == 0:
            return t
    return sites


def _kernel(idx_ref,            # [9, W] int32 (SMEM, prefetched)
            left_ref,           # [1, RS, T]
            right_ref,          # [1, RS, T]
            pl_ref,             # [1, R, s, s]
            pr_ref,             # [1, R, s, s]
            sc1_ref,            # [1, 1, T] int32
            sc2_ref,            # [1, 1, T] int32
            out_ref,            # [1, RS, T]
            scout_ref,          # [1, 1, T] int32
            *, rates: int, states: int, threshold: float, factor: float):
    left = left_ref[0]                       # [RS, T]
    right = right_ref[0]
    pmat_l = pl_ref[0]                       # [R, s, s]
    pmat_r = pr_ref[0]

    tile = left.shape[-1]
    x_rows = []
    all_small = None
    for r in range(rates):
        lrow = left[r * states:(r + 1) * states]     # [s, T]
        rrow = right[r * states:(r + 1) * states]
        # unrolled state contraction on the VPU: terma[i,:] = sum_j P[i,j]*l[j,:]
        terma = jnp.zeros((states, tile), left.dtype)
        termb = jnp.zeros((states, tile), left.dtype)
        for j in range(states):
            terma = terma + pmat_l[r, :, j][:, None] * lrow[j][None, :]
            termb = termb + pmat_r[r, :, j][:, None] * rrow[j][None, :]
        x = terma * termb                            # [s, T]
        small = jnp.max(x, axis=0) < threshold       # [T] (see pallas_fused)
        all_small = small if all_small is None else (all_small & small)
        x_rows.append(x)

    x = jnp.concatenate(x_rows, axis=0)              # [RS, T]
    has_scaler = idx_ref[8, pl.program_id(0)] > 0
    scale = all_small & has_scaler
    x = jnp.where(scale[None, :], x * factor, x)
    out_ref[0] = x
    scout_ref[0, 0] = (sc1_ref[0, 0] + sc2_ref[0, 0]
                       + scale.astype(jnp.int32))


@partial(jax.jit, static_argnames=('rates', 'states', 'threshold', 'factor',
                                   'interpret'))
def level_update_pallas(clv2d: jnp.ndarray,      # [N+1, R*s, S]
                        scaler: jnp.ndarray,     # [K+2, S] int32
                        pmatrix: jnp.ndarray,    # [E, R, s, s]
                        idx: jnp.ndarray,        # [9, W] int32
                        rates: int, states: int,
                        threshold: float, factor: float,
                        interpret: bool = False):
    """One level of W ops. idx rows: parent, c1, c2, m1, m2, s1r, s2r, pscw
    (s*r = read rows with NONE already mapped to the zero row; pscw = write
    rows with NONE mapped to the trash row). Returns (new_rows [W, RS, S],
    new_scaler_rows [W, S])."""
    n_ops = idx.shape[1]
    rs = rates * states
    sites = clv2d.shape[-1]
    tile = _site_tile(sites)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_ops, sites // tile),
        in_specs=[
            pl.BlockSpec((1, rs, tile), lambda i, j, idx: (idx[1, i], 0, j)),
            pl.BlockSpec((1, rs, tile), lambda i, j, idx: (idx[2, i], 0, j)),
            pl.BlockSpec((1, rates, states, states),
                         lambda i, j, idx: (idx[3, i], 0, 0, 0)),
            pl.BlockSpec((1, rates, states, states),
                         lambda i, j, idx: (idx[4, i], 0, 0, 0)),
            pl.BlockSpec((1, 1, tile), lambda i, j, idx: (idx[5, i], 0, j)),
            pl.BlockSpec((1, 1, tile), lambda i, j, idx: (idx[6, i], 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, rs, tile), lambda i, j, idx: (i, 0, j)),
            pl.BlockSpec((1, 1, tile), lambda i, j, idx: (i, 0, j)),
        ],
    )
    kernel = partial(_kernel, rates=rates, states=states,
                     threshold=threshold, factor=factor)
    scaler3d = scaler[:, None, :]
    out, scout = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_ops, rs, sites), clv2d.dtype),
            jax.ShapeDtypeStruct((n_ops, 1, sites), scaler.dtype),
        ],
        interpret=interpret,
    )(idx, clv2d, clv2d, pmatrix, pmatrix, scaler3d, scaler3d)
    return out, scout[:, 0, :]


@partial(jax.jit, static_argnames=('rates', 'states', 'threshold', 'factor',
                                   'interpret'))
def update_partials_pallas(clv: jnp.ndarray,       # [N+1, R, s, S]
                           scaler: jnp.ndarray,    # [K+2, S] int32
                           pmatrix: jnp.ndarray,   # [E, R, s, s]
                           level_idx,              # tuple of [8, W_l] arrays
                           rates: int, states: int,
                           threshold: float, factor: float,
                           interpret: bool = False):
    """Run all levels; returns updated (clv, scaler). The index tables come
    from `pack_pallas_levels` (a tuple, so level count/widths are static).
    PLL_PALLAS_INPLACE=1 selects the manual-DMA in-place variant (no
    per-level scatter)."""
    import os
    if os.environ.get("PLL_PALLAS_INPLACE"):
        return update_partials_inplace(clv, scaler, pmatrix, level_idx,
                                       rates, states, threshold, factor,
                                       interpret=interpret)
    n = clv.shape[0]
    sites = clv.shape[-1]
    clv2d = clv.reshape(n, rates * states, sites)
    for idx in level_idx:
        out, scout = level_update_pallas(clv2d, scaler, pmatrix, idx,
                                         rates, states, threshold, factor,
                                         interpret=interpret)
        clv2d = clv2d.at[idx[0]].set(out)
        scaler = scaler.at[idx[7]].set(scout)
    return clv2d.reshape(clv.shape), scaler


def _inplace_kernel(idx_ref,           # [9, W] int32 (SMEM, prefetched)
                    clv_hbm,           # [N+1, RS, S] in ANY/HBM (aliased)
                    pl_ref,            # [1, R, s, s] VMEM (auto)
                    pr_ref,
                    sc1_ref,           # [1, 1, T] int32 (auto)
                    sc2_ref,
                    out_hbm,           # aliased with clv_hbm
                    scout_ref,         # [1, 1, T] int32 (auto)
                    lbuf, rbuf, obuf,  # VMEM [2, RS, T] scratch
                    sems,              # DMA sems [3, 2]
                    *, rates: int, states: int, threshold: float,
                    factor: float, tile: int):
    """In-place level update: child blocks are DMA'd from the aliased HBM
    CLV buffer, the parent block is DMA'd back into it. Safe because ops
    within one level never read rows written by the level; double-buffered
    reads overlap compute."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_i = pl.num_programs(0)
    n_j = pl.num_programs(1)
    step = i * n_j + j
    slot = step % 2

    def child_dma(buf, which, row_sel, i_, j_, slot_):
        return pltpu.make_async_copy(
            clv_hbm.at[row_sel, :, pl.ds(j_ * tile, tile)],
            buf.at[slot_],
            sems.at[which, slot_])

    def start_reads(i_, j_, slot_):
        child_dma(lbuf, 0, idx_ref[1, i_], i_, j_, slot_).start()
        child_dma(rbuf, 1, idx_ref[2, i_], i_, j_, slot_).start()

    @pl.when(step == 0)
    def _():
        start_reads(i, j, slot)

    # prefetch next step's children
    @pl.when(step + 1 < n_i * n_j)
    def _():
        nstep = step + 1
        ni = nstep // n_j
        nj = nstep % n_j
        start_reads(ni, nj, nstep % 2)

    child_dma(lbuf, 0, idx_ref[1, i], i, j, slot).wait()
    child_dma(rbuf, 1, idx_ref[2, i], i, j, slot).wait()

    left = lbuf[slot]
    right = rbuf[slot]
    pmat_l = pl_ref[0]
    pmat_r = pr_ref[0]
    x_rows = []
    all_small = None
    for r in range(rates):
        lrow = left[r * states:(r + 1) * states]
        rrow = right[r * states:(r + 1) * states]
        terma = jnp.zeros((states, tile), left.dtype)
        termb = jnp.zeros((states, tile), left.dtype)
        for jj in range(states):
            terma = terma + pmat_l[r, :, jj][:, None] * lrow[jj][None, :]
            termb = termb + pmat_r[r, :, jj][:, None] * rrow[jj][None, :]
        x = terma * termb
        small = jnp.max(x, axis=0) < threshold
        all_small = small if all_small is None else (all_small & small)
        x_rows.append(x)
    x = jnp.concatenate(x_rows, axis=0)
    has_scaler = idx_ref[8, i] > 0
    scale_mask = all_small & has_scaler
    x = jnp.where(scale_mask[None, :], x * factor, x)

    # wait for the write that used this obuf slot two steps ago
    @pl.when(step >= 2)
    def _():
        pstep = step - 2
        pi = pstep // n_j
        pj = pstep % n_j
        pltpu.make_async_copy(
            obuf.at[slot],
            out_hbm.at[idx_ref[0, pi], :, pl.ds(pj * tile, tile)],
            sems.at[2, slot]).wait()

    obuf[slot] = x
    pltpu.make_async_copy(
        obuf.at[slot],
        out_hbm.at[idx_ref[0, i], :, pl.ds(j * tile, tile)],
        sems.at[2, slot]).start()
    scout_ref[0, 0] = (sc1_ref[0, 0] + sc2_ref[0, 0]
                       + scale_mask.astype(jnp.int32))

    # drain outstanding writes at the very end
    @pl.when(step == n_i * n_j - 1)
    def _():
        pltpu.make_async_copy(
            obuf.at[slot],
            out_hbm.at[idx_ref[0, i], :, pl.ds(j * tile, tile)],
            sems.at[2, slot]).wait()

        @pl.when(n_i * n_j >= 2)
        def _():
            pstep = step - 1
            pi = pstep // n_j
            pj = pstep % n_j
            pltpu.make_async_copy(
                obuf.at[pstep % 2],
                out_hbm.at[idx_ref[0, pi], :, pl.ds(pj * tile, tile)],
                sems.at[2, pstep % 2]).wait()


@partial(jax.jit, static_argnames=('rates', 'states', 'threshold', 'factor',
                                   'interpret'))
def level_update_inplace(clv2d: jnp.ndarray,      # [N+1, RS, S]
                        scaler: jnp.ndarray,      # [K+2, S] int32
                        pmatrix: jnp.ndarray,
                        idx: jnp.ndarray,         # [8, W]
                        rates: int, states: int,
                        threshold: float, factor: float,
                        interpret: bool = False):
    """One level, writing parent rows in place (clv2d is donated/aliased).
    Returns (clv2d', scaler_rows [W, S])."""
    n_ops = idx.shape[1]
    rs = rates * states
    sites = clv2d.shape[-1]
    tile = _site_tile(sites)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_ops, sites // tile),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, rates, states, states),
                         lambda i, j, idx: (idx[3, i], 0, 0, 0)),
            pl.BlockSpec((1, rates, states, states),
                         lambda i, j, idx: (idx[4, i], 0, 0, 0)),
            pl.BlockSpec((1, 1, tile), lambda i, j, idx: (idx[5, i], 0, j)),
            pl.BlockSpec((1, 1, tile), lambda i, j, idx: (idx[6, i], 0, j)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, 1, tile), lambda i, j, idx: (i, 0, j)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, rs, tile), clv2d.dtype),
            pltpu.VMEM((2, rs, tile), clv2d.dtype),
            pltpu.VMEM((2, rs, tile), clv2d.dtype),
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
    )
    kernel = partial(_inplace_kernel, rates=rates, states=states,
                     threshold=threshold, factor=factor, tile=tile)
    scaler3d = scaler[:, None, :]
    clv2d, scout = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(clv2d.shape, clv2d.dtype),
            jax.ShapeDtypeStruct((n_ops, 1, sites), scaler.dtype),
        ],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx, clv2d, pmatrix, pmatrix, scaler3d, scaler3d)
    return clv2d, scout[:, 0, :]


@partial(jax.jit, static_argnames=('rates', 'states', 'threshold', 'factor',
                                   'interpret'))
def update_partials_inplace(clv: jnp.ndarray,
                            scaler: jnp.ndarray,
                            pmatrix: jnp.ndarray,
                            level_idx,
                            rates: int, states: int,
                            threshold: float, factor: float,
                            interpret: bool = False):
    """All levels with in-place parent writes (no per-level scatter)."""
    n = clv.shape[0]
    sites = clv.shape[-1]
    clv2d = clv.reshape(n, rates * states, sites)
    for idx in level_idx:
        clv2d, scout = level_update_inplace(clv2d, scaler, pmatrix, idx,
                                            rates, states, threshold,
                                            factor, interpret=interpret)
        scaler = scaler.at[idx[7]].set(scout)
    return clv2d.reshape(clv.shape), scaler


def pack_pallas_levels(operations, n_tips: int, scratch_clv: int,
                       zero_scaler_row: int, trash_scaler_row: int):
    """Compile an operation list into per-level [8, W] index tables.

    Rows: parent, child1_clv, child2_clv, matrix1, matrix2,
    scaler1_read, scaler2_read, parent_scaler_write. SCALE_BUFFER_NONE
    reads map to the guaranteed-zero row, NONE writes to the trash row.
    Level widths are padded to powers of two (padded slots write the
    scratch CLV row / trash scaler row), so SPR-style topology changes hit
    a bounded set of compiled kernel shapes instead of recompiling.
    """
    from ..trees.utree import compile_levels
    levels = compile_levels(operations, n_tips)
    tables = []
    for lv in levels:
        w = 1
        while w < len(lv):
            w *= 2
        t = np.zeros((9, w), dtype=np.int32)
        # padded slots: recompute a harmless op into the scratch rows
        t[0, :] = scratch_clv
        t[5, :] = zero_scaler_row
        t[6, :] = zero_scaler_row
        t[7, :] = trash_scaler_row
        for k, op in enumerate(lv):
            t[:, k] = [
                op.parent_clv_index,
                op.child1_clv_index,
                op.child2_clv_index,
                op.child1_matrix_index,
                op.child2_matrix_index,
                op.child1_scaler_index if op.child1_scaler_index >= 0
                else zero_scaler_row,
                op.child2_scaler_index if op.child2_scaler_index >= 0
                else zero_scaler_row,
                op.parent_scaler_index if op.parent_scaler_index >= 0
                else trash_scaler_row,
                1 if op.parent_scaler_index >= 0 else 0,
            ]
        tables.append(jnp.asarray(t))
    return tuple(tables)
