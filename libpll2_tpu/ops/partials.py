"""Conditional likelihood vector (CLV) updates — Felsenstein pruning.

TPU-native design notes
-----------------------
CLVs are stored as [node, rate, state, site]: the site axis lands on the TPU
vector lanes (128-wide), so the per-site Felsenstein product vectorizes fully,
while the state contraction is a small batched matmul the MXU/VPU handles:

    parent[r, i, s] = (sum_j Pl[r,i,j] * left[r,j,s])
                    * (sum_j Pr[r,i,j] * right[r,j,s])

The reference iterates an operation list serially and dispatches tt/ti/ii
SIMD kernels (reference: /root/reference/src/partials.c:237-291,
/root/reference/src/core_partials.c:629-790). Here tips are bit-decoded CLVs
(the reference's "plain" mode) so every operation is the ii case, executed as
one `lax.scan` over the operation arrays — topology is data, not code, so one
compiled program serves every topology of a given size. Independent
operations of the same tree level can also be batched (see
`update_partials_levels`), turning the scan into depth-many batched launches.

Numerical scaling semantics are preserved exactly
(core_partials.c:707-789): per-site mode multiplies the whole site block by
2**256 when all states*rates entries fall below 2**-256 and increments an
integer scaler; per-rate mode (PLL_ATTRIB_RATE_SCALERS) checks each rate
category independently. Parent scalers start as the sum of child scalers
(pll.c:1183 fill_parent_scaler).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Operations(NamedTuple):
    """Structure-of-arrays operation list (pll.h:314-324 pll_operation_t)."""
    parent_clv: jnp.ndarray      # [n] int32
    parent_scaler: jnp.ndarray   # [n] int32 (-1 = none)
    child1_clv: jnp.ndarray
    child1_matrix: jnp.ndarray
    child1_scaler: jnp.ndarray
    child2_clv: jnp.ndarray
    child2_matrix: jnp.ndarray
    child2_scaler: jnp.ndarray


def _read_scaler(scaler: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Child scaler row(s), or zeros when idx is SCALE_BUFFER_NONE (-1).

    idx may be a scalar (scan variant) or a [W] vector (level variant)."""
    row = jnp.take(scaler, jnp.maximum(idx, 0), axis=0)
    ok = (idx >= 0).reshape(jnp.shape(idx) + (1,) * (row.ndim - jnp.ndim(idx)))
    return jnp.where(ok, row, jnp.zeros_like(row))


def _one_partial(pl, left, pr, right, preferred):
    terma = jnp.einsum('rij,rjs->ris', pl, left,
                       preferred_element_type=preferred)
    termb = jnp.einsum('rij,rjs->ris', pr, right,
                       preferred_element_type=preferred)
    return terma * termb


@partial(jax.jit, static_argnames=('rate_scalers',))
def update_partials(clv: jnp.ndarray,        # [N, R, s, S]
                    scaler: jnp.ndarray,     # [K+1, S] or [K+1, R, S] int32
                    pmatrix: jnp.ndarray,    # [E, R, s, s]
                    ops: Operations,
                    scale_threshold: float,
                    scale_factor: float,
                    rate_scalers: bool = False):
    """Execute the operation list; returns updated (clv, scaler).

    `scaler` must carry one trailing scratch row (index K) that absorbs
    writes for operations with parent_scaler_index == -1.
    """
    dtype = clv.dtype
    trash = scaler.shape[0] - 2       # last row is the guaranteed-zero row
    thresh = jnp.asarray(scale_threshold, dtype)
    factor = jnp.asarray(scale_factor, dtype)

    def body(carry, op):
        clv, scaler = carry
        (parent, psc, c1, m1, s1, c2, m2, s2) = op

        left = jnp.take(clv, c1, axis=0)
        right = jnp.take(clv, c2, axis=0)
        pl = jnp.take(pmatrix, m1, axis=0)
        pr = jnp.take(pmatrix, m2, axis=0)
        x = _one_partial(pl, left, pr, right, dtype)

        has_scaler = psc >= 0
        child_sc = _read_scaler(scaler, s1) + _read_scaler(scaler, s2)
        if rate_scalers:
            # all states of one rate category below threshold -> scale it
            mask = jnp.all(x < thresh, axis=1)            # [R, S]
            scaled = jnp.where(mask[:, None, :], x * factor, x)
        else:
            # all states x rates of the site below threshold -> scale site
            mask = jnp.all(x < thresh, axis=(0, 1))       # [S]
            scaled = jnp.where(mask[None, None, :], x * factor, x)
        new_sc = child_sc + mask.astype(scaler.dtype)

        x = jnp.where(has_scaler, scaled, x)
        write_row = jnp.where(has_scaler, psc, trash)
        clv = clv.at[parent].set(x)
        scaler = scaler.at[write_row].set(new_sc)
        return (clv, scaler), None

    op_stack = jnp.stack([ops.parent_clv, ops.parent_scaler,
                          ops.child1_clv, ops.child1_matrix, ops.child1_scaler,
                          ops.child2_clv, ops.child2_matrix, ops.child2_scaler],
                         axis=1)
    (clv, scaler), _ = jax.lax.scan(body, (clv, scaler), op_stack)
    return clv, scaler


@partial(jax.jit, static_argnames=('rate_scalers',))
def update_partials_repeats_fused(clv: jnp.ndarray,
                                  scaler: jnp.ndarray,
                                  pmatrix: jnp.ndarray,
                                  buckets,   # tuple of (Operations, gl, gr)
                                  scale_threshold: float,
                                  scale_factor: float,
                                  rate_scalers: bool = False):
    """All capacity buckets in ONE compiled program (one dispatch)."""
    for ops, gl, gr in buckets:
        clv, scaler = update_partials_repeats(
            clv, scaler, pmatrix, ops, gl, gr, scale_threshold,
            scale_factor, rate_scalers=rate_scalers)
    return clv, scaler


@partial(jax.jit, static_argnames=('rate_scalers',))
def update_partials_repeats(clv: jnp.ndarray,      # [N, R, s, S]
                            scaler: jnp.ndarray,   # [K+1, S] or [K+1, R, S]
                            pmatrix: jnp.ndarray,  # [E, R, s, s]
                            ops: Operations,       # one capacity bucket
                            gather_left: jnp.ndarray,   # [n, W] int32
                            gather_right: jnp.ndarray,  # [n, W] int32
                            scale_threshold: float,
                            scale_factor: float,
                            rate_scalers: bool = False):
    """Site-repeats pruning over one capacity bucket of width W <= S.

    Computes only W class columns per operation: parent class c is fed by
    the child class columns gather_left[c] / gather_right[c] (the
    reference's compressed-CLV indexing, core_partials.c:843-849, turned
    into a gather). Columns >= W of the parent rows keep stale values and
    are never read — every consumer gathers through site_id < ids <= W.
    Child scalers propagate through the same indirection
    (pll_fill_parent_scaler_repeats, repeats.c:392-440).
    """
    dtype = clv.dtype
    trash = scaler.shape[0] - 2       # last row is the guaranteed-zero row
    thresh = jnp.asarray(scale_threshold, dtype)
    factor = jnp.asarray(scale_factor, dtype)

    # TPUs have no hardware gather on the lane (site) axis; a one-hot
    # matmul rides the MXU instead and is exact (0/1 matrix). On CPU the
    # direct gather wins.
    use_onehot = jax.default_backend() == "tpu"
    n_cols = clv.shape[-1]

    def _gather_cols(row, idx):
        if not use_onehot:
            return jnp.take(row, idx, axis=2)
        onehot = (idx[None, :] == jnp.arange(n_cols)[:, None]).astype(dtype)
        return jnp.einsum('rjs,sw->rjw', row, onehot,
                          preferred_element_type=dtype)

    def body(carry, xs):
        clv, scaler = carry
        op, gl, gr = xs
        (parent, psc, c1, m1, s1, c2, m2, s2) = op

        left = _gather_cols(jnp.take(clv, c1, axis=0), gl)       # [R, s, W]
        right = _gather_cols(jnp.take(clv, c2, axis=0), gr)
        pl = jnp.take(pmatrix, m1, axis=0)
        pr = jnp.take(pmatrix, m2, axis=0)
        x = _one_partial(pl, left, pr, right, dtype)             # [R, s, W]

        has_scaler = psc >= 0
        sc1 = jnp.take(_read_scaler(scaler, s1), gl, axis=-1)
        sc2 = jnp.take(_read_scaler(scaler, s2), gr, axis=-1)
        child_sc = sc1 + sc2                                     # [W]/[R, W]
        if rate_scalers:
            mask = jnp.all(x < thresh, axis=1)                   # [R, W]
            scaled = jnp.where(mask[:, None, :], x * factor, x)
        else:
            mask = jnp.all(x < thresh, axis=(0, 1))              # [W]
            scaled = jnp.where(mask[None, None, :], x * factor, x)
        new_sc = child_sc + mask.astype(scaler.dtype)

        x = jnp.where(has_scaler, scaled, x)
        # write the first W class columns of the parent row in place
        row = jax.lax.dynamic_slice_in_dim(clv, parent, 1, axis=0)[0]
        row = jax.lax.dynamic_update_slice_in_dim(row, x, 0, axis=2)
        clv = jax.lax.dynamic_update_index_in_dim(clv, row, parent, axis=0)
        write_row = jnp.where(has_scaler, psc, trash)
        srow = jnp.take(scaler, write_row, axis=0)
        srow = jax.lax.dynamic_update_slice_in_dim(srow, new_sc, 0, axis=-1)
        scaler = jax.lax.dynamic_update_index_in_dim(scaler, srow,
                                                     write_row, axis=0)
        return (clv, scaler), None

    op_stack = jnp.stack([ops.parent_clv, ops.parent_scaler,
                          ops.child1_clv, ops.child1_matrix,
                          ops.child1_scaler, ops.child2_clv,
                          ops.child2_matrix, ops.child2_scaler], axis=1)
    (clv, scaler), _ = jax.lax.scan(body, (clv, scaler),
                                    (op_stack, gather_left, gather_right))
    return clv, scaler


@jax.jit
def gather_site_view(clv_node: jnp.ndarray,     # [R, s, S] class columns
                     scaler_row: jnp.ndarray,   # [S] or [R, S]
                     site_id: jnp.ndarray):     # [S] int32
    """Expand class columns back to per-site order for the likelihood /
    sumtable kernels (the reference's repeats likelihood indexing,
    core_likelihood.c:211-349)."""
    return (jnp.take(clv_node, site_id, axis=2),
            jnp.take(scaler_row, site_id, axis=-1))


@partial(jax.jit, static_argnames=('rate_scalers',))
def update_partials_levels(clv: jnp.ndarray,
                           scaler: jnp.ndarray,
                           pmatrix: jnp.ndarray,
                           ops: Operations,          # padded to [L, W] each
                           valid: jnp.ndarray,       # [L, W] bool
                           scale_threshold: float,
                           scale_factor: float,
                           rate_scalers: bool = False):
    """Level-scheduled variant: ops grouped into L levels of width W.

    All operations inside one level are independent (different parents whose
    children are already computed), so each level runs as one batched einsum
    over [W, R, s, S] — this is the launch-width knob that keeps the MXU busy
    on balanced trees (depth O(log n) levels instead of O(n) scan steps).
    Padded slots (valid == False) write to scratch rows.
    """
    dtype = clv.dtype
    n_nodes = clv.shape[0] - 1          # last row is scratch
    trash_sc = scaler.shape[0] - 2      # last row is the guaranteed-zero row
    thresh = jnp.asarray(scale_threshold, dtype)
    factor = jnp.asarray(scale_factor, dtype)

    def level(carry, xs):
        clv, scaler = carry
        (parent, psc, c1, m1, s1, c2, m2, s2, ok) = xs

        left = jnp.take(clv, c1, axis=0)               # [W, R, s, S]
        right = jnp.take(clv, c2, axis=0)
        pl = jnp.take(pmatrix, m1, axis=0)             # [W, R, s, s]
        pr = jnp.take(pmatrix, m2, axis=0)
        terma = jnp.einsum('wrij,wrjs->wris', pl, left,
                           preferred_element_type=dtype)
        termb = jnp.einsum('wrij,wrjs->wris', pr, right,
                           preferred_element_type=dtype)
        x = terma * termb

        has_scaler = (psc >= 0) & ok
        child_sc = _read_scaler(scaler, s1) + _read_scaler(scaler, s2)
        if rate_scalers:
            mask = jnp.all(x < thresh, axis=2)          # [W, R, S]
            scaled = jnp.where(mask[:, :, None, :], x * factor, x)
        else:
            mask = jnp.all(x < thresh, axis=(1, 2))     # [W, S]
            scaled = jnp.where(mask[:, None, None, :], x * factor, x)
        new_sc = child_sc + mask.astype(scaler.dtype)

        hs = has_scaler.reshape((-1,) + (1,) * (x.ndim - 1))
        x = jnp.where(hs, scaled, x)
        clv = clv.at[jnp.where(ok, parent, n_nodes)].set(x)
        scaler = scaler.at[jnp.where(has_scaler, psc, trash_sc)].set(new_sc)
        return (clv, scaler), None

    xs = (ops.parent_clv, ops.parent_scaler,
          ops.child1_clv, ops.child1_matrix, ops.child1_scaler,
          ops.child2_clv, ops.child2_matrix, ops.child2_scaler, valid)
    (clv, scaler), _ = jax.lax.scan(level, (clv, scaler), xs)
    return clv, scaler
