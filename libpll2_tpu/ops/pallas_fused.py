"""Fused full-traversal Pallas kernel: the whole postorder in ONE kernel.

The per-level kernel (ops/pallas_partials.py) still round-trips every CLV
through HBM: each of the ~N pruning ops reads two [R*s, S] child rows and
writes one parent row — ~6 MB of HBM traffic per op at the flagship size,
which bounds the traversal at ~10% of the chip (VERDICT r1 roofline). This
kernel removes nearly all of that traffic:

  * grid = (sites/TILE,): one grid step owns a site tile END TO END;
  * tips are read as packed int32 state BITMASKS (4 B/site instead of
    R*s*4 B/site — 16x less for DNA, 80x for AA) and bit-decoded into
    indicator CLVs on the fly (the reference's tip-inner specialization,
    /root/reference/src/core_partials.c:366-478, re-imagined for TPU);
  * inner CLVs never touch HBM: a host-side linear-scan register
    allocator (pack_fused_schedule) maps nodes to a small set of VMEM
    slots (max-live is O(tree depth) for postorder, typically < 20), and
    the in-kernel fori_loop over the operation table reads/writes slots;
  * only the root edge's two CLVs + scalers are written out — the edge
    log-likelihood, sumtable and derivatives stay in XLA.

HBM traffic per traversal falls from ops*3*R*s*4 B/site to tips*4 B/site
(+ the two root rows), making the kernel VPU/MXU-bound. The state
contraction is an unrolled FMA over states for small alphabets and an MXU
`jnp.dot` per rate for >= 16 states.

Numerical semantics are IDENTICAL to the XLA scan path (and the
reference): per-site underflow scaling with threshold/factor, scalers
propagated as integer counts (kept in f32 rows in VMEM, exact to 2^24),
tips contribute scaler 0. Only eligible when every inner op has a scaler
buffer (the standard full-traversal layout) and every tip was set from
state codes.

fp32 only (the TPU fast path; fp64 validation stays on the XLA path).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
VMEM_BUDGET = 10 * 1024 * 1024     # conservative per-core VMEM budget
SMEM_BUDGET = 256 * 1024           # conservative scalar-prefetch budget


def pack_fused_schedule(operations, n_tips: int, root_pair,
                        clv_tip_rows=None):
    """Linear-scan register allocation of the postorder onto VMEM slots.

    Returns (table [n_ops+1, 8] int32, n_slots). Table rows per op:
      [parent_slot, l_is_tip, l_idx, m1, r_is_tip, r_idx, m2, has_scaler]
    where l_idx/r_idx is a tip row (is_tip=1), a row into the raw
    tip-CLV matrix (is_tip=2, pll_set_tip_clv tips), or a slot id
    (is_tip=0). The extra last row holds the root edge:
      [p_is_tip, p_idx, c_is_tip, c_idx, 0, 0, 0, 0].

    `clv_tip_rows`, if given, maps tip clv_index -> row in the kernel's
    tip-CLV value matrix (or -1 for ordinary state-code tips) — the
    reference treats set_tip_clv tips as ordinary CLVs in every kernel
    (reference: /root/reference/src/pll.c:959-1024).

    Returns None when the list is not a plain full/partial postorder the
    kernel supports (an op consumes a CLV that was never produced, or an
    inner op lacks a scaler buffer).
    """
    root_p, root_c = root_pair

    def tip_entry(c):
        if clv_tip_rows is not None and clv_tip_rows[c] >= 0:
            return 2, int(clv_tip_rows[c])
        return 1, c

    last_use = {}
    for k, op in enumerate(operations):
        for c in (op.child1_clv_index, op.child2_clv_index):
            if c >= n_tips:
                last_use[c] = k
    n_ops = len(operations)
    for rn in (root_p, root_c):
        if rn >= n_tips:
            last_use[rn] = n_ops          # alive until the end

    free: list = []
    slot_of: dict = {}
    n_slots = 0
    table = np.zeros((n_ops + 1, 8), dtype=np.int32)
    for k, op in enumerate(operations):
        if op.parent_scaler_index < 0:
            return None, 0                 # kernel assumes scaler per op
        row = [0] * 8
        for pos, (c, m) in enumerate(
                ((op.child1_clv_index, op.child1_matrix_index),
                 (op.child2_clv_index, op.child2_matrix_index))):
            if c < n_tips:
                row[1 + 3 * pos], row[2 + 3 * pos] = tip_entry(c)
            else:
                if c not in slot_of:
                    return None, 0         # consumed before produced
                row[1 + 3 * pos] = 0
                row[2 + 3 * pos] = slot_of[c]
            row[3 + 3 * pos] = m
        # free dying children BEFORE allocating the parent: the kernel
        # fully reads both children into registers before writing, so the
        # parent may safely reuse a dead child's slot
        for c in (op.child1_clv_index, op.child2_clv_index):
            if c >= n_tips and last_use.get(c) == k:
                free.append(slot_of.pop(c))
        if free:
            ps = free.pop()
        else:
            ps = n_slots
            n_slots += 1
        slot_of[op.parent_clv_index] = ps
        row[0] = ps
        row[7] = 1
        table[k] = row

    def root_entry(c):
        if c < n_tips:
            return tip_entry(c)
        if c not in slot_of:
            return None
        return 0, slot_of[c]

    pe, ce = root_entry(root_p), root_entry(root_c)
    if pe is None or ce is None:
        return None, 0
    table[n_ops] = [pe[0], pe[1], ce[0], ce[1], 0, 0, 0, 0]
    return table, max(n_slots, 1)


def fused_candidate_from_tree(vroot, n_tips: int, n_matrices: int,
                              clv_tip_rows=None):
    """One-pass iterative postorder walk producing the fused kernel's
    (table, branch vector, root_info) for the CURRENT topology — the
    exact output of pack_fused_schedule(create_operations(traverse(
    vroot))) without materializing Operation objects. This is the
    per-candidate host cost of batched SPR/NNI scoring (search.py); at
    1000 taxa the object-based pipeline spends ~6 ms/candidate, ~95% of
    a warm round.

    Returns (table [n_ops+1, 8] int32, blens [n_matrices], root_info,
    n_slots) or (None, None, None, 0) when the kernel cannot run this
    topology (an inner op without a scaler row, or a non-binary node)."""
    vback = vroot.back
    blens = np.zeros(n_matrices)
    rows = []
    free: list = []
    slot_of: dict = {}
    n_slots = 0

    def tip_entry(c):
        if clv_tip_rows is not None and clv_tip_rows[c] >= 0:
            return 2, int(clv_tip_rows[c])
        return 1, c

    # emulate trees.utree.traverse: rec(vroot.back) then rec(vroot),
    # children in ring order before the node (postorder)
    stack = [(vroot, False), (vback, False)]
    while stack:
        node, done = stack.pop()
        tip = node.is_tip()
        if not done and not tip:
            stack.append((node, True))
            if node.next.next.next is not node:
                return None, None, None, 0         # non-binary
            stack.append((node.next.next.back, False))
            stack.append((node.next.back, False))
            continue
        # visit: record the branch toward the traversal root (the first
        # subtree's top — vroot.back — would duplicate vroot's entry)
        if node is not vback:
            blens[node.pmatrix_index] = node.length
        if tip:
            continue
        if node.scaler_index < 0:
            return None, None, None, 0             # kernel needs a scaler
        c1, c2 = node.next.back, node.next.next.back
        row = [0] * 8
        freed = []
        for pos, c in ((0, c1), (1, c2)):
            ci = c.clv_index
            if ci < n_tips:
                row[1 + 3 * pos], row[2 + 3 * pos] = tip_entry(ci)
            else:
                # inner CLVs are consumed exactly once in a tree
                # postorder; free the slot for the parent to reuse
                s = slot_of.pop(ci, None)
                if s is None:
                    return None, None, None, 0     # not a valid postorder
                row[1 + 3 * pos] = 0
                row[2 + 3 * pos] = s
                freed.append(s)
            row[3 + 3 * pos] = c.pmatrix_index
        free.extend(freed)
        if free:
            ps = free.pop()
        else:
            ps = n_slots
            n_slots += 1
        slot_of[node.clv_index] = ps
        row[0] = ps
        row[7] = 1
        rows.append(row)

    table = np.zeros((len(rows) + 1, 8), dtype=np.int32)
    table[:len(rows)] = rows

    def root_entry(c):
        if c < n_tips:
            return tip_entry(c)
        return (0, slot_of[c]) if c in slot_of else None

    pe, ce = root_entry(vroot.clv_index), root_entry(vback.clv_index)
    if pe is None or ce is None:
        return None, None, None, 0
    table[len(rows)] = [pe[0], pe[1], ce[0], ce[1], 0, 0, 0, 0]
    root_info = (vroot.clv_index, vroot.scaler_index, vback.clv_index,
                 vback.scaler_index, vroot.pmatrix_index)
    return table, blens, root_info, max(n_slots, 1)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def split_bf16(x):
    """Truncation-split an f32 array into a bf16 (hi, lo) pair with
    hi + lo == x to ~2^-17 relative — the operand format of the fused
    kernel's 'split' MXU mode.

    Implemented by BIT-MASKING the low 16 mantissa bits, NOT by the
    arithmetic round-trip hi = bf16(x); lo = bf16(x - f32(hi)): XLA's
    algebraic simplifier folds convert(convert(x, bf16), f32) -> x when
    the split is fused into a larger program (e.g. downstream of the
    P-matrix computation inside _fused_loglikelihood), which rewrites lo
    to bf16(x - x) == 0 and silently degrades the whole mode to plain
    bf16 (measured: 3.6e-2 CLV error instead of 2.5e-6 at depth 30).
    The masked hi has exactly the bf16 mantissa, so its conversion is
    exact, and the residual subtraction cannot be folded. Rounding is
    to-nearest (half-up via the +0x8000 carry, matching hardware bf16
    conversion up to half-way cases) — plain truncation would bias every
    hi low by up to 2^-9 relative and the bias compounds down the tree."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi32 = jax.lax.bitcast_convert_type(
        (bits + jnp.uint32(0x8000)) & jnp.uint32(0xFFFF0000), jnp.float32)
    return hi32.astype(jnp.bfloat16), (x - hi32).astype(jnp.bfloat16)


def fused_tile(sites: int, n_tips: int, n_slots: int, rates: int,
               states: int, n_ctips: int = 0) -> int:
    """Largest lane-aligned site tile that keeps all buffers in VMEM."""
    import os
    stride = _round_up(rates * states, 8)
    # bytes per site column: tips block (x2 pipeline), raw tip-CLV rows
    # (8-aligned stride, x2 pipeline), slots, scalers, outs
    per_col = (n_tips * 4 * 2 + n_ctips * _round_up(states, 8) * 4 * 2
               + n_slots * stride * 4 + n_slots * 8 * 4
               + (2 * stride + 2) * 4 * 2)
    t = (VMEM_BUDGET // per_col) // LANE * LANE
    forced = int(os.environ.get("PLL_PALLAS_TILE", "0"))
    if forced and sites % forced == 0:
        return forced
    # measured flat 1.45-1.50 ms across 1024..8192 tiles at the flagship
    # size: cap at 2048 for lower VMEM pressure at equal speed
    t = max(LANE, min(t, 2048))
    while t > LANE and sites % t:
        t -= LANE
    return t if sites % t == 0 else sites


def plane_tile(sites: int, n_tips: int, n_slots: int, rates: int,
               states: int, n_ctips: int = 0, sc_rows: int = 1) -> int:
    """Lane count C per grid step for the plane-layout kernel (the site
    axis is viewed as [8, sites/8]; one tile covers 8*C sites)."""
    import os
    rs = rates * states
    # bytes per site column: tips (x2 pipeline), raw tip-CLV rows (x2
    # pipeline), slot planes, slot scaler planes, root outs + scaler
    # outs (x2 pipeline)
    per_col = (n_tips * 4 * 2 + n_ctips * states * 4 * 2
               + n_slots * rs * 4 + n_slots * sc_rows * 4
               + (2 * rs + 2 * sc_rows) * 4 * 2)
    cols = sites // 8
    c = (VMEM_BUDGET // (8 * per_col)) // LANE * LANE
    forced = int(os.environ.get("PLL_PALLAS_TILE", "0"))
    if forced and forced % 8 == 0 and cols % (forced // 8) == 0:
        return forced // 8
    c = max(LANE, min(c, 2048))
    while c > LANE and cols % c:
        c -= LANE
    return c if cols % c == 0 else cols


def _fused_kernel_planes(tbl_ref,      # [n_ops+1, 8] int32 (SMEM)
                         pmf_ref,      # [E*R*s*s] f32 (SMEM)
                         tips_ref,     # [n_tips, 8, C] int32
                         *refs,        # ([ctips], outp, outc, scp, scc,
                                       #  clvbuf, scalbuf)
                         rates: int, states: int, threshold: float,
                         factor: float, n_ops: int,
                         rate_scalers: bool = False,
                         has_ctips: bool = False):
    """Plane-layout variant for small alphabets: the site tile is viewed
    as an [8, C] vreg plane, so every (rate, state) row is a FULL (8,128)
    vector register and the state contraction is rates*states*states
    scalar-broadcast FMAs on full planes — ~4x fewer (and fully packed)
    vector ops than the row-layout kernel's [states, T] slices, which
    waste 1 - states/8 of every register for DNA. The P-matrix entries
    live in SMEM (scalar prefetch) — every FMA coefficient is a scalar
    splat, and VMEM scalar reads cost ~20% of the kernel.

    Scaler values are [sc_rows, 8, C] planes: one plane per slot in
    per-site mode, `rates` planes in per-rate mode
    (PLL_ATTRIB_RATE_SCALERS, reference core_partials.c:760-771) where
    each rate block under- flows and rescales independently. `has_ctips`
    adds a raw tip-CLV input ([n_ctips*s, 8, C] f32, is_tip == 2 rows):
    set_tip_clv values replicated over rates, exactly the reference's
    ordinary-CLV treatment of such tips (pll.c:959-1024)."""
    if has_ctips:
        (ctips_ref, outp_ref, outc_ref, scp_ref, scc_ref,
         clvbuf, scalbuf) = refs
    else:
        outp_ref, outc_ref, scp_ref, scc_ref, clvbuf, scalbuf = refs
        ctips_ref = None
    rs = rates * states
    sc_rows = rates if rate_scalers else 1
    tile8 = tips_ref.shape[-2:]                        # (8, C)
    f32 = jnp.float32
    thresh = jnp.asarray(float(threshold), f32)
    fact = jnp.asarray(float(factor), f32)

    def zero_sc():
        return jnp.zeros((sc_rows,) + tile8, f32)

    def decode_tip(row):
        code = tips_ref[pl.ds(row, 1)][0]              # [8, C] int32
        st = jnp.stack([((code >> j) & 1).astype(f32)
                        for j in range(states)])       # [s, 8, C]
        return jnp.concatenate([st] * rates, axis=0)   # [rs, 8, C]

    def load_slot(idx):
        return (clvbuf[pl.ds(idx * rs, rs)],
                scalbuf[pl.ds(idx * sc_rows, sc_rows)])

    def load_child(is_tip, idx):
        if ctips_ref is None:
            return jax.lax.cond(
                is_tip == 1,
                lambda: (decode_tip(idx), zero_sc()),
                lambda: load_slot(idx))
        return jax.lax.cond(
            is_tip == 0,
            lambda: load_slot(idx),
            lambda: jax.lax.cond(
                is_tip == 1,
                lambda: (decode_tip(idx), zero_sc()),
                lambda: (jnp.concatenate(
                    [ctips_ref[pl.ds(idx * states, states)]] * rates,
                    axis=0), zero_sc())))

    def matvecs(mat, child):
        """[rs, 8, C]: per (rate, state-row), sum_j P[r,i,j]*child[r,j]
        — each term one scalar-splat FMA over a full plane; coefficients
        are SMEM scalar loads at mat*R*s*s + ..."""
        base = mat * (rs * states)
        rows = []
        for r in range(rates):
            for i in range(states):
                off = base + (r * states + i) * states
                acc = pmf_ref[off] * child[r * states]
                for j in range(1, states):
                    acc = acc + pmf_ref[off + j] * child[r * states + j]
                rows.append(acc)
        return jnp.stack(rows)

    def body(i, _):
        pslot = tbl_ref[i, 0]
        left, lsc = load_child(tbl_ref[i, 1], tbl_ref[i, 2])
        right, rsc = load_child(tbl_ref[i, 4], tbl_ref[i, 5])
        x = matvecs(tbl_ref[i, 3], left) * matvecs(tbl_ref[i, 6], right)
        has = tbl_ref[i, 7] > 0
        if rate_scalers:
            # each rate block scales independently (the robustness mode
            # for deep trees: one underflowing rate cannot force the
            # whole site down)
            segs, counts = [], []
            for r in range(rates):
                seg = x[r * states:(r + 1) * states]
                scale = (jnp.max(seg, axis=0) < thresh) & has  # [8, C]
                segs.append(seg * jnp.where(scale, fact, f32(1.0))[None])
                counts.append(scale.astype(f32))
            x = jnp.concatenate(segs, axis=0)
            newsc = lsc + rsc + jnp.stack(counts)      # [R, 8, C]
        else:
            # max(x) < t form (see _fused_kernel); x is non-negative
            small = jnp.max(x, axis=0) < thresh        # [8, C]
            scale = small & has
            x = x * jnp.where(scale, fact, f32(1.0))[None]
            newsc = lsc + rsc + scale.astype(f32)[None]  # [1, 8, C]
        clvbuf[pl.ds(pslot * rs, rs)] = x
        scalbuf[pl.ds(pslot * sc_rows, sc_rows)] = newsc
        return 0

    jax.lax.fori_loop(0, n_ops, body, 0)

    outp, psc = load_child(tbl_ref[n_ops, 0], tbl_ref[n_ops, 1])
    outc, csc = load_child(tbl_ref[n_ops, 2], tbl_ref[n_ops, 3])
    outp_ref[...] = outp
    outc_ref[...] = outc
    scp_ref[...] = psc.astype(jnp.int32)
    scc_ref[...] = csc.astype(jnp.int32)


def _fused_kernel(tbl_ref,             # [n_ops+1, 8] int32 (SMEM)
                  tips_ref,            # [n_tips, T] int32
                  *refs,               # (pm | pmh, pml), [ctips],
                                       #  outp, outc, scp, scc,
                                       #  clvbuf, scalbuf
                  rates: int, states: int, stride: int,
                  threshold: float, factor: float, n_ops: int,
                  mxu: str, rate_scalers: bool = False,
                  has_ctips: bool = False):
    """Row-layout fused traversal. Scaler values are [8, T] blocks per
    slot: per-site mode broadcasts one count into all 8 sublane rows;
    per-rate mode (PLL_ATTRIB_RATE_SCALERS) keeps rate r's count in row
    r (requires rates <= 8, checked by the caller). `has_ctips` adds a
    raw tip-CLV input [n_ctips*s, T] f32 for is_tip == 2 table rows.

    `mxu` picks the state-contraction engine (states >= 16; measured on
    v5e, tools/mxu_probe.py):
      'fma'     — unrolled VPU scalar-broadcast FMAs, exact fp32 (small
                  alphabets; the P-matrix ref is a single fp32 array);
      'split'   — DEFAULT for proteins: the P-matrix is pre-split into a
                  bf16 (hi, lo) pair host-side and each inner-child
                  matvec runs THREE one-pass MXU dots (hi@ch + hi@cl +
                  lo@ch, fp32 accumulate) on the [rs, rs] block-diagonal
                  — ~2.5e-6 relative error, 475x tighter than a raw bf16
                  pass. Tip children exploit rate-independence: the four
                  [s, s] rate blocks stack VERTICALLY into one [rs, s]
                  matrix and the 0/1 indicator is EXACT in bf16, so a
                  tip matvec is TWO [rs, s] passes (pass cost on the
                  systolic array is width-independent: [80,20] streams
                  at the same G col/s as [80,80]);
      'bf16'    — one pass per matvec (hi only): ~1.2e-3 relative, the
                  throughput mode for exploratory search;
      'highest' — fp32 dots with precision=HIGHEST (~6 passes), full
                  fp32 for final evaluations."""
    split = mxu == "split"
    if mxu in ("split", "bf16"):
        pmh_ref = refs[0]
        pml_ref = refs[1] if split else None
        refs = refs[2 if split else 1:]
        pm_ref = None
    else:
        pm_ref = refs[0]
        refs = refs[1:]
        pmh_ref = pml_ref = None
    if has_ctips:
        (ctips_ref, outp_ref, outc_ref, scp_ref, scc_ref,
         clvbuf, scalbuf) = refs
    else:
        outp_ref, outc_ref, scp_ref, scc_ref, clvbuf, scalbuf = refs
        ctips_ref = None
    rs = rates * states
    tile = tips_ref.shape[-1]
    f32, bf16 = jnp.float32, jnp.bfloat16
    hp = jax.lax.Precision.HIGHEST if mxu == "highest" else None
    # static threshold/factor may arrive as np.float64 scalars (x64 hosts);
    # coerce so they cannot promote the whole kernel off fp32
    thresh = jnp.asarray(float(threshold), f32)
    fact = jnp.asarray(float(factor), f32)

    def pad_stride(full):
        if stride > rs:
            full = jnp.concatenate(
                [full, jnp.zeros((stride - rs, tile), f32)], axis=0)
        return full

    split32 = split_bf16          # bit-masked: fold-proof (see split_bf16)

    def block_diag(pm_e):
        """[1, R, s, s] -> [rs, rs] block-diagonal (operand dtype)."""
        zero = jnp.zeros((states, states), pm_e.dtype)
        blocks = []
        for r in range(rates):
            row = [pm_e[0, r] if q == r else zero for q in range(rates)]
            blocks.append(jnp.concatenate(row, axis=1))
        return jnp.concatenate(blocks, axis=0)

    def rate_stack(pm_e):
        """[1, R, s, s] -> [rs, s]: the rate blocks stacked vertically —
        one K=s pass applies EVERY rate's matrix to a rate-independent
        (tip) child."""
        return jnp.concatenate([pm_e[0, r] for r in range(rates)], axis=0)

    def decode_tip_states(row, dtype):
        """[s, T] 0/1 indicator (no rate replication) — exact in bf16.
        One broadcast bit-test instead of `states` separate [1, T]
        shift/and ops (those run on 1/8-packed single-sublane vregs —
        measured ~0.2 us/op of pure packing waste at 20 states)."""
        code = tips_ref[pl.ds(row, 1), :]                     # [1, T] int32
        masks = jnp.left_shift(
            jnp.int32(1),
            jax.lax.broadcasted_iota(jnp.int32, (states, 1), 0))
        return ((code & masks) > 0).astype(dtype)             # [s, T]

    def decode_tip(row):
        ind = decode_tip_states(row, f32)
        return pad_stride(jnp.concatenate([ind] * rates, axis=0))

    def load_slot(idx):
        return (clvbuf[pl.ds(idx * stride, stride), :],
                scalbuf[pl.ds(idx * 8, 8), :])

    # raw tip-CLV rows are stored at an 8-aligned stride: Mosaic requires
    # sublane-dimension dynamic-slice starts to be provable multiples of 8
    stride_c = _round_up(states, 8)

    def load_ctip_rows(idx):
        return ctips_ref[pl.ds(idx * stride_c, stride_c), :][:states]

    def load_ctip(idx):
        return pad_stride(jnp.concatenate([load_ctip_rows(idx)] * rates,
                                          axis=0))

    def load_child(is_tip, idx):
        """Raw [stride, T] CLV + scaler — the ROOT-row read path."""
        if ctips_ref is None:
            return jax.lax.cond(
                is_tip == 1,
                lambda: (decode_tip(idx), jnp.zeros((8, tile), f32)),
                lambda: load_slot(idx))
        return jax.lax.cond(
            is_tip == 0,
            lambda: load_slot(idx),
            lambda: jax.lax.cond(
                is_tip == 1,
                lambda: (decode_tip(idx), jnp.zeros((8, tile), f32)),
                lambda: (load_ctip(idx), jnp.zeros((8, tile), f32))))

    def mv_inner_fma(pm_e, child):
        rows = []
        for r in range(rates):
            crow = child[r * states:(r + 1) * states]          # [s, T]
            p_r = pm_e[0, r]                                   # [s, s]
            acc = jnp.zeros((states, tile), f32)
            for j in range(states):
                acc = acc + p_r[:, j][:, None] * crow[j][None, :]
            rows.append(acc)
        return jnp.concatenate(rows, axis=0)                   # [rs, T]

    def mv_inner(mat, child):
        """P(mat) applied per rate to an inner-child CLV [rs, T] f32."""
        if mxu == "fma":
            return mv_inner_fma(pm_ref[pl.ds(mat, 1)], child)
        if mxu == "highest":
            bd = block_diag(pm_ref[pl.ds(mat, 1)])
            return jnp.dot(bd, child, preferred_element_type=f32,
                           precision=hp)
        bdh = block_diag(pmh_ref[pl.ds(mat, 1)])
        if not split:
            return jnp.dot(bdh, child.astype(bf16),
                           preferred_element_type=f32)
        # ONE dot with the three precision terms K-concatenated
        # (hi@ch + hi@cl + lo@ch). Summing three separate dots loses the
        # low terms on the compiled path (the adds distribute into the
        # operands, absorbing lo into hi at bf16) — measured 5e-2 vs
        # interpret; the K-stacked single contraction is immune AND one
        # MXU pass cheaper (ceil(3rs/128) = 2 passes at 20 states).
        ch, cl = split32(child)
        bdl = block_diag(pml_ref[pl.ds(mat, 1)])
        w = jnp.concatenate([bdh, bdh, bdl], axis=1)       # [rs, 3rs]
        c3 = jnp.concatenate([ch, cl, ch], axis=0)         # [3rs, T]
        return jnp.dot(w, c3, preferred_element_type=f32)

    def mv_rate_indep(mat, rows_f32=None, tip_row=None):
        """Matvec for a RATE-INDEPENDENT child ([s, T]): tips decoded
        from bitmasks (exact 0/1) or raw set_tip_clv rows. One [rs, s]
        stacked pass per precision term instead of a square pass per
        term."""
        if mxu == "fma":
            child = (decode_tip_states(tip_row, f32) if rows_f32 is None
                     else rows_f32)
            rep = jnp.concatenate([child] * rates, axis=0)
            return mv_inner_fma(pm_ref[pl.ds(mat, 1)], rep)
        if mxu == "highest":
            st = rate_stack(pm_ref[pl.ds(mat, 1)])
            child = (decode_tip_states(tip_row, f32) if rows_f32 is None
                     else rows_f32)
            return jnp.dot(st, child, preferred_element_type=f32,
                           precision=hp)
        sth = rate_stack(pmh_ref[pl.ds(mat, 1)])
        if rows_f32 is None:                      # state-code tip: EXACT
            tip = decode_tip_states(tip_row, bf16)
            if not split:
                return jnp.dot(sth, tip, preferred_element_type=f32)
            # single K-stacked dot (see mv_inner): hi@tip + lo@tip in
            # ONE [rs, 2s] pass — the indicator is exact in bf16, so
            # this is the 18-bit P-matrix applied with no further error
            stl = rate_stack(pml_ref[pl.ds(mat, 1)])
            w = jnp.concatenate([sth, stl], axis=1)        # [rs, 2s]
            t2 = jnp.concatenate([tip, tip], axis=0)       # [2s, T]
            return jnp.dot(w, t2, preferred_element_type=f32)
        if not split:
            return jnp.dot(sth, rows_f32.astype(bf16),
                           preferred_element_type=f32)
        ch, cl = split32(rows_f32)
        stl = rate_stack(pml_ref[pl.ds(mat, 1)])
        w = jnp.concatenate([sth, sth, stl], axis=1)       # [rs, 3s]
        c3 = jnp.concatenate([ch, cl, ch], axis=0)         # [3s, T]
        return jnp.dot(w, c3, preferred_element_type=f32)

    def gather_child(is_tip, idx):
        """Branch-free child fetch: slot value, decoded tip indicator
        (rate-replicated) or raw tip-CLV rows, merged by SELECTS with
        every source touched unconditionally. A lax.cond version costs
        ~1.4 us/op at 20 states (measured): the branches flush the
        pipeline and stop Mosaic from overlapping consecutive ops, which
        dwarfs the wasted slot read + tip decode."""
        x, sc = load_slot(jnp.where(is_tip == 0, idx, 0))
        tip = decode_tip(jnp.where(is_tip == 1, idx, 0))
        xx = jnp.where(is_tip == 1, tip, x)
        if ctips_ref is not None:
            ct = load_ctip(jnp.where(is_tip == 2, idx, 0))
            xx = jnp.where(is_tip == 2, ct, xx)
        sc = jnp.where(is_tip == 0, sc, jnp.zeros((8, tile), f32))
        return xx, sc

    def matvec_child(is_tip, idx, mat):
        """(P(mat) @ child(is_tip, idx)) [rs, T] f32 + child scaler."""
        if mxu != "fma":
            # unified MXU path: every child goes through the same
            # inner-child contraction (tips ride it exactly: the 0/1
            # indicator is exact in bf16 and its lo term is zero)
            x, sc = gather_child(is_tip, idx)
            return mv_inner(mat, x[:rs]), sc

        zero_sc = jnp.zeros((8, tile), f32)

        def from_slot():
            x, sc = load_slot(idx)
            return mv_inner(mat, x[:rs]), sc

        def from_tip():
            return mv_rate_indep(mat, tip_row=idx), zero_sc

        def from_ctip():
            return mv_rate_indep(mat, rows_f32=load_ctip_rows(idx)), \
                zero_sc

        if ctips_ref is None:
            return jax.lax.cond(is_tip == 1, from_tip, from_slot)
        return jax.lax.cond(
            is_tip == 0, from_slot,
            lambda: jax.lax.cond(is_tip == 1, from_tip, from_ctip))

    def body(i, _):
        pslot = tbl_ref[i, 0]
        mvl, lsc = matvec_child(tbl_ref[i, 1], tbl_ref[i, 2], tbl_ref[i, 3])
        mvr, rsc = matvec_child(tbl_ref[i, 4], tbl_ref[i, 5], tbl_ref[i, 6])
        x = mvl * mvr                                           # [rs, T]
        has = tbl_ref[i, 7] > 0
        if rate_scalers:
            # rate blocks scale independently; row r of the [8, T] scaler
            # block carries rate r's count, rows rates..7 stay zero
            segs, counts = [], []
            for r in range(rates):
                seg = x[r * states:(r + 1) * states]
                scale = (jnp.max(seg, axis=0) < thresh) & has   # [T]
                segs.append(seg * jnp.where(scale, fact, f32(1.0))[None])
                counts.append(scale.astype(f32)[None, :])
            if rates < 8:
                counts.append(jnp.zeros((8 - rates, tile), f32))
            x = jnp.concatenate(segs, axis=0)
            newsc = lsc + rsc + jnp.concatenate(counts, axis=0)  # [8, T]
        else:
            # all(x < t) as an explicit f32 max-reduction: under x64 hosts
            # Mosaic canonicalizes the all(cmp) form into an f64 min-reduce
            # it cannot compile; max(x) < t is identical (x is non-negative)
            small = jnp.max(x, axis=0) < thresh                 # [T]
            scale = small & has
            # broadcast-multiply by a [1, T] factor: one full-size op
            # instead of two (x * fact AND the where both ran over the
            # whole [rs, T] block before)
            x = x * jnp.where(scale, fact, f32(1.0))[None, :]
            newsc = lsc + rsc + scale.astype(f32)[None, :]      # [8, T]
        if stride > rs:
            x = jnp.concatenate(
                [x, jnp.zeros((stride - rs, tile), f32)], axis=0)
        clvbuf[pl.ds(pslot * stride, stride), :] = x
        scalbuf[pl.ds(pslot * 8, 8), :] = newsc
        return 0

    jax.lax.fori_loop(0, n_ops, body, 0)

    outp, psc = load_child(tbl_ref[n_ops, 0], tbl_ref[n_ops, 1])
    outc, csc = load_child(tbl_ref[n_ops, 2], tbl_ref[n_ops, 3])
    outp_ref[...] = outp
    outc_ref[...] = outc
    if rate_scalers:
        scp_ref[...] = psc.astype(jnp.int32)                   # [8, T]
        scc_ref[...] = csc.astype(jnp.int32)
    else:
        scp_ref[0, 0] = psc[0].astype(jnp.int32)
        scc_ref[0, 0] = csc[0].astype(jnp.int32)


@partial(jax.jit, static_argnames=('rates', 'states', 'n_slots',
                                   'threshold', 'factor', 'interpret',
                                   'planes', 'rate_scalers', 'mxu'))
def fused_traversal(tip_codes: jnp.ndarray,   # [n_tips, S] int32 bitmasks
                    pmatrix: jnp.ndarray,     # [E, R, s, s] f32
                    table: jnp.ndarray,       # [n_ops+1, 8] int32
                    rates: int, states: int, n_slots: int,
                    threshold: float, factor: float,
                    interpret: bool = False, planes=None,
                    rate_scalers: bool = False,
                    tip_clvs=None,            # [n_ctips, s, S] f32
                    mxu: str = 'split'):
    """One full postorder; returns (clv_p, clv_c, scaler_p, scaler_c) for
    the root edge: CLVs [R, s, S] f32; scalers [S] int32 (per-site mode)
    or [R, S] int32 (rate_scalers mode, one count per rate category).
    `tip_clvs` carries raw set_tip_clv probability rows (is_tip == 2 in
    the table), rate-independent by reference semantics (pll.c:1063)."""
    n_tips, sites = tip_codes.shape
    n_ops = table.shape[0] - 1
    e, r, s = pmatrix.shape[0], rates, states
    rs = rates * states
    sc_rows = rates if rate_scalers else 1
    n_ctips = 0 if tip_clvs is None else tip_clvs.shape[0]
    has_ctips = n_ctips > 0
    if planes is None:
        # the plane kernel holds the FLAT P-matrix (plus the op table) in
        # SMEM via scalar prefetch; SMEM is small and overflow fails the
        # kernel compile with no fallback — large trees (~0.5 MB of
        # coefficients at ~1000 DNA taxa) take the row layout, which keeps
        # the P-matrix in VMEM
        smem_bytes = (e * rs * s + table.shape[0] * 8) * 4
        planes = (states < PLANE_STATES_MAX
                  and sites % kernel_grain(states) == 0
                  and smem_bytes <= SMEM_BUDGET)
    if rate_scalers and rates > 8 and not planes:
        # the row layout keeps rate r's count in sublane row r of one
        # [8, tile] block — a structural 8-category bound; the plane
        # layout carries one [8, C] plane per rate (any count). Callers
        # (engine.py eligibility) route >8-category per-rate configs
        # here only when per_rate_planes_ok says the plane kernel fits.
        raise ValueError(
            "fused-kernel per-rate scalers above 8 rate categories need "
            "the plane layout (alphabet < 16 states, lane-grain sites, "
            "SMEM-resident P-matrices)")
    if planes:
        # plane layout: site axis viewed as [8, sites/8] so every
        # (rate, state) row is a full vreg plane (the reshape is a pure
        # view — C-order [8, S/8] flattens back to site order)
        cols = sites // 8
        c = plane_tile(sites, n_tips, n_slots, rates, states,
                       n_ctips=n_ctips, sc_rows=sc_rows)
        in_specs = [
            pl.BlockSpec((n_tips, 8, c), lambda j, tbl, pmf: (0, 0, j)),
        ]
        inputs = [tip_codes.reshape(n_tips, 8, cols)]
        if has_ctips:
            in_specs.append(pl.BlockSpec((n_ctips * states, 8, c),
                                         lambda j, tbl, pmf: (0, 0, j)))
            inputs.append(tip_clvs.astype(jnp.float32)
                          .reshape(n_ctips * states, 8, cols))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,        # op table + flat P-matrix (SMEM)
            grid=(cols // c,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((rs, 8, c), lambda j, tbl, pmf: (0, 0, j)),
                pl.BlockSpec((rs, 8, c), lambda j, tbl, pmf: (0, 0, j)),
                pl.BlockSpec((sc_rows, 8, c),
                             lambda j, tbl, pmf: (0, 0, j)),
                pl.BlockSpec((sc_rows, 8, c),
                             lambda j, tbl, pmf: (0, 0, j)),
            ],
            scratch_shapes=[
                pltpu.VMEM((n_slots * rs, 8, c), jnp.float32),
                pltpu.VMEM((n_slots * sc_rows, 8, c), jnp.float32),
            ],
        )
        kernel = partial(_fused_kernel_planes, rates=rates, states=states,
                         threshold=threshold, factor=factor, n_ops=n_ops,
                         rate_scalers=rate_scalers, has_ctips=has_ctips)
        outp, outc, scp, scc = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((rs, 8, cols), jnp.float32),
                jax.ShapeDtypeStruct((rs, 8, cols), jnp.float32),
                jax.ShapeDtypeStruct((sc_rows, 8, cols), jnp.int32),
                jax.ShapeDtypeStruct((sc_rows, 8, cols), jnp.int32),
            ],
            interpret=interpret,
        )(table, pmatrix.astype(jnp.float32).reshape(-1), *inputs)
        clv_p = outp.reshape(rates, states, sites)
        clv_c = outc.reshape(rates, states, sites)
        if rate_scalers:
            return (clv_p, clv_c, scp.reshape(rates, sites),
                    scc.reshape(rates, sites))
        return clv_p, clv_c, scp.reshape(sites), scc.reshape(sites)
    stride = _round_up(rates * states, 8)
    tile = fused_tile(sites, n_tips, n_slots, rates, states,
                      n_ctips=n_ctips)

    # state-contraction engine for the row layout: small alphabets keep
    # the exact-fp32 VPU FMA path; 16+ states use the MXU with the mode
    # requested (split hi/lo bf16 by default — see _fused_kernel)
    mode = mxu if states >= 16 else 'fma'
    pm_spec = pl.BlockSpec((e, r, s, s), lambda j, tbl: (0, 0, 0, 0))
    in_specs = [pl.BlockSpec((n_tips, tile), lambda j, tbl: (0, j))]
    inputs = [tip_codes]
    pm32 = pmatrix.astype(jnp.float32)
    if mode in ('split', 'bf16'):
        pm_hi, pm_lo = split_bf16(pm32)
        in_specs.append(pm_spec)
        inputs.append(pm_hi)
        if mode == 'split':
            in_specs.append(pm_spec)
            inputs.append(pm_lo)
    else:
        in_specs.append(pm_spec)
        inputs.append(pm32)
    if has_ctips:
        # 8-aligned row stride per tip (Mosaic sublane dynamic-slice rule)
        stride_c = _round_up(states, 8)
        ct = tip_clvs.astype(jnp.float32)
        if stride_c > states:
            ct = jnp.concatenate(
                [ct, jnp.zeros((n_ctips, stride_c - states, sites),
                               jnp.float32)], axis=1)
        in_specs.append(pl.BlockSpec((n_ctips * stride_c, tile),
                                     lambda j, tbl: (0, j)))
        inputs.append(ct.reshape(n_ctips * stride_c, sites))
    if rate_scalers:
        sc_spec = pl.BlockSpec((8, tile), lambda j, tbl: (0, j))
        sc_shape = jax.ShapeDtypeStruct((8, sites), jnp.int32)
    else:
        sc_spec = pl.BlockSpec((1, 1, tile), lambda j, tbl: (0, 0, j))
        sc_shape = jax.ShapeDtypeStruct((1, 1, sites), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(sites // tile,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((stride, tile), lambda j, tbl: (0, j)),
            pl.BlockSpec((stride, tile), lambda j, tbl: (0, j)),
            sc_spec,
            sc_spec,
        ],
        scratch_shapes=[
            pltpu.VMEM((n_slots * stride, tile), jnp.float32),
            pltpu.VMEM((n_slots * 8, tile), jnp.float32),
        ],
    )
    kernel = partial(_fused_kernel, rates=rates, states=states,
                     stride=stride, threshold=threshold, factor=factor,
                     n_ops=n_ops, mxu=mode,
                     rate_scalers=rate_scalers, has_ctips=has_ctips)
    outp, outc, scp, scc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((stride, sites), jnp.float32),
            jax.ShapeDtypeStruct((stride, sites), jnp.float32),
            sc_shape,
            sc_shape,
        ],
        interpret=interpret,
    )(table, *inputs)
    rs = rates * states
    clv_p = outp[:rs].reshape(rates, states, sites)
    clv_c = outc[:rs].reshape(rates, states, sites)
    if rate_scalers:
        return clv_p, clv_c, scp[:rates], scc[:rates]
    return clv_p, clv_c, scp[0, 0], scc[0, 0]


PLANE_STATES_MAX = 16       # plane layout for alphabets below this
PLANE_GRAIN = 1024          # sites per plane-layout tile grain (8 x 128)


def per_rate_planes_ok(states: int, rates: int, n_matrices: int,
                       n_ops: int) -> bool:
    """True when a >8-category per-rate-scaler config can run the fused
    PLANE-layout kernel (one scaler plane per rate — category-count-
    agnostic, matching /root/reference/src/core_partials.c:760-771). The
    row layout's [8, tile] scaler block is structurally capped at 8.
    Sites alignment is not checked: the engine pads tip codes to the
    plane grain internally."""
    smem = (n_matrices * rates * states * states + (n_ops + 1) * 8) * 4
    return states < PLANE_STATES_MAX and smem <= SMEM_BUDGET


def kernel_grain(states: int) -> int:
    """Site-width grain the kernel wants: PLANE_GRAIN enables the plane
    layout for small alphabets (site axis viewed as [8, S/8] with
    128-lane tiles), 128 is the lane minimum for the row layout. Owns
    the same predicate fused_traversal uses to pick the layout — pad to
    this grain and the fast layout is guaranteed."""
    return PLANE_GRAIN if states < PLANE_STATES_MAX else 128


def tip_clv_matrix(partition, pad_to: int = 0):
    """f32 raw tip-CLV value matrix [n_ctips, states, width] for tips set
    via set_tip_clv, rows ordered by ascending tip index (the same order
    pack_fused_schedule's clv_tip_rows encodes). None when no such tip
    exists. Values are rate-independent (pll_set_tip_clv replicates one
    state vector over every category, reference pll.c:1063); the kernel
    broadcasts over rates. Asc columns ride along (set_tip_clv fills
    them); pad columns carry 0."""
    p = partition
    idxs = np.flatnonzero(p._tips_clv_set)
    if len(idxs) == 0:
        return None
    mesh = getattr(p, "mesh", None)
    if mesh is not None:
        from ..parallel.sharding import is_multiprocess
        if is_multiprocess(mesh):
            from .. import constants as C
            # the tip rows live in the sharded global CLV array; fetching
            # them host-side would need the full site axis, which spans
            # devices other processes own
            raise C.PllError(
                C.ERROR_PARAM_INVALID,
                "raw tip-CLV tips (set_tip_clv) are not supported under "
                "multi-process site sharding: the tip rows span devices "
                "owned by other processes; encode those tips from state "
                "codes, or run single-process")
    width = max(p.sites_padded, pad_to)
    out = np.zeros((len(idxs), p.states, width), dtype=np.float32)
    for row, t in enumerate(idxs):
        if p.repeats is not None:
            cols = p._tip_cols[t]            # [states, sites + asc]
            out[row, :, :cols.shape[1]] = cols
        else:
            vals = np.asarray(p.clv[t, 0])   # [states, sites_padded]
            out[row, :, :vals.shape[1]] = vals
    return out


def tip_code_matrix(partition, pad_to: int = 0) -> np.ndarray:
    """int32 state-bitmask matrix [tips, max(sites_padded, pad_to)] for
    the kernel: real sites carry the decoded charmap masks, synthetic asc
    columns the single-state masks, padded columns 0 (-> zero CLVs; the
    engine slices kernel outputs back to sites_padded, so pads never
    reach the likelihood). Partitions are NOT required to be 128-aligned
    (real alignments never are) — the kernel pads internally."""
    p = partition
    width = max(p.sites_padded, pad_to)
    codes = np.zeros((p.tips, width), dtype=np.int32)
    codes[:, :p.sites] = p.tip_states[:, :p.sites].astype(np.int64) \
        .astype(np.int32)
    if p.asc_extra:
        for k in range(p.states):
            codes[:, p.sites + k] = 1 << k
    return codes
