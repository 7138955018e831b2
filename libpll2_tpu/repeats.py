"""Site repeats — compute each distinct subtree site pattern once.

TPU-native re-design of the fork's signature optimization (reference:
/root/reference/src/repeats.c). Semantics preserved:

  * a node's site **class** is the identity of the site pattern restricted
    to the node's subtree; tips class sites by their character
    (repeats.c:189-254), inner nodes by the pair (left class, right class)
    (repeats.c:334-347), in first-occurrence order;
  * repeats are disabled per node (class id count = 0, identity mapping)
    when a child has no classes or more than sites/2, or when the pair
    space would overflow (pll_default_enable_repeats, repeats.c:100-110),
    or when compression yields nothing (ids == sites, repeats.c:366-371);
  * parent scalers propagate through the class indirection
    (repeats.c:392-540).

Where the reference reallocates every CLV to its class count
(repeats.c:256-296) — shape-hostile for XLA — we keep dense
[node, rate, state, site] buffers and exploit a structural monotonicity:
a parent has at least as many classes as either child, so scheduling
operations in increasing **capacity buckets** (class count rounded up to a
lane-aligned bucket) preserves postorder dependencies. Each bucket executes
as one compiled scan whose kernels compute only `bucket_width` class
columns, gathered from child class columns — the compute saving the
reference gets from compressed CLVs, without dynamic shapes. Class
identification is a host-side first-occurrence dedup (numpy C speed, the
analog of the reference's O(1) lookup-buffer pass).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Sequence, Tuple

import numpy as np

from .partition import Operation

LOOKUP_BUFFER_SIZE = 2_000_000       # pll.h:128 PLL_REPEATS_LOOKUP_SIZE


def _first_occurrence_classes(codes: np.ndarray
                              ) -> Tuple[np.ndarray, np.ndarray, int]:
    """(site_id, id_site, ids) with classes numbered in first-occurrence
    order over the site axis (the reference's lookup-buffer fill order)."""
    uniq, first_idx, inv = np.unique(codes, return_index=True,
                                     return_inverse=True)
    order = np.argsort(first_idx, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(order.size)
    site_id = rank[inv.reshape(-1)].astype(np.int32)
    id_site = first_idx[order].astype(np.int32)
    return site_id, id_site, int(uniq.size)


@dataclass
class RepeatsTable:
    """Per-node class structure for one partition."""
    nodes: int
    sites: int
    site_id: np.ndarray = field(init=False)   # [nodes, sites] int32
    id_site: np.ndarray = field(init=False)   # [nodes, sites] int32
    ids: np.ndarray = field(init=False)       # [nodes] int32; 0 = plain

    def __post_init__(self):
        # identity mapping = repeats disabled
        ident = np.tile(np.arange(self.sites, dtype=np.int32),
                        (self.nodes, 1))
        self.site_id = ident.copy()
        self.id_site = ident.copy()
        self.ids = np.zeros(self.nodes, dtype=np.int32)

    def reset_node(self, node: int) -> None:
        """Restore the identity mapping (repeats disabled) for one node —
        used when a tip CLV is overwritten with raw probabilities that have
        no state code to class by."""
        ident = np.arange(self.sites, dtype=np.int32)
        self.site_id[node, :] = ident
        self.id_site[node, :] = ident
        self.ids[node] = 0

    def classes(self, node: int) -> int:
        """Effective class count (sites when repeats are off)."""
        n = int(self.ids[node])
        return n if n else self.sites

    def set_tip(self, tip_index: int, codes: np.ndarray) -> None:
        """Class tips by state code (pll_update_repeats_tips)."""
        from . import native
        nat = native.repeats_tips(np.asarray(codes, dtype=np.uint64))
        if nat is not None:
            site_id, id_site, ids = nat
        else:
            site_id, id_site, ids = _first_occurrence_classes(codes)
        self.site_id[tip_index, :] = site_id
        self.id_site[tip_index, :ids] = id_site
        self.id_site[tip_index, ids:] = 0
        self.ids[tip_index] = ids

    def enable_for(self, left: int, right: int) -> bool:
        """pll_default_enable_repeats (repeats.c:100-110)."""
        li, ri = int(self.ids[left]), int(self.ids[right])
        if not li or not ri:
            return False
        if li * ri >= LOOKUP_BUFFER_SIZE:
            return False
        return li <= self.sites // 2 and ri <= self.sites // 2

    def update_op(self, op: Operation) -> None:
        """Class the parent by (left class, right class) pairs
        (pll_update_repeats, repeats.c:299-383)."""
        p = op.parent_clv_index
        l, r = op.child1_clv_index, op.child2_clv_index
        if not self.enable_for(l, r):
            self.ids[p] = 0
            self.site_id[p, :] = np.arange(self.sites, dtype=np.int32)
            self.id_site[p, :] = np.arange(self.sites, dtype=np.int32)
            return
        from . import native
        nat = native.repeats_update(self.site_id[l], self.site_id[r],
                                    int(self.ids[l]),
                                    int(self.ids[l]) * int(self.ids[r]))
        if nat is not None:
            site_id, id_site, ids = nat
        else:
            codes = (self.site_id[l].astype(np.int64)
                     + self.site_id[r].astype(np.int64) * int(self.ids[l]))
            site_id, id_site, ids = _first_occurrence_classes(codes)
        if ids >= self.sites:         # no compression: force plain
            self.ids[p] = 0
            self.site_id[p, :] = np.arange(self.sites, dtype=np.int32)
            self.id_site[p, :] = np.arange(self.sites, dtype=np.int32)
            return
        self.ids[p] = ids
        self.site_id[p, :] = site_id
        self.id_site[p, :ids] = id_site
        self.id_site[p, ids:] = 0

    def gathers_for(self, op: Operation) -> Tuple[np.ndarray, np.ndarray,
                                                  int]:
        """Child class-column index per parent class (the kernel's gather
        maps): gl[c] = left class feeding parent class c. Width = parent's
        effective class count."""
        p = op.parent_clv_index
        l, r = op.child1_clv_index, op.child2_clv_index
        width = self.classes(p)
        rep = self.id_site[p, :width] if self.ids[p] \
            else np.arange(width, dtype=np.int32)
        gl = self.site_id[l, rep]
        gr = self.site_id[r, rep]
        return gl.astype(np.int32), gr.astype(np.int32), width


def bucket_width(classes: int, sites: int, lane: int = 128) -> int:
    """Round a class count up to a power-of-two multiple of the lane width
    (capped at sites) — the static kernel widths that bound recompiles."""
    w = lane
    while w < classes:
        w *= 2
    return min(w, sites)


def schedule_buckets(table: RepeatsTable,
                     operations: Sequence[Operation],
                     sites: int,
                     lane: int = 128
                     ) -> List[Tuple[int, List[Operation],
                                     np.ndarray, np.ndarray]]:
    """Group the postorder operation list into capacity buckets.

    Updates the class table for each operation in order, then groups ops by
    padded kernel width. Because a parent's class count is >= either
    child's, executing groups in increasing width preserves dependencies;
    within a group the original postorder is kept. Returns
    [(width, ops, gl [n, width], gr [n, width])] in execution order.
    """
    per_op = []
    for op in operations:
        table.update_op(op)
        gl, gr, width = table.gathers_for(op)
        per_op.append((bucket_width(width, sites, lane), op, gl, gr))

    groups: Dict[int, List] = {}
    for w, op, gl, gr in per_op:
        groups.setdefault(w, []).append((op, gl, gr))

    out = []
    for w in sorted(groups):
        ops = [g[0] for g in groups[w]]
        gl = np.zeros((len(ops), w), dtype=np.int32)
        gr = np.zeros((len(ops), w), dtype=np.int32)
        for i, (_, g1, g2) in enumerate(groups[w]):
            gl[i, :g1.size] = g1
            gr[i, :g2.size] = g2
            # padding classes re-gather class 0 (harmless, masked by ids)
        out.append((w, ops, gl, gr))
    return out
