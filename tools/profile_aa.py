"""AA fused-kernel overhead dissection (VERDICT r2 item 1 diagnostics).

Times the row-layout fused kernel ALONE (k chained traversals in one jit,
trip-count differenced) on synthetic 20-state tables that isolate one
cost at a time:

  real      — a random 64-taxon postorder (the production shape)
  all-inner — same op count, every child reads slot 0 (no tip decode,
              pure [rs, K]-dot path; results are garbage, timing valid)
  all-tips  — every child is a tip (pure decode + rate-stacked dots)

Run per mxu mode. The gap real - max(all-inner, all-tips) ~ cond cost;
compare against tools/mxu_probe.py pass rates for the MXU roofline.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from libpll2_tpu.ops import pallas_fused as pf
from libpll2_tpu.trees import random_utree, traverse, create_operations

R, S_STATES, SITES = 4, 20, 2048
N_TAXA = 64
THR, FAC = float(2.0 ** -32), float(2.0 ** 32)


def real_table():
    tree = random_utree([f"t{i}" for i in range(N_TAXA)], seed=11)
    trav = traverse(tree.vroot)
    ops, branches, pmat = create_operations(trav)
    root = tree.vroot
    table, n_slots = pf.pack_fused_schedule(
        ops, N_TAXA, (root.clv_index, root.back.clv_index))
    return np.asarray(table), n_slots, len(ops)


def synth_table(n_ops, kind, n_slots):
    t = np.zeros((n_ops + 1, 8), np.int32)
    for k in range(n_ops):
        if kind == "tips":
            t[k] = [k % n_slots, 1, k % N_TAXA, k % 8, 1,
                    (k + 1) % N_TAXA, (k + 3) % 8, 1]
        else:
            t[k] = [k % n_slots, 0, (k + 1) % n_slots, k % 8, 0,
                    (k + 2) % n_slots, (k + 3) % 8, 1]
    t[n_ops] = [0, 0, 0, 1, 0, 0, 0, 0]
    return t


@partial(jax.jit, static_argnames=("k", "n_slots", "mxu"))
def loop(k, codes, pm, table, n_slots, mxu):
    def body(i, acc):
        dep = jnp.isnan(acc).astype(jnp.int32)
        cp, cc, sp, sc = pf.fused_traversal(
            codes, pm, table + dep, rates=R, states=S_STATES,
            n_slots=n_slots, threshold=THR, factor=FAC, mxu=mxu)
        return acc + cp[0, 0, 0]
    return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))


def timeit(codes, pm, table, n_slots, mxu, name, lo=20, hi=120):
    res = {}
    for k in (lo, hi):
        float(loop(k, codes, pm, jnp.asarray(table), n_slots, mxu))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            float(loop(k, codes, pm, jnp.asarray(table), n_slots, mxu))
            best = min(best, time.perf_counter() - t0)
        res[k] = best
    dt = (res[hi] - res[lo]) / (hi - lo)
    n_ops = table.shape[0] - 1
    su = n_ops * SITES
    print(f"{name:28s} {dt*1e3:7.3f} ms/trav  {su/dt/1e9:6.3f} G su/s"
          f"  {dt/n_ops*1e6:6.3f} us/op")
    return dt


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    pm = jnp.asarray(rng.random((2 * N_TAXA, R, S_STATES, S_STATES)),
                     jnp.float32)
    codes = np.zeros((N_TAXA, SITES), np.int32)
    codes[:] = 1 << rng.integers(0, S_STATES, size=(N_TAXA, SITES))
    codes = jnp.asarray(codes)
    table, n_slots, n_ops = real_table()
    print(f"n_ops={n_ops} n_slots={n_slots}", file=sys.stderr)
    for mxu in ("split", "bf16"):
        timeit(codes, pm, table, n_slots, mxu, f"real      {mxu}")
        timeit(codes, pm, synth_table(n_ops, "inner", n_slots), n_slots,
               mxu, f"all-inner {mxu}")
        timeit(codes, pm, synth_table(n_ops, "tips", n_slots), n_slots,
               mxu, f"all-tips  {mxu}")
