"""On-chip half of the aa_repeats d1 diagnostic (run WITHOUT x64):

    python tools/diag_aa_repeats_d1_tpu.py [case]

Prints the fp32 d1/d2 on the default device (the tunneled TPU), then
re-evaluates d1 over K site-chunks with the root branch RESTORED
between calls and sums the chunk d1s in fp64 host-side. If the chunked
sum converges to the fp64 reference, the error is the on-chip fp32
site reduction (fixable by compensated summation); if it stays, the
per-site terms themselves differ on TPU (exp/div precision).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench_validate import _build, _problems


def main():
    cases = {name: (tree, h, s, bkw, ekw)
             for name, tree, h, s, bkw, ekw in _problems()}
    name = sys.argv[1] if len(sys.argv) > 1 else "aa_repeats"
    mode = sys.argv[2] if len(sys.argv) > 2 else "pool"
    tree, h, s, bkw, ekw = cases[name]
    from libpll2_tpu import TreeEngine

    print("device:", jax.devices()[0].platform)
    kw = {"pool": dict(pallas=False),
          "fused": dict(pallas=True)}[mode]
    p32 = _build(tree, h, s, dtype=jnp.float32, **bkw)
    e32 = TreeEngine(p32, tree, **kw, **ekw)
    b0 = e32.branches
    lk32, d1_32, d2_32 = e32.newton_step()
    e32.branches = b0
    print(f"fp32 {mode} ({e32.execution_path}): lk={lk32:.6f} "
          f"d1={d1_32:.8e} d2={d2_32:.8e}")

    sites = p32.sites
    full_w = np.asarray(p32.pattern_weights[:sites]).copy()
    for K in (16,):
        bounds = np.linspace(0, sites, K + 1).astype(int)
        tot1 = tot2 = 0.0
        for k in range(K):
            w = np.zeros(sites, np.int64)
            sl = slice(bounds[k], bounds[k + 1])
            w[sl] = full_w[sl]
            p32.set_pattern_weights(w)
            _, c1, c2 = e32.newton_step()
            e32.branches = b0
            tot1 += float(c1)
            tot2 += float(c2)
        print(f"fp32 {K:3d}-chunk fp64-summed: d1={tot1:.8e} "
              f"d2={tot2:.8e}")
    p32.set_pattern_weights(full_w)


if __name__ == "__main__":
    main()
