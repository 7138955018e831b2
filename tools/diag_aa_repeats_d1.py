"""Diagnose the aa_repeats d1 gate outlier (~1.9e-3 rel, VERDICT r4 #6).

Question: is the fp32 d1 error per-site term error (inherent fp32
cancellation in the 20-state sumtable products) or site-REDUCTION
ordering error (fixable with a compensated sum)?

Method: evaluate d1 over K site-chunks (zeroing the other chunks'
pattern weights) and add the chunk d1s in fp64 on the host. If the
chunked-fp64-summed d1 still misses the fp64 reference by ~1.9e-3, the
per-site terms themselves carry the error; if it converges, the global
fp32 site sum is the culprit and a Kahan pass fixes it.
"""
import os
import sys

os.environ["JAX_ENABLE_X64"] = "true"
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from bench_validate import _build, _problems


def main():
    cases = {name: (tree, h, s, bkw, ekw)
             for name, tree, h, s, bkw, ekw in _problems()}
    name = sys.argv[1] if len(sys.argv) > 1 else "aa_repeats"
    tree, h, s, bkw, ekw = cases[name]
    from libpll2_tpu import TreeEngine

    p64 = _build(tree, h, s, dtype=jnp.float64, **bkw)
    e64 = TreeEngine(p64, tree, pallas=False, **ekw)
    lk64, d1_64, d2_64 = e64.newton_step()
    print(f"fp64 ref: lk={lk64:.6f} d1={d1_64:.8e} d2={d2_64:.8e}")

    p32 = _build(tree, h, s, dtype=jnp.float32, **bkw)
    e32 = TreeEngine(p32, tree, pallas=False, **ekw)
    lk32, d1_32, d2_32 = e32.newton_step()
    print(f"fp32 all: lk={lk32:.6f} d1={d1_32:.8e} d2={d2_32:.8e} "
          f"rel_d1={abs(d1_32 - d1_64) / abs(d1_64):.3e} "
          f"rel_d2={abs(d2_32 - d2_64) / abs(d2_64):.3e}")

    sites = p32.sites
    full_w = np.asarray(p32.pattern_weights[:sites]).copy()
    for K in (8, 64):
        bounds = np.linspace(0, sites, K + 1).astype(int)
        tot1 = tot2 = 0.0
        for k in range(K):
            w = np.zeros(sites, np.int64)
            sl = slice(bounds[k], bounds[k + 1])
            w[sl] = full_w[sl]
            p32.set_pattern_weights(w)
            _, c1, c2 = e32.newton_step()
            tot1 += float(c1)
            tot2 += float(c2)
        print(f"fp32 {K:3d}-chunk fp64-summed: d1={tot1:.8e} "
              f"rel_d1={abs(tot1 - d1_64) / abs(d1_64):.3e} "
              f"rel_d2={abs(tot2 - d2_64) / abs(d2_64):.3e}")
    p32.set_pattern_weights(full_w)


if __name__ == "__main__":
    main()
