"""On-device numerical parity gate: the fp32 TPU production paths are
asserted against the CPU fp64 path in the SAME process, across the mode
matrix (scan / levels / fused Pallas kernel x DNA / AA x plain /
scaling-stressed / asc-bias) — the TPU analog of the reference's
12-attribute-combo golden matrix (/root/reference/test/runtest.py:45-57).

The CPU fp64 values are themselves oracle-validated by the test suite
(tests/ vs the ctypes bridge), so agreement here certifies the fp32 chip
path end to end. Run standalone (`python bench_validate.py`) or via
bench.py, which embeds the result in its JSON line.

Exit code 0 = all cases within fp32-justified tolerances.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# logL is a weighted sum of per-site logs: fp32 round-off accumulates to
# ~1e-6 relative; the 2**-64 window scaling adds no systematic error.
TOL_LOGL = 5e-5
TOL_D1 = 5e-3         # derivatives lose ~2-3 digits near extrema
ATOL_D1 = 5e-2


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _build(tree, headers, seqs, states, sites, dtype, asc=None,
           alpha=0.8):
    import numpy as np
    from libpll2_tpu import Partition, compute_gamma_cats
    from libpll2_tpu import constants as C
    from libpll2_tpu.io import maps

    by = dict(zip(headers, seqs))
    kwargs = {}
    if asc:
        kwargs["asc_bias"] = getattr(C.AscBias, asc.upper())
    part = Partition(tree.tip_count, tree.inner_count, states, sites, 1,
                     tree.edge_count, 4, tree.inner_count, dtype=dtype,
                     **kwargs)
    cm = maps.map_nt if states == 4 else maps.map_aa
    for t in tree.tips():
        part.set_tip_states(t.clv_index, cm, by[t.label])
    rng = np.random.default_rng(11)
    if states == 4:
        part.set_frequencies(0, rng.dirichlet(np.ones(4) * 10))
        part.set_subst_params(0, rng.uniform(0.5, 2.0, size=6))
    else:
        from libpll2_tpu.models import load_aa_model
        load_aa_model(part, "lg")
    part.set_category_rates(compute_gamma_cats(alpha, 4))
    if asc:
        part.set_asc_state_weights([2] * states)
    return part


def _problems():
    """(name, tree, headers, seqs, states, sites, asc, alpha) cases."""
    from libpll2_tpu.trees import parse_newick, random_utree
    from libpll2_tpu.utils import simulate_alignment

    cases = []
    t1 = random_utree([f"t{i}" for i in range(24)], seed=4)
    h1, s1 = simulate_alignment(t1, 1024, [0.3, 0.2, 0.2, 0.3],
                                [1, 2, 1, 1, 2, 1], alpha=0.8, seed=4)
    cases.append(("dna_random", t1, h1, s1, 4, 1024, None, 0.8))

    # caterpillar with stretched branches: forces many fp32 scaling events
    n = 96
    text = f"t{n-1}:0.3"
    for i in range(n - 2, 1, -1):
        text = f"(t{i}:0.3,{text}):0.3"
    t2 = parse_newick(f"(t0:0.3,t1:0.3,{text});")
    h2, s2 = simulate_alignment(t2, 512, [0.25] * 4, [1, 2, 1, 1, 2, 1],
                                alpha=0.5, seed=5)
    cases.append(("dna_scaling", t2, h2, s2, 4, 512, None, 0.5))

    t3 = random_utree([f"t{i}" for i in range(12)], seed=6)
    h3, s3 = simulate_alignment(t3, 512, [1 / 20] * 20, [1.0] * 190,
                                alpha=1.0, seed=6)
    cases.append(("aa_lg", t3, h3, s3, 20, 512, None, 1.0))

    cases.append(("dna_asc_lewis", t1, h1, s1, 4, 1024, "lewis", 0.8))
    return cases


def run_matrix():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from libpll2_tpu import TreeEngine

    cpu = jax.devices("cpu")[0]
    target = jax.devices()[0]
    modes = [("scan", dict(level_schedule=False, pallas=False)),
             ("levels", dict(level_schedule=True, pallas=False)),
             ("fused", dict(pallas=True))]
    if target.platform not in ("cpu",):
        # the per-op scan compiles pathologically slowly through the
        # tunneled-TPU toolchain; it is oracle-validated on CPU by the
        # test suite, so the on-chip gate covers levels + fused
        modes = modes[1:]
    results = []
    for (name, tree, headers, seqs, states, sites, asc, alpha) in \
            _problems():
        with jax.default_device(cpu):
            p64 = _build(tree, headers, seqs, states, sites, jnp.float64,
                         asc=asc, alpha=alpha)
            e64 = TreeEngine(p64, tree, pallas=False)
            ref_lk, ref_d1, ref_d2 = e64.newton_step()
        for mode, kw in modes:
            if mode == "fused" and target.platform not in ("tpu", "axon"):
                kw = dict(pallas="interpret")
            p32 = _build(tree, headers, seqs, states, sites, jnp.float32,
                         asc=asc, alpha=alpha)
            e32 = TreeEngine(p32, tree, **kw)
            lk, d1, d2 = e32.newton_step()
            rel = abs(lk - ref_lk) / abs(ref_lk)
            d1_err = abs(d1 - ref_d1) / max(abs(ref_d1), ATOL_D1 / TOL_D1)
            d2_err = abs(d2 - ref_d2) / max(abs(ref_d2), ATOL_D1 / TOL_D1)
            ok = bool(rel < TOL_LOGL and d1_err < TOL_D1
                      and d2_err < TOL_D1 and np.isfinite(lk))
            results.append({
                "case": name, "mode": mode,
                "kernel": ("fused" if e32.use_fused else
                           "levelk" if e32.use_levelkernel else "xla"),
                "logl": lk, "ref_logl": ref_lk, "rel_err": rel,
                "d1_err": d1_err, "d2_err": d2_err, "ok": ok,
            })
            log(f"  {name:16s} {mode:7s} logL={lk:14.4f} "
                f"rel={rel:.2e} d1={d1_err:.2e} d2={d2_err:.2e} "
                f"{'OK' if ok else 'FAIL'}")
    return results


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    plat = os.environ.get("BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    repo = os.path.dirname(os.path.abspath(__file__))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    dev = jax.devices()[0]
    log(f"validation device: {dev.platform} ({dev.device_kind})")
    results = run_matrix()
    n_ok = sum(r["ok"] for r in results)
    summary = {"device": dev.platform, "cases": len(results),
               "passed": n_ok, "ok": n_ok == len(results),
               "results": results}
    with open(os.path.join(repo, "VALIDATE.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({"metric": "tpu_parity_cases_passed",
                      "value": n_ok, "unit": "cases",
                      "vs_baseline": n_ok / len(results)}), flush=True)
    return 0 if summary["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
