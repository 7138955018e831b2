"""On-device numerical parity gate: the fp32 TPU production paths are
asserted against the CPU fp64 path, across the mode matrix
(levels / fused Pallas kernel x DNA / AA x plain / scaling-stressed /
asc-bias) — the TPU analog of the reference's 12-attribute-combo golden
matrix (/root/reference/test/runtest.py:45-57).

Two processes: the fp32 HALF runs in a worker WITHOUT x64 (the production
configuration; x64 also breaks Mosaic index-map lowering), the parent
enables x64 and computes the CPU fp64 references. The CPU fp64 values are
themselves oracle-validated by the test suite, so agreement certifies the
fp32 chip path end to end.

Exit code 0 = all cases within fp32-justified tolerances.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))
WORKER_OUT = os.path.join(REPO, ".refbuild", "validate_fp32.json")

# logL is a weighted sum of per-site logs: fp32 round-off accumulates to
# ~1e-6 relative; the 2**-32 window scaling adds no systematic error.
TOL_LOGL = 5e-5
TOL_D1 = 5e-3         # derivatives lose ~2-3 digits near extrema
ATOL_D1 = 5e-2


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _build(tree, headers, seqs, states, sites, dtype, asc=None,
           alpha=0.8, repeats=False):
    import numpy as np
    from libpll2_tpu import Partition, compute_gamma_cats
    from libpll2_tpu import constants as C
    from libpll2_tpu.io import maps

    by = dict(zip(headers, seqs))
    kwargs = {}
    if asc:
        kwargs["asc_bias"] = getattr(C.AscBias, asc.upper())
    if repeats:
        kwargs["site_repeats"] = True
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

    # site repeats: conserved alignment (strong class compression) so the
    # pooled storage + Pallas pool kernel actually permute on chip
    t4 = random_utree([f"t{i}" for i in range(48)], seed=8)
    for nd in t4.nodes():
        for h in ([nd] if nd.is_tip() else list(nd.ring())):
            if h.back is not None:
                h.length = h.back.length = max(h.length * 0.15, 0.001)
    h4, s4 = simulate_alignment(t4, 896, [0.25] * 4, [1, 2, 1, 1, 2, 1],
                                alpha=0.6, seed=8)
    cases.append(("dna_repeats", t4, h4, s4, 4, 896, None, 0.6))

    # deep random tree: ~10 levels of scaling activity; guards the fp32
    # window invariant threshold^2 > 2^-126 (a 2^-64 window silently
    # flushed whole sites to zero between scale checks on TPU FTZ
    # hardware and returned -inf at this depth)
    t5 = random_utree([f"t{i}" for i in range(768)], seed=9)
    h5, s5 = simulate_alignment(t5, 2048, [0.3, 0.2, 0.2, 0.3],
                                [1, 2, 1, 1, 2, 1], alpha=0.8, seed=9)
    cases.append(("dna_deep", t5, h5, s5, 4, 2048, None, 0.8))
    return cases


def _modes(platform: str, repeats: bool = False):
    if repeats:
        # repeats engines have three paths: the XLA pool scan, the
        # VMEM-resident Pallas pool kernel (banded class permutes), and
        # the default dense fused kernel over the pooled storage
        return [("pool", dict(pallas=False)),
                ("poolk", dict(pallas="pool" if platform != "cpu"
                               else "pool-interpret")),
                ("fused", dict(pallas=True))]
    modes = [("scan", dict(level_schedule=False, pallas=False)),
             ("levels", dict(level_schedule=True, pallas=False)),
             ("fused", dict(pallas=True))]
    if platform != "cpu":
        # the per-op scan compiles pathologically slowly through the
        # tunneled-TPU toolchain; it is oracle-validated on CPU by the
        # test suite, so the on-chip gate covers levels + fused
        modes = modes[1:]
    return modes


def fp32_worker():
    """Run every (case, mode) in fp32 on the default device; NO x64."""
    import jax
    plat = os.environ.get("BENCH_PLATFORM")
    if plat:    # the axon plugin overrides JAX_PLATFORMS; force via config
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from libpll2_tpu import TreeEngine

    target = jax.devices()[0]
    log(f"fp32 worker device: {target.platform} ({target.device_kind})")
    out = []
    for (name, tree, headers, seqs, states, sites, asc, alpha) in \
            _problems():
        rep = name == "dna_repeats"
        for mode, kw in _modes(target.platform, repeats=rep):
            if mode == "fused" and target.platform == "cpu":
                kw = dict(pallas="interpret")
            log(f"  {name}: fp32 {mode} ...")
            p32 = _build(tree, headers, seqs, states, sites, jnp.float32,
                         asc=asc, alpha=alpha, repeats=rep)
            e32 = TreeEngine(p32, tree, **kw)
            lk, d1, d2 = e32.newton_step()
            out.append({"case": name, "mode": mode,
                        "kernel": ("rep-pallas" if e32.use_repeats_pallas
                                   else "rep-pool" if e32.repeats_mode
                                   else "fused" if e32.use_fused else
                                   "levelk" if e32.use_levelkernel
                                   else "xla"),
                        "lk": lk, "d1": d1, "d2": d2})
    os.makedirs(os.path.dirname(WORKER_OUT), exist_ok=True)
    with open(WORKER_OUT, "w") as fh:
        json.dump({"platform": target.platform, "results": out}, fh)
    return 0


def main():
    if "--fp32-worker" in sys.argv:
        return fp32_worker()

    env = dict(os.environ)
    env.pop("JAX_ENABLE_X64", None)
    log("launching fp32 worker (production config, no x64) ...")
    r = subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--fp32-worker"], env=env, timeout=1500)
    if r.returncode != 0:
        log("fp32 worker failed")
        return 1
    payload = json.loads(open(WORKER_OUT).read())

    import jax
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from libpll2_tpu import TreeEngine

    refs = {}
    for (name, tree, headers, seqs, states, sites, asc, alpha) in \
            _problems():
        log(f"  {name}: fp64 reference on cpu ...")
        p64 = _build(tree, headers, seqs, states, sites, jnp.float64,
                     asc=asc, alpha=alpha, repeats=(name == "dna_repeats"))
        e64 = TreeEngine(p64, tree, pallas=False)
        refs[name] = e64.newton_step()

    results = []
    for row in payload["results"]:
        ref_lk, ref_d1, ref_d2 = refs[row["case"]]
        rel = abs(row["lk"] - ref_lk) / abs(ref_lk)
        d1_err = abs(row["d1"] - ref_d1) / max(abs(ref_d1),
                                               ATOL_D1 / TOL_D1)
        d2_err = abs(row["d2"] - ref_d2) / max(abs(ref_d2),
                                               ATOL_D1 / TOL_D1)
        ok = bool(rel < TOL_LOGL and d1_err < TOL_D1
                  and d2_err < TOL_D1 and np.isfinite(row["lk"]))
        results.append({**row, "ref_logl": ref_lk, "rel_err": rel,
                        "d1_err": d1_err, "d2_err": d2_err, "ok": ok})
        log(f"  {row['case']:16s} {row['mode']:7s} "
            f"logL={row['lk']:14.4f} rel={rel:.2e} d1={d1_err:.2e} "
            f"d2={d2_err:.2e} {'OK' if ok else 'FAIL'}")

    n_ok = sum(r["ok"] for r in results)
    try:
        git = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                             capture_output=True, text=True,
                             timeout=10).stdout.strip()
        wt = subprocess.run(["git", "status", "--porcelain"], cwd=REPO,
                            capture_output=True, text=True, timeout=10)
        touched = [l[3:] for l in wt.stdout.splitlines()
                   if l[3:].startswith("libpll2_tpu/")
                   or l[3:] == "bench_validate.py"]
        if touched:
            # results produced by uncommitted validated code: mark the
            # provenance (bench.py's reuse diff then fails closed)
            git += "-dirty"
    except Exception:
        git = ""
    summary = {"device": payload["platform"], "cases": len(results),
               "passed": n_ok, "ok": n_ok == len(results),
               "git": git, "results": results}
    with open(os.path.join(REPO, "VALIDATE.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({"metric": "tpu_parity_cases_passed",
                      "value": n_ok, "unit": "cases",
                      "vs_baseline": n_ok / len(results)}), flush=True)
    return 0 if summary["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
