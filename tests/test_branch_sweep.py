"""Device-resident all-branches Newton smoothing (ops/branch_sweep.py):
must reach the same optimum as the host-looped per-edge Newton loop
(optimize.newton_optimize_branches), which is itself oracle-validated."""
import numpy as np
import pytest

from libpll2_tpu import Partition, TreeEngine, compute_gamma_cats
from libpll2_tpu.io import maps
from libpll2_tpu.optimize import newton_optimize_branches, newton_smooth_all
from libpll2_tpu.trees import random_utree
from libpll2_tpu.utils import simulate_alignment

FREQS = [0.3, 0.2, 0.2, 0.3]
SUBST = [1.2, 2.5, 0.8, 1.1, 2.0, 1.0]


def _problem(n_taxa=14, sites=384, seed=21, perturb=1.7):
    tree = random_utree([f"t{i}" for i in range(n_taxa)], seed=seed)
    headers, seqs = simulate_alignment(tree, sites, FREQS, SUBST,
                                       alpha=0.9, seed=seed)
    # perturb branch lengths so there is something to optimize
    seen = set()
    for n in tree.nodes():
        for h in ([n] if n.is_tip() else list(n.ring())):
            if id(h) not in seen and h.back is not None:
                seen.add(id(h)), seen.add(id(h.back))
                h.length = h.back.length = h.length * perturb + 0.02
    return tree, headers, seqs


def _build(tree, headers, seqs, sites):
    by = dict(zip(headers, seqs))
    part = Partition(tree.tip_count, tree.inner_count, 4, sites, 1,
                     tree.edge_count, 4, tree.inner_count)
    for t in tree.tips():
        part.set_tip_states(t.clv_index, maps.map_nt, by[t.label])
    part.set_frequencies(0, FREQS)
    part.set_subst_params(0, SUBST)
    part.set_category_rates(compute_gamma_cats(0.9, 4))
    return part


def _edge_lengths(tree):
    out = {}
    seen = set()
    for n in tree.nodes():
        for h in ([n] if n.is_tip() else list(n.ring())):
            if h.back is not None and id(h) not in seen:
                seen.add(id(h)), seen.add(id(h.back))
                out[h.pmatrix_index] = h.length
    return out


def test_sweep_matches_host_loop():
    tree_a, headers, seqs = _problem()
    tree_b, _, _ = _problem()
    sites = 384

    part_a = _build(tree_a, headers, seqs, sites)
    eng = TreeEngine(part_a, tree_a, pallas=False)
    lk0 = eng.loglikelihood()
    # both optimizers follow near-identical trajectories; compare the
    # converged optima (sweep gets extra passes at negligible cost —
    # it is one dispatch either way)
    lk_dev = newton_smooth_all(eng, tree_a, passes=8, iterations=8)

    part_b = _build(tree_b, headers, seqs, sites)
    lk_host = newton_optimize_branches(part_b, tree_b, [0] * 4,
                                       passes=8, iterations=8)

    assert lk_dev > lk0 + 1.0          # actually improved
    assert lk_dev == pytest.approx(lk_host, abs=0.01)
    la, lb = _edge_lengths(tree_a), _edge_lengths(tree_b)
    for k in la:
        assert la[k] == pytest.approx(lb[k], rel=0.05, abs=2e-3), k


def test_sweep_improves_and_converges():
    tree, headers, seqs = _problem(n_taxa=10, sites=256, seed=3)
    part = _build(tree, headers, seqs, 256)
    eng = TreeEngine(part, tree, pallas=False)
    lk0 = eng.loglikelihood()
    lk1 = newton_smooth_all(eng, tree, passes=1, iterations=8)
    lk2 = newton_smooth_all(eng, tree, passes=4, iterations=8)
    assert lk1 > lk0
    assert lk2 >= lk1 - 1e-6
    # converged: one more pass moves logL negligibly
    lk3 = newton_smooth_all(eng, tree, passes=1, iterations=8)
    assert abs(lk3 - lk2) < 1e-3 * abs(lk2) + 0.05
