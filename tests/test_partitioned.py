"""Multi-partition analyses: summed logL equals the per-partition sum, and
the linked Newton step uses joint derivatives (the consumers'
multi-partition pattern)."""
import numpy as np

from libpll2_tpu import Partition, TreeEngine, compute_gamma_cats
from libpll2_tpu.io import maps
from libpll2_tpu.partitioned import PartitionedEngine
from libpll2_tpu.trees import random_utree
from libpll2_tpu.utils import simulate_alignment


def _parts(tree, n_parts=3):
    out = []
    for k in range(n_parts):
        headers, seqs = simulate_alignment(tree, 200 + 50 * k, [0.25] * 4,
                                           [1, 2, 1, 1, 2, 1], alpha=0.9,
                                           seed=60 + k)
        part = Partition(tree.tip_count, tree.inner_count, 4,
                         len(seqs[0]), 1, tree.edge_count, 4,
                         tree.inner_count)
        by = dict(zip(headers, seqs))
        for tip in tree.tips():
            part.set_tip_states(tip.clv_index, maps.map_nt, by[tip.label])
        part.set_frequencies(0, [0.25] * 4)
        part.set_subst_params(0, [1, 2, 1, 1, 2, 1])
        part.set_category_rates(compute_gamma_cats(0.9, 4))
        out.append(part)
    return out


def test_partitioned_logl_is_sum():
    tree = random_utree([f"t{i}" for i in range(10)], seed=61)
    parts = _parts(tree)
    pe = PartitionedEngine(parts, tree)
    expected = sum(TreeEngine(p, tree).loglikelihood() for p in _parts(tree))
    np.testing.assert_allclose(pe.loglikelihood(), expected, rtol=1e-12)


def test_partitioned_linked_newton_improves():
    tree = random_utree([f"t{i}" for i in range(10)], seed=61)
    pe = PartitionedEngine(_parts(tree), tree, linked=True)
    lk0, d1, d2 = pe.newton_step()
    for _ in range(8):
        lk, d1, d2 = pe.newton_step()
    assert lk >= lk0 - 1e-9
    assert abs(d1) < 1e-2
    # linked: every engine carries the same root branch length
    lens = {float(e.branches[int(e.root_idx[4])]) for e in pe.engines}
    assert len(lens) == 1
