"""Likelihood-based marginal ancestral state probabilities vs the oracle
(reference: /root/reference/src/likelihood.c:639-830,
pll_compute_node_ancestral)."""
import numpy as np
import pytest

import oracle
from test_core_m0 import build_random_scenario

pytestmark = pytest.mark.skipif(not oracle.available(),
                                reason="reference oracle not built")


@pytest.mark.parametrize("states,rate_cats,long_branches", [
    (4, 4, False),
    (4, 4, True),          # per-site scalers trigger; must cancel exactly
    (20, 2, False),
])
def test_node_ancestral_vs_oracle(states, rate_cats, long_branches):
    ref, part, ops, pidx = build_random_scenario(
        10, 53, states, rate_cats, seed=5, long_branches=long_branches)
    root, root_sc = ops[-1][0], ops[-1][1]
    # across the edge to an inner child, and to a tip
    for other, osc, mat in ((ops[-1][2], ops[-1][4], ops[-1][3]),
                            (ops[-1][5], ops[-1][7], ops[-1][6])):
        anc_ref = ref.node_ancestral(root, root_sc, other, osc, mat, pidx)
        anc = part.compute_node_ancestral(root, root_sc, other, osc, mat,
                                          pidx)
        np.testing.assert_allclose(anc, anc_ref, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(anc.sum(axis=1), 1.0, rtol=1e-12)
    ref.destroy()


def test_node_ancestral_repeats_matches_dense():
    """The reference refuses repeats partitions (likelihood.c:668-674);
    here the pooled class columns are expanded per site, so the repeats
    answer must equal the dense one."""
    ref_d, dense, ops, pidx = build_random_scenario(8, 40, 4, 4, seed=7)
    ref_r, rep, ops_r, _ = build_random_scenario(8, 40, 4, 4, seed=7,
                                                 site_repeats=True)
    root, root_sc = ops[-1][0], ops[-1][1]
    other, osc, mat = ops[-1][2], ops[-1][4], ops[-1][3]
    a_dense = dense.compute_node_ancestral(root, root_sc, other, osc, mat,
                                           pidx)
    a_rep = rep.compute_node_ancestral(root, root_sc, other, osc, mat, pidx)
    np.testing.assert_allclose(a_rep, a_dense, rtol=1e-10, atol=1e-14)
    ref_d.destroy()
    ref_r.destroy()
