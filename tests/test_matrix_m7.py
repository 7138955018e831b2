"""M7: the execution-mode validation matrix.

The reference cross-checks every SIMD kernel and data-reuse mode against
the same golden output ({CPU,SSE,AVX,AVX2} x {plain,tip-pattern,repeats},
test/runtest.py:45-57). The TPU analog: one scenario evaluated under every
execution mode x dtype x data-reuse combination must produce the same
logL (and match the oracle in fp64)."""
import numpy as np
import pytest
import jax.numpy as jnp

import oracle
from libpll2_tpu import Partition, TreeEngine, compute_gamma_cats
from libpll2_tpu.io import maps
from libpll2_tpu.trees import create_operations, random_utree, traverse
from libpll2_tpu.utils import simulate_alignment

N_TAXA, N_SITES = 20, 384
FREQS = [0.3, 0.2, 0.2, 0.3]
SUBST = [1.0, 2.5, 0.8, 1.2, 2.0, 1.0]


@pytest.fixture(scope="module")
def scenario():
    tree = random_utree([f"t{i}" for i in range(N_TAXA)], seed=77)
    headers, seqs = simulate_alignment(tree, N_SITES, FREQS, SUBST,
                                       alpha=0.8, seed=77)
    return tree, dict(zip(headers, seqs))


def _partition(tree, by_label, dtype, repeats=False):
    part = Partition(tree.tip_count, tree.inner_count, 4, N_SITES, 1,
                     tree.edge_count, 4, tree.inner_count, dtype=dtype,
                     site_repeats=repeats)
    for tip in tree.tips():
        part.set_tip_states(tip.clv_index, maps.map_nt, by_label[tip.label])
    part.set_frequencies(0, FREQS)
    part.set_subst_params(0, SUBST)
    part.set_category_rates(compute_gamma_cats(0.8, 4))
    return part


@pytest.fixture(scope="module")
def golden(scenario):
    """fp64 logL from the reference oracle."""
    if not oracle.available():
        pytest.skip("reference not available")
    tree, by_label = scenario
    ref = oracle.OraclePartition(tree.tip_count, tree.inner_count, 4,
                                 N_SITES, 1, tree.edge_count, 4,
                                 tree.inner_count)
    for tip in tree.tips():
        ref.set_tip_states(tip.clv_index, "nt", by_label[tip.label])
    ref.set_frequencies(0, FREQS)
    ref.set_subst_params(0, SUBST)
    ref.set_category_rates(compute_gamma_cats(0.8, 4))
    trav = traverse(tree.vroot)
    ops, branches, pmat_idx = create_operations(trav)
    ref.update_prob_matrices([0] * 4, pmat_idx, branches)
    ref.update_partials([(o.parent_clv_index, o.parent_scaler_index,
                          o.child1_clv_index, o.child1_matrix_index,
                          o.child1_scaler_index, o.child2_clv_index,
                          o.child2_matrix_index, o.child2_scaler_index)
                         for o in ops])
    root = tree.vroot
    lk = ref.edge_loglikelihood(root.clv_index, root.scaler_index,
                                root.back.clv_index, root.back.scaler_index,
                                root.pmatrix_index, [0] * 4)
    ref.destroy()
    return lk


MODES = [
    # (id, dtype, engine kwargs, repeats)
    ("scan-f64", jnp.float64, dict(level_schedule=False, pallas=False),
     False),
    ("levels-f64", jnp.float64, dict(level_schedule=True, pallas=False),
     False),
    ("scan-f32", jnp.float32, dict(level_schedule=False, pallas=False),
     False),
    ("levels-f32", jnp.float32, dict(level_schedule=True, pallas=False),
     False),
    ("pallas-f32", jnp.float32, dict(pallas="interpret"), False),
    ("repeats-f64", jnp.float64, None, True),
    ("repeats-f32", jnp.float32, None, True),
]


@pytest.mark.parametrize("mode_id,dtype,ekw,repeats", MODES,
                         ids=[m[0] for m in MODES])
def test_mode_matrix(scenario, golden, mode_id, dtype, ekw, repeats):
    tree, by_label = scenario
    part = _partition(tree, by_label, dtype, repeats=repeats)
    if ekw is not None:
        eng = TreeEngine(part, tree, **ekw)
        if mode_id == "pallas-f32":
            assert eng.use_pallas
        lk = eng.loglikelihood()
    else:
        # repeats run through the partition path
        trav = traverse(tree.vroot)
        ops, branches, pmat_idx = create_operations(trav)
        part.update_prob_matrices([0] * 4, pmat_idx, branches)
        part.update_partials(ops)
        root = tree.vroot
        lk = part.compute_edge_loglikelihood(
            root.clv_index, root.scaler_index, root.back.clv_index,
            root.back.scaler_index, root.pmatrix_index, [0] * 4)
    rtol = 1e-10 if dtype == jnp.float64 else 2e-5
    np.testing.assert_allclose(lk, golden, rtol=rtol, err_msg=mode_id)
