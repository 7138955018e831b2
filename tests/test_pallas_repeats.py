"""Pallas pool-traversal kernel for site repeats (interpret mode):
must reproduce the XLA pool path bit-for-bit on scalers and to fp32
rounding on CLVs, across mixed identity-profile runs."""
import numpy as np
import jax.numpy as jnp

from libpll2_tpu import Partition, compute_gamma_cats
from libpll2_tpu.io import maps
from libpll2_tpu.trees import create_operations, random_utree, traverse
from libpll2_tpu.utils.simulate import simulate_alignment
from libpll2_tpu.ops import partials as ops_partials
from libpll2_tpu.ops import pallas_repeats


def test_pool_kernel_matches_xla_path():
    tree = random_utree([f"t{i}" for i in range(24)], seed=11)
    headers, seqs = simulate_alignment(tree, 600, [0.3,0.25,0.2,0.25],
                                       [1.2,3.0,0.8,1.1,2.6,1.0], alpha=0.8, seed=11)
    part = Partition(tree.tip_count, tree.inner_count, 4, 600, 1,
                     tree.edge_count, 4, tree.inner_count, site_repeats=True,
                     dtype=jnp.float32)
    by = dict(zip(headers, seqs))
    for t in tree.tips():
        part.set_tip_states(t.clv_index, maps.map_nt, by[t.label])
    part.set_frequencies(0, [0.3,0.25,0.2,0.25])
    part.set_subst_params(0, [1.2,3.0,0.8,1.1,2.6,1.0])
    part.set_category_rates(compute_gamma_cats(0.8, 4))
    trav = traverse(tree.vroot)
    ops, br, pidx = create_operations(trav)
    part.update_prob_matrices([0]*4, pidx, br)
    part.update_partials(ops)   # XLA pool path; builds schedule
    clv_ref, sc_ref = np.asarray(part.clv_flat), np.asarray(part.sc_flat)

    # re-run the schedule from scratch with the pallas kernel (interpret)
    part2 = Partition(tree.tip_count, tree.inner_count, 4, 600, 1,
                      tree.edge_count, 4, tree.inner_count, site_repeats=True,
                      dtype=jnp.float32)
    for t in tree.tips():
        part2.set_tip_states(t.clv_index, maps.map_nt, by[t.label])
    part2.set_frequencies(0, [0.3,0.25,0.2,0.25])
    part2.set_subst_params(0, [1.2,3.0,0.8,1.1,2.6,1.0])
    part2.set_category_rates(compute_gamma_cats(0.8, 4))
    part2.update_prob_matrices([0]*4, pidx, br)
    from libpll2_tpu.repeats import schedule_buckets_flat
    layout, buckets = schedule_buckets_flat(part2.repeats, ops, 600, part2.scale_buffers)
    part2._install_flat(layout)
    sched = tuple((jnp.asarray(f), jnp.asarray(gl), jnp.asarray(gr))
                  for _, f, gl, gr, _, _ in buckets)
    profs = tuple((il, ir) for *_, il, ir in buckets)
    clv2, sc2 = pallas_repeats.update_partials_repeats_pool_pallas(
        part2.clv_flat, part2.sc_flat, part2.pmatrix, sched,
        part2.scale_threshold, part2.scale_factor, rates=4, states=4,
        profiles=profs, interpret=True)
    np.testing.assert_allclose(np.asarray(clv2), clv_ref, rtol=2e-6,
                               atol=1e-30)
    np.testing.assert_array_equal(np.asarray(sc2), sc_ref)


def test_engine_repeats_pallas_interpret_matches_xla():
    """TreeEngine with pallas='interpret' on a repeats partition routes
    the fused evaluation through the VMEM pool kernel; logL, the Newton
    loop and candidate scoring must match the XLA pool engine."""
    from libpll2_tpu import TreeEngine

    def build():
        tree = random_utree([f"t{i}" for i in range(16)], seed=7)
        headers, seqs = simulate_alignment(
            tree, 384, [0.3, 0.25, 0.2, 0.25],
            [1.2, 3.0, 0.8, 1.1, 2.6, 1.0], alpha=0.9, seed=7)
        part = Partition(tree.tip_count, tree.inner_count, 4, 384, 1,
                         tree.edge_count, 4, tree.inner_count,
                         site_repeats=True, dtype=jnp.float32)
        by = dict(zip(headers, seqs))
        for t in tree.tips():
            part.set_tip_states(t.clv_index, maps.map_nt, by[t.label])
        part.set_frequencies(0, [0.3, 0.25, 0.2, 0.25])
        part.set_subst_params(0, [1.2, 3.0, 0.8, 1.1, 2.6, 1.0])
        part.set_category_rates(compute_gamma_cats(0.9, 4))
        return part, tree

    part_x, tree_x = build()
    part_k, tree_k = build()
    eng_x = TreeEngine(part_x, tree_x, pallas=False)
    eng_k = TreeEngine(part_k, tree_k, pallas='pool-interpret')
    assert eng_k.use_repeats_pallas
    lk_x, lk_k = eng_x.loglikelihood(), eng_k.loglikelihood()
    np.testing.assert_allclose(lk_k, lk_x, rtol=2e-6)
    np.testing.assert_allclose(eng_k.newton_loop(2), eng_x.newton_loop(2),
                               rtol=2e-4)
    np.testing.assert_allclose(eng_k.loglikelihood_loop(2),
                               eng_x.loglikelihood_loop(2), rtol=2e-6)
