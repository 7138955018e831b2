"""Pallas CLV kernel validation (interpret mode on CPU): exact equality
with the XLA level path in fp32, including underflow-scaling cases."""
import numpy as np
import pytest
import jax.numpy as jnp

from libpll2_tpu import Partition, TreeEngine, compute_gamma_cats
from libpll2_tpu.io import maps
from libpll2_tpu.trees import parse_newick, random_utree
from libpll2_tpu.utils import simulate_alignment

FREQS = [0.3, 0.2, 0.2, 0.3]
SUBST = [1, 2, 1, 1, 2, 1]


def _build(tree, headers, seqs, sites, states=4, rate_cats=4):
    by = dict(zip(headers, seqs))
    part = Partition(tree.tip_count, tree.inner_count, states, sites, 1,
                     tree.edge_count, rate_cats, tree.inner_count,
                     dtype=jnp.float32)
    cm = maps.map_nt if states == 4 else maps.map_aa
    for t in tree.tips():
        part.set_tip_states(t.clv_index, cm, by[t.label])
    part.set_frequencies(0, FREQS if states == 4 else
                         np.full(states, 1.0 / states))
    part.set_subst_params(0, SUBST if states == 4 else
                          np.ones(states * (states - 1) // 2))
    part.set_category_rates(compute_gamma_cats(0.9, rate_cats))
    return part


def test_pallas_matches_xla_random_tree():
    tree = random_utree([f"t{i}" for i in range(12)], seed=5)
    headers, seqs = simulate_alignment(tree, 256, FREQS, SUBST,
                                       alpha=0.9, seed=5)
    e_xla = TreeEngine(_build(tree, headers, seqs, 256), tree, pallas=False)
    e_pl = TreeEngine(_build(tree, headers, seqs, 256), tree,
                      pallas="interpret")
    assert e_pl.use_pallas
    np.testing.assert_array_equal(e_pl.loglikelihood(),
                                  e_xla.loglikelihood())


def test_pallas_matches_xla_with_scaling():
    """Caterpillar topology forces fp32 underflow scaling (2^-64 window)."""
    n = 80
    text = f"t{n-1}:0.1"
    for i in range(n - 2, 1, -1):
        text = f"(t{i}:0.1,{text}):0.1"
    tree = parse_newick(f"(t0:0.1,t1:0.1,{text});")
    headers, seqs = simulate_alignment(tree, 128, FREQS, SUBST,
                                       alpha=0.9, seed=3)
    p_xla = _build(tree, headers, seqs, 128)
    p_pl = _build(tree, headers, seqs, 128)
    e_xla = TreeEngine(p_xla, tree, pallas=False)
    e_pl = TreeEngine(p_pl, tree, pallas="interpret")
    lk_x = e_xla.loglikelihood()
    lk_p = e_pl.loglikelihood()
    # scaling must actually trigger for this test to mean anything
    n_scaled = int(np.asarray(
        p_xla.scale_buffer[:p_xla.scale_buffers]).sum())
    assert n_scaled > 0
    np.testing.assert_array_equal(lk_p, lk_x)
    # scaler contents identical row by row
    np.testing.assert_array_equal(
        np.asarray(p_pl.scale_buffer[:p_pl.scale_buffers]),
        np.asarray(p_xla.scale_buffer[:p_xla.scale_buffers]))


def test_pallas_matches_xla_20_states():
    from libpll2_tpu.models import load_aa_model
    tree = random_utree([f"t{i}" for i in range(8)], seed=3)
    headers, seqs = simulate_alignment(tree, 256, [1 / 20] * 20,
                                       [1.0] * 190, alpha=1.0, seed=3)
    by = dict(zip(headers, seqs))

    def build():
        part = Partition(tree.tip_count, tree.inner_count, 20, 256, 1,
                         tree.edge_count, 4, tree.inner_count,
                         dtype=jnp.float32)
        for t in tree.tips():
            part.set_tip_states(t.clv_index, maps.map_aa, by[t.label])
        load_aa_model(part, "lg")
        part.set_category_rates(compute_gamma_cats(1.0, 4))
        return part

    e_xla = TreeEngine(build(), tree, pallas=False)
    e_pl = TreeEngine(build(), tree, pallas="interpret")
    assert e_pl.use_pallas
    np.testing.assert_array_equal(e_pl.loglikelihood(),
                                  e_xla.loglikelihood())


def test_pallas_newton_matches_xla():
    tree = random_utree([f"t{i}" for i in range(10)], seed=9)
    headers, seqs = simulate_alignment(tree, 128, FREQS, SUBST,
                                       alpha=0.9, seed=9)
    e_xla = TreeEngine(_build(tree, headers, seqs, 128), tree, pallas=False)
    e_pl = TreeEngine(_build(tree, headers, seqs, 128), tree,
                      pallas="interpret")
    np.testing.assert_array_equal(e_pl.newton_step(), e_xla.newton_step())
