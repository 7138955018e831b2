"""Split the flagship eval loop's time: kernel-only vs full pipeline.

Times (a) k chained fused_traversal kernel calls alone, (b) the full
_fused_loglikelihood_loop (pmatrix + kernel + edge logL + scatter-back),
both via the two-trip-count differencing method. The gap is the XLA
epilogue cost per eval. Diagnostics only — not part of the test suite.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import bench
from libpll2_tpu import TreeEngine
from libpll2_tpu.ops import pallas_fused as ops_fused

part, tree, _ = bench.build_problem()
eng = TreeEngine(part, tree)
print(f"device: {jax.devices()[0].platform}, fused_slots={eng.fused_slots}",
      file=sys.stderr)
assert eng.use_fused

lk = eng.loglikelihood()
print(f"logL={lk:.4f}", file=sys.stderr)

table, codes = eng.ops
pm = jnp.asarray(part.pmatrix, jnp.float32)
R, S = part.rate_cats, part.states
thr, fac = part.scale_threshold, part.scale_factor
nslots = eng.fused_slots


@jax.jit
def kernel_loop(k, codes, pm, table):
    def body(_, carry):
        acc, tbl = carry
        dep = jnp.isnan(acc).astype(jnp.int32)
        cp, cc, sp, sc = ops_fused.fused_traversal(
            codes, pm, tbl + dep, rates=R, states=S, n_slots=nslots,
            threshold=thr, factor=fac)
        return acc + cp[0, 0, 0] + sp[0].astype(jnp.float32), tbl
    acc, _ = jax.lax.fori_loop(0, k, body,
                               (jnp.zeros((), jnp.float32), table))
    return acc


def timeit(fn, k):
    best = float("inf")
    for _ in range(7):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(k))
        best = min(best, time.perf_counter() - t0)
    return best


k1, k2 = 5, 25
kernel_loop(1, codes, pm, table).block_until_ready()
kdt = (timeit(lambda k: kernel_loop(k, codes, pm, table), k2)
       - timeit(lambda k: kernel_loop(k, codes, pm, table), k1)) / (k2 - k1)

eng.loglikelihood_loop(1)
fdt = (timeit(eng.loglikelihood_loop, k2)
       - timeit(eng.loglikelihood_loop, k1)) / (k2 - k1)

n_su = tree.inner_count * part.sites
print(f"kernel-only : {kdt*1e3:.3f} ms/eval ({n_su/kdt/1e9:.2f} G su/s)")
print(f"full eval   : {fdt*1e3:.3f} ms/eval ({n_su/fdt/1e9:.2f} G su/s)")
print(f"epilogue    : {(fdt-kdt)*1e3:.3f} ms/eval "
      f"({100*(fdt-kdt)/fdt:.0f}% of total)")


# --- isolate epilogue components -------------------------------------
from libpll2_tpu.ops import likelihood as ops_likelihood
from libpll2_tpu.ops import pmatrix as ops_pmatrix

margs = eng._model_args()
sargs = eng._site_args()
(eigenvals, inv_eigenvecs, eigenvecs, prop_invar, rates, rate_weights,
 freqs, params_idx_rates) = margs
pattern_weights, invariant = sargs
root_idx = eng.root_idx
branches = eng.branches
clv0, scaler0 = part.clv, part.scale_buffer


@jax.jit
def noscatter_loop(k, codes, pm_unused, table, clv, scaler):
    """kernel + pmatrix + edge logL, but NO scatter into the big clv."""
    p_clv, p_sc_i, c_clv, c_sc_i, mat = root_idx

    def body(_, carry):
        acc, tbl = carry
        dep = jnp.isnan(acc).astype(jnp.int32)
        pmat = ops_pmatrix.update_prob_matrices(
            eigenvals, inv_eigenvecs, eigenvecs, prop_invar, rates,
            params_idx_rates, branches)
        cp, cc, sp, sc = ops_fused.fused_traversal(
            codes, jnp.asarray(pmat, jnp.float32), tbl + dep,
            rates=R, states=S, n_slots=nslots, threshold=thr, factor=fac)
        total, per = ops_likelihood.edge_loglikelihood(
            cp, cc, sp, sc, jnp.take(pmat, mat, axis=0),
            freqs, prop_invar, rate_weights, params_idx_rates,
            pattern_weights, invariant, thr,
            rate_scalers=False, has_pscaler=True, has_cscaler=True,
            asc_type=0, n_real=-1)
        return acc + total.astype(jnp.float32), tbl
    acc, _ = jax.lax.fori_loop(0, k, body,
                               (jnp.zeros((), jnp.float32), table))
    return acc


noscatter_loop(1, codes, pm, table, clv0, scaler0).block_until_ready()
ndt = (timeit(lambda k: noscatter_loop(k, codes, pm, table, clv0, scaler0), k2)
       - timeit(lambda k: noscatter_loop(k, codes, pm, table, clv0, scaler0),
                k1)) / (k2 - k1)
print(f"no-scatter  : {ndt*1e3:.3f} ms/eval ({n_su/ndt/1e9:.2f} G su/s)")


# --- bisect engine's _fused_loglikelihood_loop ------------------------
from functools import partial as _partial
from libpll2_tpu import engine as _eng


@_partial(jax.jit, static_argnames=('variant',))
def eng_like_loop(k, clv, scaler, table, codes, variant='full'):
    sites = codes.shape[1]
    r, s = clv.shape[1], clv.shape[2]
    rows0 = (jnp.zeros((r, s, sites), jnp.float32),
             jnp.zeros((r, s, sites), jnp.float32),
             jnp.zeros((sites,), jnp.int32),
             jnp.zeros((sites,), jnp.int32))

    def body(_, carry):
        acc, rows_prev = carry
        dep = jnp.isnan(acc).astype(jnp.int32)
        total, per, rows, _, _ = _eng._fused_loglikelihood(
            clv, scaler, eigenvals, inv_eigenvecs, eigenvecs, prop_invar,
            rates, rate_weights, freqs, params_idx_rates, branches,
            (table + dep, codes), root_idx, pattern_weights, invariant,
            thr, fac, rate_scalers=False, valid=None, levels=False,
            use_pallas=False, pallas_interpret=False, asc_type=0,
            n_real=-1, fused_slots=nslots, edge_params=None,
            fused_mesh=None, fused_scatter=False)
        if variant == 'norows':
            return acc + total, rows_prev
        return acc + total, rows

    acc, rows = jax.lax.fori_loop(0, k, body,
                                  (jnp.zeros((), clv.dtype), rows0))
    if variant == 'full':
        clv, scaler = _eng._scatter_root_rows(clv, scaler, root_idx, rows)
        return acc, clv, scaler
    return acc, rows[0], rows[2]


for variant in ('full', 'noscatter2', 'norows'):
    fn = lambda k: eng_like_loop(k, clv0, scaler0, table, codes,
                                 variant=variant)
    jax.block_until_ready(fn(1))
    dt = (timeit(fn, k2) - timeit(fn, k1)) / (k2 - k1)
    print(f"engine-{variant:10s}: {dt*1e3:.3f} ms/eval "
          f"({n_su/dt/1e9:.2f} G su/s)")


# --- call the engine's own loop directly ------------------------------
def eng_direct(k):
    p = part
    return _eng._fused_loglikelihood_loop(
        jnp.asarray(k), p.clv, p.scale_buffer, *eng._model_args(),
        eng.branches, eng.ops, eng.root_idx, *eng._site_args(),
        p.scale_threshold, p.scale_factor, rate_scalers=p.rate_scalers,
        valid=eng.valid, levels=eng.levels,
        use_pallas=eng.use_levelkernel,
        pallas_interpret=eng.pallas_interpret,
        asc_type=eng.asc_type, n_real=eng.n_real,
        fused_slots=eng.fused_slots, edge_params=eng.edge_params,
        fused_mesh=eng.fused_mesh if eng.use_fused else None)


jax.block_until_ready(eng_direct(1))
dt = (timeit(lambda k: jax.block_until_ready(eng_direct(k)), k2)
      - timeit(lambda k: jax.block_until_ready(eng_direct(k)), k1)) / (k2 - k1)
print(f"engine-direct: {dt*1e3:.3f} ms/eval ({n_su/dt/1e9:.2f} G su/s)")
print("types:", type(part.clv), part.clv.dtype, type(part.scale_buffer),
      file=sys.stderr)
print("statics:", part.scale_threshold, part.scale_factor,
      eng.asc_type, eng.n_real, eng.levels, eng.use_levelkernel,
      file=sys.stderr)


for name, a in zip(
    ("eigenvals", "inv_eigenvecs", "eigenvecs", "prop_invar", "rates",
     "rate_weights", "freqs", "params_idx_rates"), eng._model_args()):
    print(f"  {name:16s} {getattr(a, 'dtype', type(a))}", file=sys.stderr)
for name, a in zip(("pattern_weights", "invariant"), eng._site_args()):
    print(f"  {name:16s} {getattr(a, 'dtype', type(a))}", file=sys.stderr)
print(f"  branches         {eng.branches.dtype}", file=sys.stderr)
print(f"  root_idx         {eng.root_idx.dtype}", file=sys.stderr)
print(f"  clv              {part.clv.dtype}  scale {part.scale_buffer.dtype}",
      file=sys.stderr)
