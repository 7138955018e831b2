"""Multi-partition analyses: several alignments, one topology.

The reference leaves partitioned models entirely to its consumers (each
MPI rank / partition holds its own pll_partition_t and the client sums
logL and d1/d2 across them — the pattern visible in stepwise.c:337-346's
multi-partition score sum). This helper packages it: every partition gets
its own TreeEngine bound to the shared tree; totals are summed.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from .engine import TreeEngine
from .partition import Partition
from .trees.utree import UTree


class PartitionedEngine:
    """Sum of per-partition log-likelihoods over one shared topology.

    Branch lengths may be shared (linked=True: one set of lengths, summed
    d1/d2 drive a single Newton update applied to every partition) or
    unlinked (each partition optimizes its own root branch).
    """

    @staticmethod
    def shard(partitions: Sequence[Partition], mesh) -> None:
        """Distribute a partitioned analysis over a device mesh: every
        partition's site axis is sharded in place (build each with
        sites_alignment=mesh.devices.size), after which the engines run
        one SPMD program per partition — per-partition logL/d1/d2 ride
        `psum` over the mesh, the cross-partition sums stay host-side
        scalars. This is the consumers' MPI partitioned-analysis layout
        (each rank holds a column slice of EVERY partition, reference
        pll_set_pattern_weights /root/reference/src/pll.c:1112 per
        partition) on ICI instead of MPI. Call before constructing the
        PartitionedEngine."""
        from .parallel import shard_partition
        for p in partitions:
            shard_partition(p, mesh)

    def __init__(self, partitions: Sequence[Partition], tree: UTree,
                 params_indices: Optional[Sequence[int]] = None,
                 linked: bool = True, **engine_kwargs):
        if params_indices is None:
            params_indices = [0] * len(partitions)
        self.engines: List[TreeEngine] = [
            TreeEngine(p, tree, params_index=i, **engine_kwargs)
            for p, i in zip(partitions, params_indices)]
        self.linked = linked

    def loglikelihood(self) -> float:
        return sum(e.loglikelihood() for e in self.engines)

    # --- the TreeSearch engine protocol: a PartitionedEngine can drive
    # topology search directly (TreeSearch(None, tree, engine=pe)) —
    # candidate tables are index-identical across partitions (one shared
    # tree template), so each packed/object candidate batch is scored by
    # every partition and the scores summed, exactly the consumers'
    # multi-partition score sum (reference stepwise.c:337-346).

    @property
    def use_fused(self) -> bool:
        return all(e.use_fused for e in self.engines)

    def set_topology(self, tree: UTree) -> None:
        for e in self.engines:
            e.set_topology(tree)

    def pack_candidate(self, vroot):
        # only when EVERY partition runs fused (evaluate_packed needs it)
        if not self.use_fused:
            return None
        return self.engines[0].pack_candidate(vroot)

    def evaluate_packed(self, packed):
        total = self.engines[0].evaluate_packed(packed)
        for e in self.engines[1:]:
            total = total + e.evaluate_packed(packed)
        return total

    def evaluate_topologies(self, candidates):
        total = self.engines[0].evaluate_topologies(candidates)
        for e in self.engines[1:]:
            total = total + e.evaluate_topologies(candidates)
        return total

    def newton_step(self) -> Tuple[float, float, float]:
        """(total logL, summed d1, summed d2); with linked branches a
        single Newton update from the summed derivatives is applied to
        every engine (the multi-partition derivative sum of the
        reference's consumers)."""
        import jax.numpy as jnp

        from . import constants as C
        from .ops.derivatives import newton_step as _newton

        pre = [float(e.branches[int(e.root_idx[4])]) for e in self.engines]
        totals = [e.newton_step() for e in self.engines]
        total = sum(t[0] for t in totals)
        d1 = sum(t[1] for t in totals)
        d2 = sum(t[2] for t in totals)
        if self.linked:
            # replace each engine's independent update with one joint
            # Newton step from the summed derivatives and the shared
            # pre-step length
            new_len = _newton(jnp.asarray(pre[0]), jnp.asarray(d1),
                              jnp.asarray(d2), C.OPT_MIN_BRANCH_LEN,
                              C.OPT_MAX_BRANCH_LEN)
            for e in self.engines:
                mat = int(e.root_idx[4])
                e.branches = e.branches.at[mat].set(
                    jnp.asarray(new_len, e.partition.dtype))
        return total, d1, d2

    def make_joint_loglikelihood_fn(self, optimize=("branches",)):
        """(fn, params0): fn(params) = sum of per-partition logL,
        differentiable. Parameter keys: `log_branches` is SHARED across
        partitions when linked (the RAxML-NG "linked branch lengths"
        partitioned model); per-partition model parameters are namespaced
        `p{i}:log_subst` / `p{i}:freq_logits`. Engines must be built with
        pallas=False (the differentiable XLA path)."""
        from .optimize import make_loglikelihood_fn

        fns = []
        params = {}
        for i, e in enumerate(self.engines):
            fi, pi = make_loglikelihood_fn(e, optimize)
            fns.append(fi)
            for k, v in pi.items():
                if k == "log_branches" and self.linked:
                    params.setdefault("log_branches", v)
                else:
                    params[f"p{i}:{k}"] = v

        linked = self.linked

        def fn(q):
            total = 0.0
            for i, fi in enumerate(fns):
                qi = {}
                for k in ("log_subst", "freq_logits", "log_branches"):
                    if f"p{i}:{k}" in q:
                        qi[k] = q[f"p{i}:{k}"]
                if linked and "log_branches" in q:
                    qi["log_branches"] = q["log_branches"]
                total = total + fi(qi)
            return total

        return fn, params

    def maximize(self, optimize=("branches",), steps: int = 200,
                 learning_rate: float = 0.02, tol: float = 1e-6,
                 patience: int = 25, chunk: int = 25):
        """Joint Adam ascent over all partitions: shared (linked) branch
        lengths + per-partition model parameters, the standard partitioned
        analysis (consumers' linked-branches mode). Applies the best
        parameters back to every engine/partition; returns
        (total logL, params, history).

        On Pallas-path engines the model groups route to the fused FD
        optimizer per partition — with branch lengths held fixed the
        joint objective DECOMPOSES exactly (each partition's model
        parameters touch only its own term), so the sequential
        per-partition optimization reaches the same optimum as the
        joint ascent. Branch lengths on Pallas engines belong to the
        Newton machinery (newton_step / newton_smooth_all)."""
        from .optimize import _apply, adam_ascent

        if any(e.use_pallas or e.repeats_dense_fused
               for e in self.engines):
            from . import constants as C
            from .optimize import maximize_fused

            if "branches" in tuple(optimize):
                raise C.PllError(
                    C.ERROR_PARAM_INVALID,
                    "branch lengths on Pallas-path engines are optimized "
                    "by the Newton machinery (newton_step loops); "
                    "maximize() here covers 'subst'/'freqs' only")
            total = 0.0
            params = {}
            history = []
            for i, e in enumerate(self.engines):
                lk, best, hist = maximize_fused(
                    e, optimize, steps=steps,
                    learning_rate=learning_rate, tol=tol,
                    patience=patience, chunk=chunk)
                total += lk
                history.append(hist)
                for k, v in best.items():
                    params[f"p{i}:{k}"] = v
            return total, params, history

        fn, params = self.make_joint_loglikelihood_fn(optimize)
        final, best, history = adam_ascent(
            fn, params, steps=steps, learning_rate=learning_rate,
            tol=tol, patience=patience, chunk=chunk)
        for i, e in enumerate(self.engines):
            qi = {k.split(":", 1)[1]: v for k, v in best.items()
                  if k.startswith(f"p{i}:")}
            if self.linked and "log_branches" in best:
                qi["log_branches"] = best["log_branches"]
            _apply(e, qi)
        return final, best, history
