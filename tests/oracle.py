"""ctypes bridge to the reference libpll-2 as a high-precision test oracle.

Builds a shared library from the reference's generic (non-SIMD, non-parser)
C sources into the gitignored .refbuild/ directory on first use and drives
it through the public API. Used ONLY to generate golden numbers in tests —
no reference code enters the package. Tests that need the oracle are skipped
when /root/reference is unavailable.
"""
from __future__ import annotations

import ctypes as ct
import os
import subprocess
from pathlib import Path

REFERENCE = Path(os.environ.get("PLL_REFERENCE", "/root/reference"))
REPO = Path(__file__).resolve().parent.parent
BUILD_DIR = REPO / ".refbuild"
LIB_PATH = BUILD_DIR / "libpll_ref.so"

SCALE_BUFFER_NONE = -1
GAMMA_RATES_MEAN = 0
GAMMA_RATES_MEDIAN = 1
ATTRIB_RATE_SCALERS = 1 << 9
ATTRIB_PATTERN_TIP = 1 << 4
ATTRIB_AB_LEWIS = 1 << 5
ATTRIB_AB_FELSENSTEIN = 2 << 5
ATTRIB_AB_STAMATAKIS = 3 << 5
ATTRIB_AB_FLAG = 1 << 8
ATTRIB_SITE_REPEATS = 1 << 10


def available() -> bool:
    return (REFERENCE / "src" / "pll.c").exists()


# The flex/bison-generated parser sources don't exist in the image (no
# flex/bison installed), so pll_utree_wraptree — defined in parse_utree.y —
# is shimmed here; only its struct-filling behavior matters for tests.
_WRAPTREE_SHIM = """
#include <stdlib.h>
typedef struct { unsigned int tip_count, inner_count, edge_count;
                 int binary; void ** nodes; void * vroot; } shim_utree;
void * pll_utree_wraptree(void * root, unsigned int tip_count)
{
  shim_utree * t = (shim_utree *)calloc(1, sizeof(shim_utree));
  t->tip_count = tip_count;
  t->inner_count = tip_count - 2;
  t->edge_count = 2 * tip_count - 3;
  t->binary = 1;
  t->vroot = root;
  return t;
}
"""


def _build() -> Path:
    """Compile the oracle .so, safe under concurrent test workers
    (pytest-xdist): an exclusive flock serializes builders and the output
    lands via atomic rename, so a parallel first-use never dlopens a
    half-written library."""
    import fcntl

    BUILD_DIR.mkdir(exist_ok=True)
    with open(BUILD_DIR / ".build.lock", "w") as lockf:
        fcntl.flock(lockf, fcntl.LOCK_EX)
        if LIB_PATH.exists():            # another worker built it first
            return LIB_PATH
        shim = BUILD_DIR / "wraptree_shim.c"
        shim.write_text(_WRAPTREE_SHIM)
        sources = sorted(
            str(p) for p in (REFERENCE / "src").glob("*.c")
            if not any(k in p.name for k in ("_avx", "_sse"))
        ) + [str(shim)]
        tmp = LIB_PATH.with_suffix(f".tmp{os.getpid()}.so")
        cmd = ["gcc", "-O2", "-fPIC", "-shared", "-D_GNU_SOURCE",
               "-o", str(tmp), *sources, "-lm",
               "-Wl,--unresolved-symbols=ignore-all"]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, LIB_PATH)
    return LIB_PATH


class PllOperation(ct.Structure):
    _fields_ = [
        ("parent_clv_index", ct.c_uint),
        ("parent_scaler_index", ct.c_int),
        ("child1_clv_index", ct.c_uint),
        ("child1_matrix_index", ct.c_uint),
        ("child1_scaler_index", ct.c_int),
        ("child2_clv_index", ct.c_uint),
        ("child2_matrix_index", ct.c_uint),
        ("child2_scaler_index", ct.c_int),
    ]


class PllPartition(ct.Structure):
    # mirrors pll_partition_t, pll.h:230-276
    _fields_ = [
        ("tips", ct.c_uint), ("clv_buffers", ct.c_uint), ("nodes", ct.c_uint),
        ("states", ct.c_uint), ("sites", ct.c_uint),
        ("pattern_weight_sum", ct.c_uint),
        ("rate_matrices", ct.c_uint), ("prob_matrices", ct.c_uint),
        ("rate_cats", ct.c_uint), ("scale_buffers", ct.c_uint),
        ("attributes", ct.c_uint),
        ("alignment", ct.c_size_t), ("states_padded", ct.c_uint),
        ("clv", ct.POINTER(ct.POINTER(ct.c_double))),
        ("pmatrix", ct.POINTER(ct.POINTER(ct.c_double))),
        ("rates", ct.POINTER(ct.c_double)),
        ("rate_weights", ct.POINTER(ct.c_double)),
        ("subst_params", ct.POINTER(ct.POINTER(ct.c_double))),
        ("scale_buffer", ct.POINTER(ct.POINTER(ct.c_uint))),
        ("frequencies", ct.POINTER(ct.POINTER(ct.c_double))),
        ("prop_invar", ct.POINTER(ct.c_double)),
        ("invariant", ct.POINTER(ct.c_int)),
        ("pattern_weights", ct.POINTER(ct.c_uint)),
        ("eigen_decomp_valid", ct.POINTER(ct.c_int)),
        ("eigenvecs", ct.POINTER(ct.POINTER(ct.c_double))),
        ("inv_eigenvecs", ct.POINTER(ct.POINTER(ct.c_double))),
        ("eigenvals", ct.POINTER(ct.POINTER(ct.c_double))),
        ("maxstates", ct.c_uint),
        ("tipchars", ct.POINTER(ct.POINTER(ct.c_ubyte))),
        ("charmap", ct.POINTER(ct.c_ubyte)),
        ("ttlookup", ct.POINTER(ct.c_double)),
        ("tipmap", ct.POINTER(ct.c_ulonglong)),
        ("asc_bias_alloc", ct.c_int),
        ("asc_additional_sites", ct.c_int),
        ("repeats", ct.c_void_p),
    ]


class PllParsBuildOp(ct.Structure):
    _fields_ = [("parent_score_index", ct.c_uint),
                ("child1_score_index", ct.c_uint),
                ("child2_score_index", ct.c_uint)]


class PllParsRecOp(ct.Structure):
    _fields_ = [("node_score_index", ct.c_uint),
                ("node_ancestral_index", ct.c_uint),
                ("parent_score_index", ct.c_uint),
                ("parent_ancestral_index", ct.c_uint)]


class PllParsimony(ct.Structure):
    # mirrors pll_parsimony_t, pll.h:457-481
    _fields_ = [
        ("tips", ct.c_uint), ("inner_nodes", ct.c_uint),
        ("sites", ct.c_uint), ("states", ct.c_uint),
        ("attributes", ct.c_uint), ("alignment", ct.c_size_t),
        ("packedvector", ct.POINTER(ct.POINTER(ct.c_uint))),
        ("node_cost", ct.POINTER(ct.c_uint)),
        ("packedvector_count", ct.c_uint),
        ("const_cost", ct.c_uint),
        ("informative", ct.POINTER(ct.c_int)),
        ("informative_count", ct.c_uint),
        ("score_buffers", ct.c_uint), ("ancestral_buffers", ct.c_uint),
        ("score_matrix", ct.POINTER(ct.c_double)),
        ("sbuffer", ct.POINTER(ct.POINTER(ct.c_double))),
        ("anc_states", ct.POINTER(ct.POINTER(ct.c_uint))),
    ]


_lib = None


def load():
    global _lib
    if _lib is None:
        if not LIB_PATH.exists():
            _build()
        _lib = ct.CDLL(str(LIB_PATH), mode=os.RTLD_LAZY)
        _declare(_lib)
        _declare_parsimony(_lib)
    return _lib


def _declare(lib):
    P = ct.POINTER
    lib.pll_partition_create.restype = P(PllPartition)
    lib.pll_partition_create.argtypes = [ct.c_uint] * 8 + [ct.c_uint]
    lib.pll_partition_destroy.argtypes = [P(PllPartition)]
    lib.pll_set_tip_states.restype = ct.c_int
    lib.pll_set_tip_states.argtypes = [P(PllPartition), ct.c_uint,
                                       P(ct.c_ulonglong), ct.c_char_p]
    lib.pll_set_frequencies.argtypes = [P(PllPartition), ct.c_uint,
                                        P(ct.c_double)]
    lib.pll_set_subst_params.argtypes = [P(PllPartition), ct.c_uint,
                                         P(ct.c_double)]
    lib.pll_set_category_rates.argtypes = [P(PllPartition), P(ct.c_double)]
    lib.pll_set_category_weights.argtypes = [P(PllPartition), P(ct.c_double)]
    lib.pll_set_pattern_weights.argtypes = [P(PllPartition), P(ct.c_uint)]
    lib.pll_update_invariant_sites.restype = ct.c_int
    lib.pll_update_invariant_sites.argtypes = [P(PllPartition)]
    lib.pll_set_asc_bias_type.restype = ct.c_int
    lib.pll_set_asc_bias_type.argtypes = [P(PllPartition), ct.c_int]
    lib.pll_set_asc_state_weights.restype = None
    lib.pll_set_asc_state_weights.argtypes = [P(PllPartition), P(ct.c_uint)]
    lib.pll_update_invariant_sites_proportion.restype = ct.c_int
    lib.pll_update_invariant_sites_proportion.argtypes = [
        P(PllPartition), ct.c_uint, ct.c_double]
    lib.pll_compute_gamma_cats.restype = ct.c_int
    lib.pll_compute_gamma_cats.argtypes = [ct.c_double, ct.c_uint,
                                           P(ct.c_double), ct.c_int]
    lib.pll_update_prob_matrices.restype = ct.c_int
    lib.pll_update_prob_matrices.argtypes = [P(PllPartition), P(ct.c_uint),
                                             P(ct.c_uint), P(ct.c_double),
                                             ct.c_uint]
    lib.pll_update_partials.argtypes = [P(PllPartition), P(PllOperation),
                                        ct.c_uint]
    lib.pll_compute_root_loglikelihood.restype = ct.c_double
    lib.pll_compute_root_loglikelihood.argtypes = [
        P(PllPartition), ct.c_uint, ct.c_int, P(ct.c_uint), P(ct.c_double)]
    lib.pll_compute_edge_loglikelihood.restype = ct.c_double
    lib.pll_compute_edge_loglikelihood.argtypes = [
        P(PllPartition), ct.c_uint, ct.c_int, ct.c_uint, ct.c_int,
        ct.c_uint, P(ct.c_uint), P(ct.c_double)]
    lib.pll_compute_node_ancestral.restype = ct.c_int
    lib.pll_compute_node_ancestral.argtypes = [
        P(PllPartition), ct.c_uint, ct.c_int, ct.c_uint, ct.c_int,
        ct.c_uint, P(ct.c_uint), P(ct.c_double)]
    lib.pll_update_sumtable.restype = ct.c_int
    lib.pll_update_sumtable.argtypes = [
        P(PllPartition), ct.c_uint, ct.c_uint, ct.c_int, ct.c_int,
        P(ct.c_uint), P(ct.c_double)]
    lib.pll_compute_likelihood_derivatives.restype = ct.c_int
    lib.pll_compute_likelihood_derivatives.argtypes = [
        P(PllPartition), ct.c_int, ct.c_int, ct.c_double, P(ct.c_uint),
        P(ct.c_double), P(ct.c_double), P(ct.c_double)]


def _declare_parsimony(lib):
    P = ct.POINTER
    lib.pll_parsimony_create.restype = P(PllParsimony)
    lib.pll_parsimony_create.argtypes = [
        ct.c_uint, ct.c_uint, ct.c_uint, P(ct.c_double), ct.c_uint,
        ct.c_uint]
    lib.pll_set_parsimony_sequence.restype = ct.c_int
    lib.pll_set_parsimony_sequence.argtypes = [
        P(PllParsimony), ct.c_uint, P(ct.c_ulonglong), ct.c_char_p]
    lib.pll_parsimony_build.restype = ct.c_double
    lib.pll_parsimony_build.argtypes = [P(PllParsimony), P(PllParsBuildOp),
                                        ct.c_uint]
    lib.pll_parsimony_score.restype = ct.c_double
    lib.pll_parsimony_score.argtypes = [P(PllParsimony), ct.c_uint]
    lib.pll_parsimony_reconstruct.argtypes = [
        P(PllParsimony), P(ct.c_ulonglong), P(PllParsRecOp), ct.c_uint]
    lib.pll_parsimony_destroy.argtypes = [P(PllParsimony)]
    lib.pll_fastparsimony_init.restype = P(PllParsimony)
    lib.pll_fastparsimony_init.argtypes = [P(PllPartition)]
    lib.pll_fastparsimony_update_vectors.argtypes = [
        P(PllParsimony), P(PllParsBuildOp), ct.c_uint]
    lib.pll_fastparsimony_edge_score.restype = ct.c_uint
    lib.pll_fastparsimony_edge_score.argtypes = [P(PllParsimony), ct.c_uint,
                                                 ct.c_uint]
    lib.pll_fastparsimony_root_score.restype = ct.c_uint
    lib.pll_fastparsimony_root_score.argtypes = [P(PllParsimony), ct.c_uint]


def build_ops(ops):
    arr = (PllParsBuildOp * len(ops))()
    for k, o in enumerate(ops):
        arr[k].parent_score_index = o[0]
        arr[k].child1_score_index = o[1]
        arr[k].child2_score_index = o[2]
    return arr


def charmap(name: str):
    lib = load()
    return (ct.c_ulonglong * 256).in_dll(lib, f"pll_map_{name}")


def u32(vals):
    return (ct.c_uint * len(vals))(*[int(v) for v in vals])


def f64(vals):
    return (ct.c_double * len(vals))(*[float(v) for v in vals])


class OraclePartition:
    """Thin pythonic wrapper over a reference partition."""

    def __init__(self, tips, clv_buffers, states, sites, rate_matrices,
                 prob_matrices, rate_cats, scale_buffers, attributes=0):
        self.lib = load()
        self.ptr = self.lib.pll_partition_create(
            tips, clv_buffers, states, sites, rate_matrices,
            prob_matrices, rate_cats, scale_buffers, attributes)
        assert self.ptr, "oracle partition_create failed"
        self.states = states
        self.sites = sites
        self.rate_cats = rate_cats

    @property
    def p(self):
        return self.ptr.contents

    def set_tip_states(self, i, mapname, seq):
        r = self.lib.pll_set_tip_states(self.ptr, i, charmap(mapname),
                                        seq.encode())
        assert r == 1

    def set_frequencies(self, idx, freqs):
        self.lib.pll_set_frequencies(self.ptr, idx, f64(freqs))

    def set_subst_params(self, idx, params):
        self.lib.pll_set_subst_params(self.ptr, idx, f64(params))

    def set_category_rates(self, rates):
        self.lib.pll_set_category_rates(self.ptr, f64(rates))

    def set_category_weights(self, w):
        self.lib.pll_set_category_weights(self.ptr, f64(w))

    def set_pattern_weights(self, w):
        self.lib.pll_set_pattern_weights(self.ptr, u32(w))

    def set_asc_bias_type(self, asc_type):
        r = self.lib.pll_set_asc_bias_type(self.ptr, asc_type)
        assert r == 1

    def set_asc_state_weights(self, weights):
        self.lib.pll_set_asc_state_weights(self.ptr, u32(weights))

    def set_invariant_proportion(self, idx, pinv):
        r = self.lib.pll_update_invariant_sites_proportion(
            self.ptr, idx, pinv)
        assert r == 1

    def update_prob_matrices(self, params_indices, matrix_indices, brlens):
        r = self.lib.pll_update_prob_matrices(
            self.ptr, u32(params_indices), u32(matrix_indices),
            f64(brlens), len(brlens))
        assert r == 1

    def update_partials(self, operations):
        n = len(operations)
        ops = (PllOperation * n)()
        for k, o in enumerate(operations):
            (ops[k].parent_clv_index, ops[k].parent_scaler_index,
             ops[k].child1_clv_index, ops[k].child1_matrix_index,
             ops[k].child1_scaler_index, ops[k].child2_clv_index,
             ops[k].child2_matrix_index, ops[k].child2_scaler_index) = o
        self.lib.pll_update_partials(self.ptr, ops, n)

    def root_loglikelihood(self, clv_index, scaler_index, freqs_indices,
                           persite=False):
        out = (ct.c_double * self.sites)() if persite else None
        logl = self.lib.pll_compute_root_loglikelihood(
            self.ptr, clv_index, scaler_index, u32(freqs_indices), out)
        return (logl, list(out)) if persite else logl

    def edge_loglikelihood(self, p, psc, c, csc, mat, freqs_indices,
                           persite=False):
        out = (ct.c_double * self.sites)() if persite else None
        logl = self.lib.pll_compute_edge_loglikelihood(
            self.ptr, p, psc, c, csc, mat, u32(freqs_indices), out)
        return (logl, list(out)) if persite else logl

    def node_ancestral(self, node, nsc, other, osc, mat, freqs_indices):
        import numpy as np
        out = (ct.c_double * (self.sites * self.states))()
        ok = self.lib.pll_compute_node_ancestral(
            self.ptr, node, nsc, other, osc, mat, u32(freqs_indices), out)
        assert ok == 1
        return np.array(out).reshape(self.sites, self.states)

    def derivatives(self, p, c, psc, csc, params_indices, brlens):
        import numpy as np
        asc = self.p.asc_bias_alloc
        n = (self.sites + (self.states if asc else 0)) * self.rate_cats \
            * self.p.states_padded
        sumtable = (ct.c_double * n)()
        r = self.lib.pll_update_sumtable(self.ptr, p, c, psc, csc,
                                         u32(params_indices), sumtable)
        assert r == 1
        d1 = ct.c_double()
        d2 = ct.c_double()
        out = []
        for b in np.atleast_1d(brlens):
            r = self.lib.pll_compute_likelihood_derivatives(
                self.ptr, psc, csc, float(b), u32(params_indices),
                sumtable, ct.byref(d1), ct.byref(d2))
            assert r == 1
            out.append((d1.value, d2.value))
        return out

    def get_clv(self, index):
        import numpy as np
        p = self.p
        span = p.states_padded * p.rate_cats
        # repeats disabled in oracle usage -> full site count
        n = p.sites + (p.states if p.asc_bias_alloc else 0)
        buf = np.ctypeslib.as_array(p.clv[index], shape=(n * span,))
        arr = buf.reshape(n, p.rate_cats, p.states_padded)
        return arr[:p.sites, :, :p.states].copy()

    def get_pmatrix(self, index):
        import numpy as np
        p = self.p
        size = p.rate_cats * p.states * p.states_padded
        buf = np.ctypeslib.as_array(p.pmatrix[index], shape=(size,))
        arr = buf.reshape(p.rate_cats, p.states, p.states_padded)
        return arr[:, :, :p.states].copy()

    def get_scaler(self, index):
        import numpy as np
        p = self.p
        n = p.sites * (p.rate_cats if (p.attributes & ATTRIB_RATE_SCALERS)
                       else 1)
        return np.ctypeslib.as_array(p.scale_buffer[index], shape=(n,)).copy()

    def destroy(self):
        if self.ptr:
            self.lib.pll_partition_destroy(self.ptr)
            self.ptr = None


def gamma_cats(alpha, n, mode=GAMMA_RATES_MEAN):
    lib = load()
    rates = (ct.c_double * n)()
    r = lib.pll_compute_gamma_cats(alpha, n, rates, mode)
    assert r == 1
    return list(rates)
