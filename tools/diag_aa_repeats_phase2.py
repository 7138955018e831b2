"""Phase attribution for the aa_repeats on-chip d1 bias (no x64):

compute the root-edge CLVs ON CHIP (fp32, pool path), pull them to the
host, and run the ENTIRE derivative phase (sumtable + diagptable +
site ratios + reduction) in numpy fp64. If host-fp64 phase 2 over
chip CLVs reproduces the fp64 reference d1, phase 2 on chip is the
culprit; if it reproduces the chip's biased d1, the CLVs carry it.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench_validate import _build, _problems


def host_phase2(clv_p, clv_c, part, blen, params_index=0):
    """fp64 numpy sumtable + derivatives (per-site scaler mode: scalers
    cancel in the L'/L ratios, so none are needed)."""
    R = part.rate_cats
    f = part.frequencies[params_index]                      # [s]
    a = part.inv_eigenvecs[params_index]                    # [s, s]
    b = part.eigenvecs[params_index]
    lam = part.eigenvals[params_index]                      # [s]
    rates = part.rates
    w = part.rate_weights
    pinv = part.prop_invar[params_index]

    # sumtable[r, j, s]
    left = np.einsum('rks,kj->rjs', clv_p * f[None, :, None], a)
    right = np.einsum('jk,rks->rjs', b, clv_c)
    st = left * right
    x = lam[None, :] * (rates / (1.0 - pinv))[:, None]      # [R, s]
    e = np.exp(x * blen)
    diagp = np.stack([e, x * e, x * x * e])                 # [3, R, s]
    cat = np.einsum('rjs,drj->drs', st, diagp)
    site = np.einsum('drs,r->ds', cat, w)
    pw = np.asarray(part.pattern_weights, np.float64)
    valid = pw > 0
    lk0 = np.where(valid & (site[0] != 0), site[0], 1.0)
    d1v = -site[1] / lk0
    d2v = d1v * d1v - site[2] / lk0
    return float(np.sum(pw * valid * d1v)), \
        float(np.sum(pw * valid * d2v))


def main():
    cases = {name: (tree, h, s, bkw, ekw)
             for name, tree, h, s, bkw, ekw in _problems()}
    name = sys.argv[1] if len(sys.argv) > 1 else "aa_repeats"
    tree, h, s, bkw, ekw = cases[name]
    from libpll2_tpu import TreeEngine

    print("device:", jax.devices()[0].platform)
    p32 = _build(tree, h, s, dtype=jnp.float32, **bkw)
    e32 = TreeEngine(p32, tree, pallas=False, **ekw)
    b0 = e32.branches
    lk32, d1_32, d2_32 = e32.newton_step()
    e32.branches = b0
    print(f"chip full : lk={lk32:.6f} d1={d1_32:.8e} d2={d2_32:.8e}")

    root = e32.root_idx
    ri = [int(x) for x in np.asarray(root)]
    # get_clv returns [sites, R, s] (reference order); -> [R, s, S]
    clv_p = np.transpose(np.asarray(p32.get_clv(ri[0]), np.float64),
                         (1, 2, 0))
    clv_c = np.transpose(np.asarray(p32.get_clv(ri[2]), np.float64),
                         (1, 2, 0))
    S = p32.sites_padded
    if clv_p.shape[-1] < S:
        pad = S - clv_p.shape[-1]
        clv_p = np.pad(clv_p, [(0, 0), (0, 0), (0, pad)])
        clv_c = np.pad(clv_c, [(0, 0), (0, 0), (0, pad)])
    blen = float(np.asarray(b0)[ri[4]])
    d1h, d2h = host_phase2(clv_p, clv_c, p32, blen)
    print(f"chip CLVs + host-fp64 phase2: d1={d1h:.8e} d2={d2h:.8e}")
    d1s, d2s = host_phase2_fp32(clv_p, clv_c, p32, blen)
    print(f"chip CLVs + host-FP32 phase2 (correctly rounded): "
          f"d1={d1s:.8e} d2={d2s:.8e}")
    d1m, d2m = host_phase2_mixed(clv_p, clv_c, p32, blen)
    print(f"chip CLVs + fp32 phase2, fp64 diagp+ratios: "
          f"d1={d1m:.8e} d2={d2m:.8e}")

    # full phase 2 ON CHIP, with diagp either computed on chip (exp on
    # TPU) or shipped from host fp64 correctly rounded to fp32
    def chip_phase2(st, diagp, w, pw):
        cat = jnp.einsum('rjs,drj->drs', st, diagp,
                         precision=jax.lax.Precision.HIGHEST)
        site = jnp.einsum('drs,r->ds', cat, w,
                          precision=jax.lax.Precision.HIGHEST)
        valid = pw > 0
        lk0 = jnp.where(valid & (site[0] != 0), site[0], 1.0)
        d1v = -site[1] / lk0
        d2v = d1v * d1v - site[2] / lk0
        pwf = jnp.where(valid, pw.astype(jnp.float32), 0.0)
        return jnp.sum(pwf * d1v), jnp.sum(pwf * d2v)

    f32 = np.float32
    f = p32.frequencies[0].astype(f32)
    a = p32.inv_eigenvecs[0].astype(f32)
    b = p32.eigenvecs[0].astype(f32)
    cp = jnp.asarray(clv_p, jnp.float32)
    cc = jnp.asarray(clv_c, jnp.float32)
    HI = jax.lax.Precision.HIGHEST
    left = jnp.einsum('rks,kj->rjs', cp * f[None, :, None],
                      jnp.asarray(a), precision=HI)
    right = jnp.einsum('jk,rks->rjs', jnp.asarray(b), cc, precision=HI)
    st = left * right
    lam = p32.eigenvals[0]
    x64 = lam[None, :] * (p32.rates / 1.0)[:, None]
    pw_dev = jnp.asarray(np.asarray(p32.pattern_weights))
    w_dev = jnp.asarray(p32.rate_weights.astype(f32))

    # (a) diagp computed on chip: exp on TPU
    x_dev = jnp.asarray(x64.astype(f32))
    e_dev = jnp.exp(x_dev * f32(blen))
    diagp_chip = jnp.stack([e_dev, x_dev * e_dev, x_dev * x_dev * e_dev])
    d1c, d2c = jax.jit(chip_phase2)(st, diagp_chip, w_dev, pw_dev)
    print(f"chip st + chip einsums + CHIP exp:  d1={float(d1c):.8e} "
          f"d2={float(d2c):.8e}")

    # (b) diagp from host fp64, correctly rounded to fp32
    e64 = np.exp(x64 * blen)
    diagp_host = np.stack([e64, x64 * e64, x64 * x64 * e64]).astype(f32)
    d1b, d2b = jax.jit(chip_phase2)(st, jnp.asarray(diagp_host),
                                    w_dev, pw_dev)
    print(f"chip st + chip einsums + HOST exp:  d1={float(d1b):.8e} "
          f"d2={float(d2b):.8e}")


def host_phase2_fp32(clv_p, clv_c, part, blen, params_index=0):
    """All-fp32 (correctly rounded host ops) phase 2 — what an ideal
    chip fp32 implementation could achieve."""
    f32 = np.float32
    f = part.frequencies[params_index].astype(f32)
    a = part.inv_eigenvecs[params_index].astype(f32)
    b = part.eigenvecs[params_index].astype(f32)
    lam = part.eigenvals[params_index].astype(f32)
    rates = part.rates.astype(f32)
    w = part.rate_weights.astype(f32)
    pinv = f32(part.prop_invar[params_index])
    cp = clv_p.astype(f32)
    cc = clv_c.astype(f32)
    left = np.einsum('rks,kj->rjs', cp * f[None, :, None], a).astype(f32)
    right = np.einsum('jk,rks->rjs', b, cc).astype(f32)
    st = (left * right).astype(f32)
    x = (lam[None, :] * (rates / (f32(1.0) - pinv))[:, None]).astype(f32)
    e = np.exp((x * f32(blen)).astype(f32)).astype(f32)
    diagp = np.stack([e, x * e, x * x * e]).astype(f32)
    cat = np.einsum('rjs,drj->drs', st, diagp).astype(f32)
    site = np.einsum('drs,r->ds', cat, w).astype(f32)
    pw = np.asarray(part.pattern_weights, np.float64)
    valid = pw > 0
    lk0 = np.where(valid & (site[0] != 0), site[0], 1.0).astype(f32)
    d1v = (-site[1] / lk0).astype(f32)
    d2v = (d1v * d1v - site[2] / lk0).astype(f32)
    return float(np.sum(pw * valid * d1v.astype(np.float64))), \
        float(np.sum(pw * valid * d2v.astype(np.float64)))


def host_phase2_mixed(clv_p, clv_c, part, blen, params_index=0):
    """fp32 sumtable/cat einsums, but diagp and the final site ratios in
    fp64 — isolates exp + ratio cancellation from the dot products."""
    f32 = np.float32
    f = part.frequencies[params_index].astype(f32)
    a = part.inv_eigenvecs[params_index].astype(f32)
    b = part.eigenvecs[params_index].astype(f32)
    lam = part.eigenvals[params_index]
    rates = part.rates
    w = part.rate_weights
    pinv = part.prop_invar[params_index]
    cp = clv_p.astype(f32)
    cc = clv_c.astype(f32)
    left = np.einsum('rks,kj->rjs', cp * f[None, :, None], a).astype(f32)
    right = np.einsum('jk,rks->rjs', b, cc).astype(f32)
    st = (left * right).astype(np.float64)
    x = lam[None, :] * (rates / (1.0 - pinv))[:, None]
    e = np.exp(x * blen)
    diagp = np.stack([e, x * e, x * x * e])
    cat = np.einsum('rjs,drj->drs', st, diagp)
    site = np.einsum('drs,r->ds', cat, w)
    pw = np.asarray(part.pattern_weights, np.float64)
    valid = pw > 0
    lk0 = np.where(valid & (site[0] != 0), site[0], 1.0)
    d1v = -site[1] / lk0
    d2v = d1v * d1v - site[2] / lk0
    return float(np.sum(pw * valid * d1v)), \
        float(np.sum(pw * valid * d2v))


if __name__ == "__main__":
    main()
