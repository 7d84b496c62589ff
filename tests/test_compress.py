"""Batched-affine pair-compression tests (interpret mode on CPU).

No reference analogue: the reference SMVP adds every source point
individually (``smvp.template.wgsl:70-79``); compression is a TPU-side
op-count optimization. The oracle is the same CPU curve used everywhere.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from msm_tpu.models import common
from msm_tpu.models.cuzk import compute_msm_jpoint
from msm_tpu.models.geometry import MsmGeometry
from msm_tpu.ops.curve import get_curve_ctx, set_pallas_mode
from msm_tpu.ops.pallas_compress import compress_pairs
from msm_tpu.oracle import best_msm
from msm_tpu.oracle.pyecc import Curve
from msm_tpu.params import BN254, MsmConfig
from msm_tpu.utils.limbs import limbs_to_int

CV = Curve(BN254)


@pytest.fixture
def interpret_mode():
    set_pallas_mode("interpret")
    yield
    set_pallas_mode("auto")


def test_compress_pairs_exact(interpret_mode):
    """Every pair sum (generic add, doubling, P + (-P) infinity) must match
    the oracle; infinity pairs must be flagged, never mis-valued."""
    cfg = MsmConfig(curve=BN254)
    ec = get_curve_ctx(cfg)
    C, R = 8, 256
    n = C * R
    base_j = CV.sample_points(16, seed=3)
    base = [CV.to_affine(p) for p in base_j]
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 16, size=n)
    signs = rng.integers(0, 2, size=n)
    for t in range(0, n, 16):  # plant doubling pairs
        idx[t + 1] = idx[t]
        signs[t + 1] = signs[t]
    for t in range(8, n, 32):  # plant infinity pairs
        idx[t + 1] = idx[t]
        signs[t + 1] = 1 - signs[t]
    pts_a = [base[i] for i in idx]
    x_u16, y_u16, _ = common.pad_inputs(pts_a, [0] * n, cfg)
    pts = common.u16_to_mont_points(
        ec, jnp.asarray(x_u16)[:n], jnp.asarray(y_u16)[:n]
    )
    packed = common.pack_points(pts, cfg)
    D = packed.shape[-1] // 2
    # element (c, r) = stream position r*C + c (lane-contiguous chains)
    gxy = packed.reshape(R, C, 2 * D).swapaxes(0, 1).swapaxes(1, 2)
    sg3 = (
        jnp.asarray(signs, jnp.int32).reshape(R, C).swapaxes(0, 1)
        .reshape(C, 1, R)
    )
    cx, cy, inf = compress_pairs(cfg, gxy, sg3, interpret=True)
    cx, cy, inf = np.asarray(cx), np.asarray(cy), np.asarray(inf)
    p = BN254.modulus
    rinv = pow(cfg.r, -1, p)
    ninf = 0
    for r in range(0, R, 7):
        for cp in range(C // 2):
            i1, i2 = r * C + 2 * cp, r * C + 2 * cp + 1
            e1, e2 = base_j[idx[i1]], base_j[idx[i2]]
            if signs[i1]:
                e1 = CV.neg(e1)
            if signs[i2]:
                e2 = CV.neg(e2)
            s = CV.add(e1, e2)
            if s.z % p == 0:
                assert inf[cp, 0, r] == 1, (r, cp)
                ninf += 1
            else:
                assert inf[cp, 0, r] == 0, (r, cp)
                sx, sy = CV.to_affine(s)
                vx = limbs_to_int(cx[cp, :, r].astype(np.int64), cfg.word_size)
                vy = limbs_to_int(cy[cp, :, r].astype(np.int64), cfg.word_size)
                assert (vx * rinv) % p == sx, (r, cp)
                assert (vy * rinv) % p == sy, (r, cp)
    assert ninf > 0  # the adversarial stream must exercise the inf path


def _rand_msm(n, seed):
    rng = np.random.default_rng(seed)
    base = [CV.to_affine(p) for p in CV.sample_points(64, seed=13)]
    pts = [base[i % len(base)] for i in range(n)]
    ks = [
        int.from_bytes(rng.bytes(32), "little") % BN254.order
        for _ in range(n)
    ]
    return pts, ks


@pytest.mark.slow  # frozen feature: full tier
def test_compressed_pipeline_e2e(interpret_mode):
    """Full production pipeline with cfg.compress: fused convert -> gather
    -> pair compression (fwd/inv/bwd) -> limbs_skip scan -> odd-boundary
    corrected extraction -> telescoped reduction, vs the oracle."""
    n = 8192
    pts, ks = _rand_msm(n, 42)
    cfg = MsmConfig(curve=BN254, chunk_size=8, compress=True)
    geom = MsmGeometry(num_rows=256, bpr_threads=64, subtask_batch=4)
    got = compute_msm_jpoint(pts, ks, config=cfg, geometry=geom)
    want = best_msm(pts, ks)
    assert CV.eq(got, want)


@pytest.mark.slow
def test_compressed_glv_pipeline_e2e(interpret_mode):
    """compress x glv composition (the production 2^20 configuration's
    feature set) at reduced scale."""
    n = 4096
    pts, ks = _rand_msm(n, 7)
    cfg = MsmConfig(curve=BN254, chunk_size=8, compress=True, glv=True)
    geom = MsmGeometry(num_rows=256, bpr_threads=64, subtask_batch=4)
    got = compute_msm_jpoint(pts, ks, config=cfg, geometry=geom)
    want = best_msm(pts, ks)
    assert CV.eq(got, want)


@pytest.mark.slow
@pytest.mark.parametrize("curve_name", ["BLS12_377", "PALLAS"])
def test_compress_pairs_other_curves(interpret_mode, curve_name):
    """Limb-geometry genericity of the compression kernels: BLS12-377
    (30 limbs, 12 dense words) and Pasta (21 limbs — odd, top limb
    dropped by the dense pack plan)."""
    from msm_tpu.params import BLS12_377, PALLAS

    curve = {"BLS12_377": BLS12_377, "PALLAS": PALLAS}[curve_name]
    cfg = MsmConfig(curve=curve)
    ec = get_curve_ctx(cfg)
    cv = Curve(curve)
    C, R = 4, 256
    n = C * R
    base_j = cv.sample_points(8, seed=5)
    base = [cv.to_affine(p) for p in base_j]
    rng = np.random.default_rng(6)
    idx = rng.integers(0, 8, size=n)
    signs = rng.integers(0, 2, size=n)
    for t in range(0, n, 8):
        idx[t + 1] = idx[t]
        signs[t + 1] = signs[t]  # doubling
    for t in range(4, n, 16):
        idx[t + 1] = idx[t]
        signs[t + 1] = 1 - signs[t]  # infinity
    pts_a = [base[i] for i in idx]
    x_u16, y_u16, _ = common.pad_inputs(pts_a, [0] * n, cfg)
    pts = common.u16_to_mont_points(
        ec, jnp.asarray(x_u16)[:n], jnp.asarray(y_u16)[:n]
    )
    packed = common.pack_points(pts, cfg)
    D = packed.shape[-1] // 2
    gxy = packed.reshape(R, C, 2 * D).swapaxes(0, 1).swapaxes(1, 2)
    sg3 = (
        jnp.asarray(signs, jnp.int32).reshape(R, C).swapaxes(0, 1)
        .reshape(C, 1, R)
    )
    cx, cy, inf = compress_pairs(cfg, gxy, sg3, interpret=True)
    cx, cy, inf = np.asarray(cx), np.asarray(cy), np.asarray(inf)
    p = curve.modulus
    rinv = pow(cfg.r, -1, p)
    for r in range(0, R, 17):
        for cp in range(C // 2):
            i1, i2 = r * C + 2 * cp, r * C + 2 * cp + 1
            e1, e2 = base_j[idx[i1]], base_j[idx[i2]]
            if signs[i1]:
                e1 = cv.neg(e1)
            if signs[i2]:
                e2 = cv.neg(e2)
            s = cv.add(e1, e2)
            if s.z % p == 0:
                assert inf[cp, 0, r] == 1, (r, cp)
            else:
                assert inf[cp, 0, r] == 0, (r, cp)
                sx, sy = cv.to_affine(s)
                vx = limbs_to_int(cx[cp, :, r].astype(np.int64), cfg.word_size)
                vy = limbs_to_int(cy[cp, :, r].astype(np.int64), cfg.word_size)
                assert (vx * rinv) % p == sx, (r, cp)
                assert (vy * rinv) % p == sy, (r, cp)


def test_mont_pow_kernel_vs_field_ctx(interpret_mode):
    """The in-VMEM Fermat-inversion kernel (ops/pallas_inv.py) must match
    FieldCtx.mont_pow bit-for-bit after canonicalization, including the
    Montgomery-domain contract pow(aR, p-2) = a^{-1} R."""
    from msm_tpu.ops.field import get_field_ctx
    from msm_tpu.ops.pallas_inv import make_mont_pow

    cfg = MsmConfig(curve=BN254)
    f = get_field_ctx(cfg)
    L = cfg.num_words
    R = 128
    rng = np.random.default_rng(3)
    vals = [int(rng.integers(1, 2**62)) ** 4 % BN254.modulus for _ in range(R)]
    vals[0] = 1
    vals[1] = BN254.modulus - 1
    a = jnp.asarray(
        np.stack(
            [
                np.array(
                    [(v * cfg.r % BN254.modulus >> (cfg.word_size * j))
                     & cfg.mask for j in range(L)],
                    np.int64,
                )
                for v in vals
            ],
            axis=1,
        ),
        jnp.int32,
    )  # [L, R] Montgomery-form canonical limbs
    e = BN254.modulus - 2
    got = make_mont_pow(cfg, R, e, interpret=True)(a)
    want = f.mont_pow(a.T, e).T
    gc = np.asarray(f.canonical(got.T))
    wc = np.asarray(f.canonical(want.T))
    assert (gc == wc).all()
    # value check: inv in Montgomery domain
    for r in range(0, R, 13):
        v = limbs_to_int(gc[r].astype(np.int64), cfg.word_size)
        assert v == pow(vals[r], -1, BN254.modulus) * cfg.r % BN254.modulus
