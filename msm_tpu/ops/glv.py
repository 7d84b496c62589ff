"""GLV endomorphism decomposition — halves the window count for 2x points.

Curves with j-invariant 0 (every shipped curve: BN254, BLS12-377, Pasta —
all have a = 0) carry an efficient endomorphism phi(x, y) = (beta*x, y) with
phi(P) = lambda*P, where beta/lambda are primitive cube roots of unity in
Fq/Fr. Any scalar k then splits as k = k1 + k2*lambda (mod r) with
|k1|, |k2| ~ sqrt(r), so

    sum k_i P_i  =  sum k1_i P_i + sum k2_i phi(P_i)

— an MSM over 2n points with HALF-length scalars: the per-(point, window)
scan work is unchanged (2n points x S/2 windows), but every per-bucket cost
(histogram, boundary gathers, telescoped reduction, Horner) halves with the
window count, and phi costs ONE field multiply per point (folded into the
stage-1 convert constant: x*beta*R = mont_mul(x, beta*R^2)).

The reference has no GLV (it processes all 16 windows of the full scalar,
``src/cuzk/msm.rs:79-82``); this is a TPU-budget-driven addition, gated by
``MsmConfig.glv``.

Derivation is numeric from the curve spec alone (cube roots by
exponentiation, lattice basis by Gauss reduction, phi<->lambda matching
verified against the oracle) — no magic constants.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from msm_tpu.params import CurveSpec

#: fixed-point precision of the device Babai rounding; large enough that
#: truncation shifts c1/c2 by at most one unit (error < 2^(256-M) per
#: product), which moves (k1, k2) by at most one basis vector.
M_BITS = 320


def _cube_root_of_unity(p: int) -> int:
    """A primitive cube root of unity mod p (requires p % 3 == 1)."""
    assert p % 3 == 1, p
    e = (p - 1) // 3
    for g in range(2, 100):
        c = pow(g, e, p)
        if c != 1:
            assert pow(c, 3, p) == 1 and c != 1
            return c
    raise AssertionError("no cube root found")


def _gauss_reduce(u, v, dot=lambda a, b: a[0] * b[0] + a[1] * b[1]):
    """Lagrange-Gauss reduction of a rank-2 integer lattice basis."""
    while True:
        if dot(u, u) > dot(v, v):
            u, v = v, u
        m = round(dot(u, v) / dot(u, u))
        if m == 0:
            return u, v
        v = (v[0] - m * u[0], v[1] - m * u[1])


@dataclass(frozen=True)
class GlvParams:
    beta: int  # cube root of unity in Fq: phi(x, y) = (beta*x, y)
    lam: int  # matching cube root of unity in Fr: phi(P) = lam*P
    v1: tuple[int, int]  # short lattice basis of {(a, b): a + b*lam = 0 (r)}
    v2: tuple[int, int]
    g1: int  # floor(v2[1] * 2^M / r)   (Babai rounding multipliers)
    g2: int  # floor(-v1[1] * 2^M / r)
    max_component: int  # worst-case |k1|, |k2| incl. device truncation slop

    @property
    def half_bits(self) -> int:
        return self.max_component.bit_length()


@functools.lru_cache(maxsize=None)
def glv_params(curve: CurveSpec) -> GlvParams:
    """Derive (beta, lambda, reduced basis, rounding constants) for an a=0
    curve and verify phi(G) == lambda*G against the oracle."""
    assert curve.a == 0, "GLV cube-root endomorphism needs a = 0"
    r, q = curve.order, curve.modulus
    lam_c = _cube_root_of_unity(r)
    beta_c = _cube_root_of_unity(q)

    # match the (beta, lambda) pair on the generator via the oracle
    from msm_tpu.oracle.pyecc import Curve

    cv = Curve(curve)
    G = cv.from_affine(curve.gx, curve.gy)
    beta = lam = None
    for lc in (lam_c, pow(lam_c, 2, r)):
        want = cv.to_affine(cv.scalar_mul(G, lc))
        for bc in (beta_c, pow(beta_c, 2, q)):
            if ((curve.gx * bc) % q, curve.gy) == want:
                beta, lam = bc, lc
    assert beta is not None, "no (beta, lambda) pairing matched phi(G)"

    v1, v2 = _gauss_reduce((r, 0), (-lam % r, 1))
    # det of the reduced basis is +-r; fix signs so det = +r (then the Babai
    # inverse uses (v2[1], -v1[1]) / r)
    det = v1[0] * v2[1] - v1[1] * v2[0]
    if det < 0:
        v2 = (-v2[0], -v2[1])
        det = -det
    assert det == r, det
    # sign-normalize so both Babai multipliers are NONNEGATIVE — the device
    # split decomposes g1/g2 into unsigned u8 words, so negative values
    # (Pasta's reduced basis comes out with both second components flipped)
    # would silently corrupt the split. Flipping BOTH vectors preserves det.
    if v2[1] < 0 and v1[1] > 0:
        v1 = (-v1[0], -v1[1])
        v2 = (-v2[0], -v2[1])
    assert v2[1] > 0 and v1[1] <= 0, (v1, v2)
    g1 = (v2[1] << M_BITS) // r
    g2 = ((-v1[1]) << M_BITS) // r
    # Babai with EXACT half-up rounding (split_scalar / split_scalars_device
    # correct the floored-multiplier candidates by the exact remainder, so
    # |c_j - k*b_j/r| <= 1/2 rigorously):  |k_i| <= (|v1_i| + |v2_i|)/2.
    # This tight bound is what lets a 254-bit order keep 8 chunk-16 windows
    # with the top signed digit provably <= 2^15 (ops/decompose.py): the
    # earlier one-sided truncation slop admitted |k_i| up to ~3x this, whose
    # top window could exceed the 2^15+1 bucket range for extremal scalars.
    max_c = max(
        (abs(v1[0]) + abs(v2[0]) + 1) // 2,
        (abs(v1[1]) + abs(v2[1]) + 1) // 2,
    )
    return GlvParams(
        beta=beta, lam=lam, v1=v1, v2=v2, g1=g1, g2=g2, max_component=max_c
    )


def split_scalar(k: int, glv: GlvParams, r: int) -> tuple[int, int]:
    """Host-reference Babai split: k = k1 + k2*lambda (mod r), with EXACT
    half-up rounding so |k_i| <= glv.max_component rigorously.

    The g_j multipliers are floored to M_BITS precision, which can leave the
    candidate c_j ONE below round-half-up(k*b_j/r) (never above: the error
    k*(b_j*2^M/r - g_j)/2^M lies in [0, 2^-66)). Correct by the exact
    remainder: c_j is exact iff t = k*b_j - c_j*r lands in (-r/2, r/2]."""
    c1 = (k * glv.g1 + (1 << (M_BITS - 1))) >> M_BITS
    c2 = (k * glv.g2 + (1 << (M_BITS - 1))) >> M_BITS
    b1, b2 = glv.v2[1], -glv.v1[1]
    if 2 * (k * b1 - c1 * r) > r:
        c1 += 1
    if 2 * (k * b2 - c2 * r) > r:
        c2 += 1
    k1 = k - c1 * glv.v1[0] - c2 * glv.v2[0]
    k2 = -c1 * glv.v1[1] - c2 * glv.v2[1]
    assert (k1 + k2 * glv.lam - k) % r == 0
    assert abs(k1) <= glv.max_component and abs(k2) <= glv.max_component
    return k1, k2


# ---------------------------------------------------------------------------
# Device split: [n, 16] u16 scalar words -> (|k1|, |k2|) u16 words + signs
# ---------------------------------------------------------------------------


def _u16_words(v: int, n: int) -> np.ndarray:
    return np.array([(v >> (16 * i)) & 0xFFFF for i in range(n)], np.int32)


def split_scalars_device(s_u16: jax.Array, cfg) -> tuple[
    jax.Array, jax.Array, jax.Array, jax.Array
]:
    """Vectorized GLV split on device.

    In: [n, 16] u16 words (LE) of k < r.
    Out: (k1_u16 [n, W], neg1 [n] bool, k2_u16 [n, W], neg2 [n] bool) with
    W = ceil((half_bits + 1)/16) words of |k_i|.

    All products are exact: u16 words split to 8-bit halves so every
    int32 lane accumulation stays < 2^22 before carry propagation.
    """
    return _split_scalars_device(s_u16, cfg, glv_params(cfg.curve))


@functools.partial(jax.jit, static_argnames=("cfg", "glv"))
def _split_scalars_device(
    s_u16: jax.Array, cfg, glv: GlvParams
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """split_scalars_device with the GlvParams injected — tests degrade the
    g_j multipliers (g_j - 2^62 keeps candidates within one of exact) to
    force the rounding-correction branch on a measurable fraction of rows,
    which no practically-findable scalar does for the true g_j (the natural
    trigger window is ~2^-66 wide)."""
    n = s_u16.shape[0]
    W = -(-(glv.half_bits + 1) // 16)  # |k_i| words (+1 bit headroom)

    def to_u8(words, nw):
        """[n, nw] u16 -> [n, 2*nw] u8 words."""
        lo = words & 0xFF
        hi = (words >> 8) & 0xFF
        return jnp.stack([lo, hi], axis=-1).reshape(n, 2 * nw)

    def mul_high(k8, g: int, g_words: int, shift_words: int, out_words: int):
        """floor((k * g + 2^(M-1)) >> 16*shift_words) low out_words u16
        words, with k given as u8 words [n, 32] and g a python int.
        Exact: column sums of u8*u8 products (+ bias) stay < 2^31."""
        gw = np.array(
            [(g >> (8 * i)) & 0xFF for i in range(g_words)], np.int32
        )
        half = 1 << (M_BITS - 1)
        nk = k8.shape[1]
        # accumulate u8-product columns with running carry, LSB-first;
        # only columns >= 2*shift_words-ish matter but carries flow from
        # below, so walk all columns (cheap: one [n] lane op per column)
        outs = []
        carry = jnp.zeros((n,), jnp.int32)
        for c in range(2 * shift_words + 2 * out_words):
            jlo = max(0, c - nk + 1)
            jhi = min(c, g_words - 1)
            s = carry
            for j in range(jlo, jhi + 1):
                s = s + k8[:, c - j] * np.int32(gw[j])
            b = (half >> (8 * c)) & 0xFF if 8 * c < M_BITS else 0
            if b:
                s = s + np.int32(b)
            if c >= 2 * shift_words:
                outs.append(s & 0xFF)
            carry = s >> 8
        o8 = jnp.stack(outs, axis=-1)  # [n, 2*out_words] u8
        return o8[:, 0::2] | (o8[:, 1::2] << 8)  # u16 words

    def mul_low(a_u16, b: int, aw: int, out_words: int, negate: bool):
        """(a * b) mod 2^(16*out_words) as u16 words; b a python int
        (reduced mod 2^(16*out_words)); sign folded by negating b."""
        mod = 1 << (16 * out_words)
        bb = (-b if negate else b) % mod
        b8 = np.array(
            [(bb >> (8 * i)) & 0xFF for i in range(2 * out_words)], np.int32
        )
        a8 = to_u8(a_u16, aw)
        outs = []
        carry = jnp.zeros((n,), jnp.int32)
        for c in range(2 * out_words):
            s = carry
            for j in range(0, c + 1):
                if j < len(b8) and c - j < a8.shape[1]:
                    if int(b8[j]):
                        s = s + a8[:, c - j] * np.int32(int(b8[j]))
            outs.append(s & 0xFF)
            carry = s >> 8
        o8 = jnp.stack(outs, axis=-1)
        return o8[:, 0::2] | (o8[:, 1::2] << 8)

    k8 = to_u8(s_u16, 16)
    CW = 9  # c1/c2 word count: |c_i| < 2^127ish << 2^144
    TW = W + 1  # two's-complement working width for k1/k2
    c1 = mul_high(k8, glv.g1, -(-glv.g1.bit_length() // 8), M_BITS // 16, CW)
    c2 = mul_high(k8, glv.g2, -(-glv.g2.bit_length() // 8), M_BITS // 16, CW)

    # --- exact-rounding correction (mirrors split_scalar): the floored g_j
    # leaves c_j at most ONE below round-half-up(k*b_j/r). Detect via the
    # remainder t = k*b_j - c_j*r computed in a mod-2^(16*RW) window: an
    # exact candidate gives t in (-r/2, r/2]; a one-low candidate gives
    # t in (r/2, 3r/2]. The upper guard must be exactly 3r/2 — negative t
    # wraps above 2^(16*RW) - r/2, which exceeds 3r/2 for every supported
    # order but NOT 2r when the order is dense (BLS12-381: 2^256 - r/2 <
    # 2r, so a 2r guard misfires on t near -r/2). "r/2 < t <= 3r/2" flags
    # exactly the rows needing c_j += 1. This makes |k_i| <= max_component
    # RIGOROUS — and
    # with it the top signed window digit <= 2^15 for every input scalar,
    # not just generically random ones.
    r_int = int(cfg.curve.order)
    # remainder window: 17 words (272 bits), NOT 16 — the guard constant
    # 3r/2 exceeds 2^256 for a full 256-bit order (secp256k1), and a
    # truncated constant would disable the correction exactly where it
    # matters. 2^272 - r/2 > 3r/2 keeps the wrap disjoint for all r < 2^256.
    RW = 17

    def add_words(a, b, width):
        out = []
        carry = jnp.zeros((n,), jnp.int32)
        for i in range(width):
            v = a[:, i] + b[:, i] + carry
            out.append(v & 0xFFFF)
            carry = v >> 16
        return jnp.stack(out, axis=-1)

    def gt_const(t, v: int):
        """Unsigned 16*RW-bit t > v, lexicographic from the top word."""
        gt = eq = None
        for i in reversed(range(RW)):
            w = np.int32((v >> (16 * i)) & 0xFFFF)
            gi = t[:, i] > w
            ei = t[:, i] == w
            gt = gi if gt is None else gt | (eq & gi)
            eq = ei if eq is None else eq & ei
        return gt

    def round_correct(c, b: int):
        kb = mul_low(s_u16, b, 16, RW, negate=False)
        cr = mul_low(c, r_int, CW, RW, negate=True)
        t = add_words(kb, cr, RW)
        corr = gt_const(t, r_int // 2) & ~gt_const(t, (3 * r_int) // 2)
        out = []
        carry = corr.astype(jnp.int32)
        for i in range(CW):
            v = c[:, i] + carry
            out.append(v & 0xFFFF)
            carry = v >> 16
        return jnp.stack(out, axis=-1)

    c1 = round_correct(c1, glv.v2[1])
    c2 = round_correct(c2, -glv.v1[1])

    def tc_add(a, b):
        """u16-word two's-complement add with carry propagation, width TW."""
        s = a + b
        out = []
        carry = jnp.zeros((n,), jnp.int32)
        for i in range(TW):
            v = s[:, i] + carry
            out.append(v & 0xFFFF)
            carry = v >> 16
        return jnp.stack(out, axis=-1)

    # k1 = k - c1*v1[0] - c2*v2[0]   (mod 2^(16*TW), two's complement)
    kk = jnp.concatenate(
        [s_u16[:, :TW]]
        if s_u16.shape[1] >= TW
        else [s_u16, jnp.zeros((n, TW - s_u16.shape[1]), s_u16.dtype)],
        axis=1,
    )[:, :TW]
    p11 = mul_low(c1, glv.v1[0], CW, TW, negate=True)
    p21 = mul_low(c2, glv.v2[0], CW, TW, negate=True)
    k1 = tc_add(tc_add(kk.astype(jnp.int32), p11), p21)
    p12 = mul_low(c1, glv.v1[1], CW, TW, negate=True)
    p22 = mul_low(c2, glv.v2[1], CW, TW, negate=True)
    k2 = tc_add(p12, p22)

    def abs_split(k_tc):
        neg = (k_tc[:, TW - 1] >> 15) != 0  # sign bit of two's complement
        # |k| = k xor sign-extend, +1 (negation) — via u16 word arithmetic
        inv = jnp.where(neg[:, None], (~k_tc) & 0xFFFF, k_tc)
        out = []
        carry = neg.astype(jnp.int32)
        for i in range(TW):
            v = inv[:, i] + carry
            out.append(v & 0xFFFF)
            carry = v >> 16
        a = jnp.stack(out, axis=-1)
        return a[:, :W], neg

    a1, n1 = abs_split(k1)
    a2, n2 = abs_split(k2)
    return a1, n1, a2, n2


@functools.partial(
    jax.jit, static_argnames=("chunk_size", "num_subtasks", "cfg")
)
def decompose_signed_glv(
    s_u16: jax.Array, chunk_size: int, num_subtasks: int, cfg
) -> tuple[jax.Array, jax.Array]:
    """GLV stage-1 scalar path: [n, 16] u16 scalars -> (keys [S, 2n],
    signs [S, 2n]) where S = ceil(half_bits/chunk) and columns n..2n-1
    belong to the phi(P) copies of the points.

    The per-half digit signs XOR with the half's overall sign (negating a
    scalar negates every signed digit: -k = sum -d_j 2^(cj))."""
    from msm_tpu.ops.decompose import extract_windows, signed_recode

    a1, n1, a2, n2 = split_scalars_device(s_u16, cfg)
    keys, signs = [], []
    for a, neg in ((a1, n1), (a2, n2)):
        w = extract_windows(a, chunk_size, num_subtasks)
        d = signed_recode(w, chunk_size)
        keys.append(jnp.abs(d))
        signs.append((d < 0) ^ neg[None, :])
    return (
        jnp.concatenate(keys, axis=1),
        jnp.concatenate(signs, axis=1),
    )
