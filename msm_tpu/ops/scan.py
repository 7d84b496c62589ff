"""Sort/scan-based bucket machinery — the TPU-native replacement for the
reference's atomic sparse transpose + per-bucket CSC walks.

Reference stages replaced here:
- Stage-2 CSR->CSC transpose (``transpose.template.wgsl:32-75``, serial with
  atomics): XLA has no atomics; a global ``lax.sort_key_val`` by bucket key
  produces the same grouped-by-bucket ordering deterministically.
- Stage-3 SMVP per-bucket segment walk (``smvp.template.wgsl:31-117``, one
  thread per bucket, dynamic-length loops): replaced by ONE blocked inclusive
  prefix scan of point-adds over the sorted array (fixed trip count, fat
  vector lanes) + prefix-difference extraction at bucket boundaries:
      bucket_b = prefix[end_b - 1] + neg(prefix[end_{b-1} - 1])
  Empty buckets come out as P + (-P) = identity *automatically* because the
  group law is complete — no masking needed.
- Stage-4 BPR running sums (``bpr.template.wgsl:40-132``): same two-phase
  (m, g) blocked reduction, with the per-thread serial loops mapped to a
  lane-parallel ``lax.scan`` and the ``m*s`` corrections folded into a
  suffix-scan identity (sum_t t*m_t = sum_j suffix_j) so the only scalar-mul
  left is a power-of-two shift (static doublings).

Work budget per subtask of n points: n adds (row scan) + ~2R adds (row-offset
scan) + ~3B adds (boundaries + reduction), vs the reference GPU's ~n + 2B —
i.e. asymptotically the same point-add count, arranged as wide SIMD batches
with an O(n/R + log R + Bl) sequential depth.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from msm_tpu.ops.curve import (
    CurveCtx,
    PointBatch,
    pallas_interpret,
    point_where,
)


def gather_points(pts: PointBatch, idx: jax.Array) -> PointBatch:
    return PointBatch(pts.x[idx], pts.y[idx], pts.z[idx])


def _shift_in_identity(ec: CurveCtx, pts: PointBatch, s: jax.Array) -> PointBatch:
    """[m] batch shifted UP by a TRACED amount s along axis 0, identity-filled:
    out[i] = pts[i-s] for i >= s else identity. Fixed shapes (dynamic_slice on
    an identity-prefixed buffer), so loop bodies using it compile once."""
    m = pts.x.shape[0]
    ident = ec.identity((m,) + pts.x.shape[1:-1])

    def sl(pad, a):
        buf = jnp.concatenate([pad, a], axis=0)  # [2m, ...]
        start = (m - s,) + (0,) * (a.ndim - 1)
        return jax.lax.dynamic_slice(buf, start, a.shape)

    return PointBatch(sl(ident.x, pts.x), sl(ident.y, pts.y), sl(ident.z, pts.z))


def hillis_steele_prefix(
    ec: CurveCtx, pts: PointBatch, reverse: bool = False
) -> PointBatch:
    """Inclusive prefix (or suffix) point-sums along axis 0 via Hillis-Steele:
    log2(m) iterations of x += shift(x, 2^k) inside ONE fori_loop whose body
    compiles once (fixed shapes). O(m log m) adds — use for SMALL m; large
    arrays go through blocked_prefix_scan."""
    m = pts.x.shape[0]
    if m == 1:
        return pts
    if reverse:
        rev = PointBatch(pts.x[::-1], pts.y[::-1], pts.z[::-1])
        out = hillis_steele_prefix(ec, rev)
        return PointBatch(out.x[::-1], out.y[::-1], out.z[::-1])
    nlev = (m - 1).bit_length()

    def body(k, x):
        return ec.add(x, _shift_in_identity(ec, x, jnp.int32(1) << k))

    return jax.lax.fori_loop(0, nlev, body, pts)


def tree_reduce_points(ec: CurveCtx, pts: PointBatch) -> PointBatch:
    """Sum a [m, ...] batch of points along axis 0. Large flat batches
    first fold blockwise (m adds via one lax.scan over 4096 lanes) so the
    Hillis-Steele ladder only runs at 4096 — m*log(m) -> m + 4096*12
    adds, which is what makes the XLA-fallback window tail tractable on
    CPU at production bucket counts (32768 buckets: 491k -> 81k adds).
    Point addition is exact and associative, so any association yields
    the same group element."""
    m = pts.x.shape[0]
    LANES = 4096
    if pts.x.ndim == 2 and m > LANES and m % LANES == 0:
        C2 = m // LANES

        def arr(a):  # [m, L] -> [C2, LANES, L], lane r owns r::LANES
            return a.reshape(C2, LANES, a.shape[-1])

        xs = PointBatch(arr(pts.x), arr(pts.y), arr(pts.z))

        def step(acc, x_c):
            return ec.add(acc, x_c), None

        tot, _ = jax.lax.scan(step, ec.identity((LANES,)), xs)
        pts = tot
    out = hillis_steele_prefix(ec, pts)
    return PointBatch(out.x[-1], out.y[-1], out.z[-1])


def exclusive_prefix_points(ec: CurveCtx, pts: PointBatch) -> PointBatch:
    """Exclusive prefix point-sums along axis 0, work-efficient for large m:
    m <= 4096 uses Hillis-Steele directly; larger arrays run a blocked
    lax.scan over 4096 lanes first (adds ~2m work, single body compile)."""
    m = pts.x.shape[0]
    LANES = 4096
    if m <= LANES or m % LANES != 0:
        incl = hillis_steele_prefix(ec, pts)
        ident1 = ec.identity((1,) + pts.x.shape[1:-1])
        return PointBatch(
            jnp.concatenate([ident1.x, incl.x[:-1]]),
            jnp.concatenate([ident1.y, incl.y[:-1]]),
            jnp.concatenate([ident1.z, incl.z[:-1]]),
        )
    # two-level: R2=LANES rows x C2 columns, contiguous per row
    C2 = m // LANES
    row_prefix, offsets = blocked_prefix_scan(ec, pts, LANES)
    # full exclusive prefix at i = offsets[i//C2] + row_prefix[(i%C2)-1, i//C2]
    idx = jnp.arange(m, dtype=jnp.int32) - 1
    return prefix_at(ec, row_prefix, offsets, idx)


def blocked_prefix_scan(
    ec: CurveCtx, pts: PointBatch, num_rows: int
) -> tuple[PointBatch, PointBatch]:
    """Inclusive prefix point-sums of a [n] batch, blocked as R lanes x C
    steps (lane r owns contiguous positions [r*C, (r+1)*C)).

    Returns (row_prefix [C, R], row_offsets [R]) such that
        prefix(i) = row_offsets[i // C] + row_prefix[i % C, i // C].
    """
    n = pts.x.shape[0]
    R = num_rows
    assert n % R == 0, (n, R)
    C = n // R
    L = pts.x.shape[-1]

    def arrange(a):  # [n, L] -> [C, R, L]
        return a.reshape(R, C, L).swapaxes(0, 1)

    xs = PointBatch(arrange(pts.x), arrange(pts.y), arrange(pts.z))

    def step(acc, x_c):
        acc = ec.add(acc, x_c)
        return acc, acc

    row_totals, row_prefix = jax.lax.scan(step, ec.identity((R,)), xs)
    offsets = exclusive_prefix_points(ec, row_totals)
    return row_prefix, offsets


def prefix_at(
    ec: CurveCtx,
    row_prefix,
    offsets: PointBatch,
    idx: jax.Array,
    packed3: bool = False,
) -> PointBatch:
    """Gather inclusive prefix values at positions ``idx`` (int32 [m]);
    idx == -1 yields the identity (empty prefix). ``packed3=True`` means
    row_prefix is the scan kernel's [C, R, P] boundary layout (x||y||z
    limbs contiguous per row — ONE gathered row per position; int16 limb
    pairs when pallas_scan.pe_pack16 holds); otherwise a PointBatch
    stored [C, R, L]."""
    C = (row_prefix.shape if packed3 else row_prefix.x.shape)[0]
    valid = idx >= 0
    i = jnp.maximum(idx, 0)
    r = i // C
    c = i % C
    if packed3:
        from msm_tpu.ops.pallas_scan import unpack_pe_rows

        L = ec.cfg.num_words
        row = row_prefix[c, r]  # [m, P] — one fast row gather
        row = unpack_pe_rows(row, ec.cfg)  # [m, 3L]
        rp = PointBatch(
            row[..., :L], row[..., L : 2 * L], row[..., 2 * L :]
        )
    else:
        rp = PointBatch(
            row_prefix.x[c, r], row_prefix.y[c, r], row_prefix.z[c, r]
        )
    off = gather_points(offsets, r)
    out = ec.add(off, rp)
    return point_where(valid, out, ec.identity(idx.shape))


def bucket_accumulate(
    ec: CurveCtx,
    pts: PointBatch,
    keys: jax.Array,
    num_buckets: int,
    num_rows: int,
    signs: jax.Array | None = None,
    affine: bool = False,
    packed: jax.Array | None = None,
) -> PointBatch:
    """Per-bucket signed point sums for one subtask (cuZK stages 2+3).

    pts: [n] points (Montgomery projective); keys: int32 [n] in
    [0, num_buckets); signs: optional bool [n] (True -> subtract the point).
    ``affine=True`` asserts every z == 1 (Montgomery R) — true for freshly
    converted input points — enabling the fused mixed-add scan kernel on
    TPU (z never gathered, 13 instead of 15 muls per scan step).
    ``packed``: optional pre-packed [n, 2D] dense canonical coordinate
    array (pallas_scan.pack_coords) — pass it when calling per-subtask so the
    packing cost is paid once per MSM, not once per subtask.
    Returns buckets [num_buckets] with bucket_b = sum_{keys==b} ±P_i.
    """
    pe = bucket_boundary_prefix(
        ec, pts, keys, num_buckets, num_rows, signs=signs, affine=affine,
        packed=packed,
    )
    # previous bucket's end-prefix (identity for bucket 0)
    ident1 = ec.identity((1,))
    prev = PointBatch(
        jnp.concatenate([ident1.x, pe.x[:-1]]),
        jnp.concatenate([ident1.y, pe.y[:-1]]),
        jnp.concatenate([ident1.z, pe.z[:-1]]),
    )
    return ec.add(pe, ec.neg(prev))


def bucket_boundary_prefix(
    ec: CurveCtx,
    pts: PointBatch,
    keys: jax.Array,
    num_buckets: int,
    num_rows: int,
    signs: jax.Array | None = None,
    affine: bool = False,
    packed: jax.Array | None = None,
) -> PointBatch:
    """The sorted-prefix values at bucket end boundaries: pe[b] is the
    inclusive point-prefix over all elements with key <= b, so bucket_b =
    pe[b] - pe[b-1]. The production pipeline consumes pe directly via the
    telescoped reduction (window_sum_from_pe) and never materializes the
    bucket differences."""
    n = keys.shape[0]
    # ride the sign bit inside the sort payload: gathers are per-row
    # latency-bound on TPU (~8 ms for 2^20 rows regardless of width), so a
    # separate signs[perm] gather would cost as much as the coordinate
    # gather itself
    sbit = max((n - 1).bit_length(), 1)
    payload = jnp.arange(n, dtype=jnp.int32)
    if signs is not None:
        assert sbit + 1 < 32, n
        payload = payload | (signs.astype(jnp.int32) << sbit)
    # unstable sort: bucket sums are order-free within a key, and
    # is_stable=False is measurably cheaper on TPU (16 -> 10 ms per 4x2^20)
    sorted_keys, pv = jax.lax.sort(
        (keys, payload), is_stable=False, num_keys=1
    )
    ends = _counts_leq(keys, num_buckets)
    R = num_rows
    if (
        ec.cfg.compress
        and affine
        and packed is not None
        and fused_scan_available(n, R)
        and (n // R) % 2 == 0
    ):
        return _boundary_prefix_compressed(
            ec, packed, pv, sbit if signs is not None else None, R, ends
        )
    row_prefix, offsets, packed3 = _sorted_prefix(
        ec, pts, pv, sbit if signs is not None else None, num_rows,
        affine=affine, packed=packed,
    )
    return prefix_at(
        ec, row_prefix, offsets, ends - 1, packed3=packed3
    )


def _decode_payload_step_major(
    pv: jax.Array, sbit: int | None, R: int, table_rows: int | None = None
) -> tuple[jax.Array, jax.Array]:
    """Transpose the sorted payload vector to step-major order (element
    (c, r) = sorted position r*C + c) and split it into the gather
    permutation and the sign bit. The kernels own the contiguous sorted
    range [r*C, (r+1)*C) per lane r; transposing the 4 MB payload VECTOR
    (not the gathered coordinate data) keeps the gather itself landing
    directly in kernel layout. Shared by _sorted_prefix and
    _boundary_prefix_compressed so the sbit/layout invariant lives once.

    ``table_rows`` (GLV): the packed table has table_rows physical rows
    but the stream indexes 2*table_rows logical columns (columns >= n are
    the phi copies). The phi bit moves from the index into BIT 1 of the
    returned flag row (bit 0 stays the bucket sign) and the returned
    permutation is the physical row."""
    n = pv.shape[0]
    pv2 = pv.reshape(R, n // R).swapaxes(0, 1).reshape(n)
    if sbit is not None:
        idx = pv2 & ((1 << sbit) - 1)
        sg = pv2 >> sbit
    else:
        idx = pv2
        sg = jnp.zeros((n,), jnp.int32)
    if table_rows is not None:
        assert table_rows & (table_rows - 1) == 0, table_rows
        sg = sg | ((idx // table_rows) << 1)
        idx = idx % table_rows
    return idx, sg


def _boundary_prefix_compressed(
    ec: CurveCtx,
    packed: jax.Array,
    pv: jax.Array,
    sbit: int | None,
    R: int,
    ends: jax.Array,
) -> PointBatch:
    """Boundary prefixes via batched-affine pair compression
    (ops/pallas_compress.py): adjacent sorted pairs are pre-added with
    ~3.5 muls/point, the madd scan runs over n/2 compressed rows, and
    bucket boundaries that fall INSIDE a pair (odd within-lane offset) are
    fixed up with one gathered single-element add per bucket:

        pe[b] = offsets[r] + pair_prefix[(c-1)//2, r]
                + (c even ? element at sorted position i : identity)

    with i = ends[b]-1, r = i // C, c = i % C (lane r owns the contiguous
    sorted range [r*C, (r+1)*C))."""
    import numpy as np

    from msm_tpu.ops.pallas_compress import compressed_prefix_scan
    from msm_tpu.ops.pallas_prefix import make_row_offsets
    from msm_tpu.ops.pallas_scan import coord_words, unpack_coords
    from msm_tpu.utils.limbs import int_to_limbs

    cfg = ec.cfg
    n = pv.shape[0]
    C = n // R
    Cp = C // 2
    D = coord_words(cfg)
    W = packed.shape[-1]  # 2D, or 3D triple rows under GLV
    interp = pallas_interpret()
    perm2, sgv = _decode_payload_step_major(
        pv, sbit, R, table_rows=packed.shape[0] if cfg.glv else None
    )
    g = packed[perm2]  # [n, W] — the ONLY per-subtask gather
    gxy = g.reshape(C, R, W).swapaxes(1, 2)
    sg3 = sgv.reshape(C, 1, R)
    rx, ry, rz = compressed_prefix_scan(cfg, gxy, sg3, interpret=interp)
    ox, oy, oz = make_row_offsets(cfg, R, interpret=interp)(
        rx[-1], ry[-1], rz[-1]
    )
    offsets = PointBatch(ox, oy, oz)

    # --- extraction with odd-boundary correction --------------------------
    i = ends - 1
    valid = i >= 0
    ic = jnp.maximum(i, 0)
    r = ic // C
    c = ic % C
    jc = (c - 1) // 2  # last full pair covering [r*C, i]; -1 if none
    pairs_valid = valid & (jc >= 0)
    jcc = jnp.maximum(jc, 0)
    rp = PointBatch(rx[jcc, :, r], ry[jcc, :, r], rz[jcc, :, r])
    ident = ec.identity(ends.shape)
    rp = point_where(pairs_valid, rp, ident)
    base = ec.add(gather_points(offsets, r), rp)

    need_s = valid & (c % 2 == 0)
    sel = c * R + r  # step-major flat index of element i
    srow = g[sel]  # [B, W]
    fl = sgv[sel]  # bit 0 sign, bit 1 phi (GLV)
    if cfg.glv:
        xd = jnp.where(
            ((fl >> 1) != 0)[:, None], srow[:, D : 2 * D], srow[:, :D]
        )
        x_l = unpack_coords(xd, cfg)
        y_l = unpack_coords(srow[:, 2 * D :], cfg)
    else:
        x_l = unpack_coords(srow[:, :D], cfg)
        y_l = unpack_coords(srow[:, D:], cfg)
    q_limbs = jnp.asarray(
        int_to_limbs(cfg.curve.modulus, cfg.word_size, cfg.num_words).astype(
            np.int64
        ),
        jnp.int32,
    )
    y_l = jnp.where(
        ((fl & 1) != 0)[:, None], q_limbs[None, :] - y_l, y_l
    )
    rm = jnp.asarray(
        int_to_limbs(cfg.r, cfg.word_size, cfg.num_words).astype(np.int64),
        jnp.int32,
    )
    elem = PointBatch(
        x_l, y_l, jnp.broadcast_to(rm[None, :], x_l.shape)
    )
    elem = point_where(need_s, elem, ident)
    pe = ec.add(base, elem)
    return point_where(valid, pe, ident)


def window_sum_from_pe(ec: CurveCtx, pe: PointBatch) -> PointBatch:
    """W = sum_b b * S_b computed straight from the boundary prefixes by the
    telescoping identity

        sum_b b*(pe_b - pe_{b-1}) = (B-1)*pe_{B-1} - sum_{b<B-1} pe_b

    which replaces the entire two-phase BPR running-sum machinery (cuZK
    Alg. 4, the reference's ``bpr.template.wgsl``) with ONE point-sum
    reduction plus log2(B-1) doublings (B-1 = 2^(c-1) is a power of two):
    ~1 add per bucket instead of ~3. bucket_reduce_blocked remains as the
    reference-shaped parity implementation."""
    B = pe.x.shape[0]
    assert (B - 1) & (B - 2) == 0, f"B-1 = {B - 1} must be a power of two"
    from msm_tpu.ops.curve import _pallas_enabled

    body = PointBatch(pe.x[:-1], pe.y[:-1], pe.z[:-1])
    if _pallas_enabled() and (B - 1) % 128 == 0:
        from msm_tpu.ops.pallas_prefix import make_point_total

        tx, ty, tz = make_point_total(
            ec.cfg, B - 1, interpret=pallas_interpret()
        )(body.x, body.y, body.z)
        total = PointBatch(tx[:, 0], ty[:, 0], tz[:, 0])
    else:
        total = tree_reduce_points(ec, body)
    last = PointBatch(pe.x[-1], pe.y[-1], pe.z[-1])
    for _ in range((B - 1).bit_length() - 1):  # * (B-1), power of two
        last = ec.double(last)
    return ec.add(last, ec.neg(total))


def _counts_leq(keys: jax.Array, num_buckets: int) -> jax.Array:
    """ends[b] = #{i : keys[i] <= b} (keys need NOT be sorted) — MXU
    histogram: split each key into hi/lo bytes, build int8 one-hot
    matrices, and let ONE int8 matmul count every (hi, lo) cell:
        hist[h, l] = sum_i onehot_hi[h, i] * onehot_lo[i, l]
    then an inclusive cumsum over the flattened histogram. Replaces the
    earlier 21-step branchless binary search over the sorted keys, whose
    element gathers cost ~5.4 ms/probe on v5e (~110 ms per 2^20 MSM) —
    the matmul form runs on the MXU at ~0.5 ms/subtask and drops the
    data dependency on the sort."""
    n = keys.shape[0]
    if num_buckets <= 128 or n < 4096:
        # small cases: one-hot histogram fits directly (or isn't worth MXU)
        q = jnp.arange(num_buckets, dtype=jnp.int32)
        return jnp.sum(
            (keys[None, :] <= q[:, None]).astype(jnp.int32), axis=1
        )
    from msm_tpu.ops.curve import _pallas_enabled
    from msm_tpu.ops.pallas_hist import CHUNK, make_bucket_hist

    if _pallas_enabled() and n % CHUNK == 0 and n < (1 << 24):
        # in-kernel one-hots + MXU dot: keys in, 132 KB histogram out —
        # the jnp-level formulations either fall off the MXU (operand-
        # fused, ~26 ms/4x2^20) or pay ~45 ms of one-hot HBM writes
        counts = make_bucket_hist(
            n, num_buckets, interpret=pallas_interpret()
        )(keys)[:num_buckets]
        return jnp.cumsum(counts)
    H = (num_buckets + 255) // 256  # hi cells
    hi = (keys >> 8).astype(jnp.int32)
    lo = (keys & 255).astype(jnp.int32)
    oh_hi = (hi[None, :] == jnp.arange(H, dtype=jnp.int32)[:, None]).astype(
        jnp.int8
    )  # [H, n]
    oh_lo = (lo[:, None] == jnp.arange(256, dtype=jnp.int32)[None, :]).astype(
        jnp.int8
    )  # [n, 256]
    hist = jax.lax.dot_general(
        oh_hi,
        oh_lo,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [H, 256]; hist[h, l] = #{keys == h*256 + l}
    counts = hist.reshape(H * 256)[:num_buckets]
    return jnp.cumsum(counts)


def fused_scan_available(n: int, num_rows: int) -> bool:
    """True when the Pallas mixed-add scan kernel can run this geometry
    (single source of truth for models deciding the fused convert path)."""
    from msm_tpu.ops.curve import _pallas_enabled

    return _pallas_enabled() and n % num_rows == 0 and num_rows % 256 == 0


def _sorted_prefix(
    ec: CurveCtx,
    pts: PointBatch | None,
    pv: jax.Array,
    sbit: int | None,
    num_rows: int,
    affine: bool,
    packed: jax.Array | None = None,
) -> tuple[PointBatch, PointBatch]:
    """Gather points into sorted order (one fused packed gather) and run the
    blocked prefix scan — via the fused Pallas mixed-add kernel when the
    points are affine and we're on TPU, else the generic XLA path.

    ``pv``: the sort payload — point index in bits [0, sbit), the bucket
    sign in bit sbit (``sbit=None`` means unsigned: pv IS the permutation).
    ``pts`` may be None when ``packed`` is given and the kernel path is
    available (the fused-convert models never materialize the PointBatch).

    Returns (row_prefix, row_offsets, packed3): the kernel path stores
    row_prefix as the [C, R, P] boundary-gather layout (packed3=True,
    emitted directly by the scan kernel; P = pallas_scan.pe_row_words);
    the XLA path stays a PointBatch [C, R, L]."""
    n = pv.shape[0]
    R = num_rows
    # GLV kernel runs need the triple-row packed table (the doubled
    # PointBatch would rebuild the slow 2n-row gather); without it, fall
    # through to the XLA path over the doubled pts.
    use_kernel = affine and fused_scan_available(n, R) and (
        packed is not None or (pts is not None and not ec.cfg.glv)
    )
    idx_mask = (1 << sbit) - 1 if sbit is not None else None
    if not use_kernel:
        assert pts is not None, "XLA path needs the unpacked PointBatch"
        perm = pv if sbit is None else pv & idx_mask
        L = pts.x.shape[-1]
        cat = jnp.concatenate([pts.x, pts.y, pts.z], axis=-1)[perm]
        spts = PointBatch(cat[..., :L], cat[..., L : 2 * L], cat[..., 2 * L :])
        if sbit is not None:
            spts = ec.neg_where((pv >> sbit).astype(bool), spts)
        row_prefix, offsets = blocked_prefix_scan(ec, spts, R)
        return row_prefix, offsets, False

    from msm_tpu.ops.pallas_scan import make_scan_rows, pack_coords

    C = n // R
    if packed is None:
        packed = jnp.concatenate(
            [pack_coords(pts.x, ec.cfg), pack_coords(pts.y, ec.cfg)],
            axis=-1,
        )
    perm2, sg = _decode_payload_step_major(
        pv, sbit, R, table_rows=packed.shape[0] if ec.cfg.glv else None
    )
    g = packed[perm2]  # [n, W] — the ONLY per-subtask gather
    W = g.shape[-1]
    # [C, W, R]: XLA's gather emits rows-minor data, so this transpose is
    # a layout assignment, not a copy — and the kernel wants coords-first
    pe3, tx, ty, tz = make_scan_rows(
        ec.cfg, C, R, interpret=pallas_interpret()
    )(g.reshape(C, R, W).swapaxes(1, 2), sg.reshape(C, 1, R))
    from msm_tpu.ops.pallas_scan import pe_layout_cpr

    if pe_layout_cpr():  # limbs-first emission: ONE XLA copy to gather layout
        pe3 = pe3.swapaxes(1, 2)
    from msm_tpu.ops.pallas_prefix import make_row_offsets

    # fused exclusive-prefix kernel over the [L, R] row totals: one dispatch
    # instead of the ~25 of the blocked-XLA exclusive_prefix_points chain
    ox, oy, oz = make_row_offsets(ec.cfg, R, interpret=pallas_interpret())(
        tx, ty, tz
    )
    offsets = PointBatch(ox, oy, oz)
    return pe3, offsets, True


def bucket_reduce_running(ec: CurveCtx, buckets: PointBatch) -> PointBatch:
    """W = sum_b b * S_b by the descending running-sum identity, scanning the
    bucket axis (axis 0, multiplier == index) serially — the analogue of
    running_sum_bucket_reduction (reference test/utils.rs:238-251). Batched
    over any trailing batch axes. Use for SMALL bucket counts."""
    B = buckets.x.shape[0]
    batch = buckets.x.shape[1:-1]

    def arrange(a):  # descending multipliers B-1 .. 1 (skip bucket 0)
        return a[1:][::-1]

    xs = PointBatch(arrange(buckets.x), arrange(buckets.y), arrange(buckets.z))

    def step(carry, s_b):
        running, acc = carry
        running = ec.add(running, s_b)
        acc = ec.add(acc, running)
        return (running, acc), None

    (_, acc), _ = jax.lax.scan(
        step, (ec.identity(batch), ec.identity(batch)), xs
    )
    return acc


def bucket_reduce_blocked(
    ec: CurveCtx, buckets: PointBatch, num_threads: int
) -> PointBatch:
    """W = sum_b b * S_b via the two-phase blocked reduction (cuZK Alg.4 /
    reference bpr.template.wgsl:40-132), lane-parallel over T threads.

    Phase 1: thread t descends its block of Bl buckets accumulating
    (m_t = block sum, g_t = sum of running sums).
    Phase 2: W = sum_t g_t + Bl * sum_t t*m_t, where sum_t t*m_t is computed
    by the suffix-scan identity (no per-thread scalar-mul; the reference uses
    double_and_add at bpr.template.wgsl:124-126) and Bl is a power of two so
    the final scalar-mul is log2(Bl) doublings.
    """
    B = buckets.x.shape[0]
    body_len = B - 1
    T = num_threads
    assert body_len % T == 0, (body_len, T)
    Bl = body_len // T
    assert Bl & (Bl - 1) == 0, f"block size {Bl} must be a power of two"
    L = buckets.x.shape[-1]

    from msm_tpu.ops.curve import _pallas_enabled

    if _pallas_enabled() and T % 8 == 0:
        # fused phase-1 kernel: (m, g) live in VMEM across all Bl steps
        from msm_tpu.ops.pallas_bpr import make_bpr_phase1

        def arr(a):  # body [B-1] -> [Bl, T, L] steps-major (ascending)
            return a[1:].reshape(T, Bl, L).swapaxes(0, 1)

        mc, gc = make_bpr_phase1(
            ec.cfg, Bl, T, interpret=pallas_interpret()
        )(
            arr(buckets.x), arr(buckets.y), arr(buckets.z)
        )
        m, g = PointBatch(*mc), PointBatch(*gc)
    else:

        def arrange(a):  # steps-major, descending in-block
            return a[1:].reshape(T, Bl, L).swapaxes(0, 1)[::-1]

        xs = PointBatch(
            arrange(buckets.x), arrange(buckets.y), arrange(buckets.z)
        )

        def step(carry, s):
            mm, gg = carry
            mm = ec.add(mm, s)
            gg = ec.add(gg, mm)
            return (mm, gg), None

        (m, g), _ = jax.lax.scan(
            step, (ec.identity((T,)), ec.identity((T,))), xs
        )
    total_g = tree_reduce_points(ec, g)
    # sum_t t*m_t = sum_j suffix_j - suffix_0 (suffix_j = sum_{t>=j} m_t):
    # one reverse Hillis-Steele + one reduce — no per-thread scalar-mul
    # (the reference's double_and_add at bpr.template.wgsl:124-126)
    suff = hillis_steele_prefix(ec, m, reverse=True)
    suff_total = tree_reduce_points(ec, suff)
    s0 = PointBatch(suff.x[0], suff.y[0], suff.z[0])
    corr = ec.add(suff_total, ec.neg(s0))
    for _ in range(Bl.bit_length() - 1):  # * Bl (power of two)
        corr = ec.double(corr)
    return ec.add(total_g, corr)
