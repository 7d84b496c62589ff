"""Component-level timing at 2^20 under the production bs=4 batching."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from msm_tpu.models import common
from msm_tpu.models.geometry import pick_geometry
from msm_tpu.ops.curve import get_curve_ctx, PointBatch
from msm_tpu.ops.decompose import decompose_signed
from msm_tpu.ops import scan as S
from msm_tpu.oracle.pyecc import Curve
from msm_tpu.params import pick_config

n = 1 << 20
cfg = pick_config(n)
ec = get_curve_ctx(cfg)
cv = Curve(cfg.curve)
base = [cv.to_affine(p) for p in cv.sample_points(512, seed=0)]
pts_a = [base[i % 512] for i in range(n)]
rng = np.random.default_rng(1)
ks = [int.from_bytes(rng.bytes(32), "little") % cfg.curve.order for _ in range(n)]
x, y, s = common.pad_inputs(pts_a, ks, cfg)
xd, yd, sd = jnp.asarray(x), jnp.asarray(y), jnp.asarray(s)
geom = pick_geometry(n, cfg.chunk_size)
R = geom.num_rows
NB = cfg.num_buckets


def timeit(fn, *args, reps=3):
    g = jax.jit(lambda *a: sum(jnp.sum(l) for l in jax.tree.leaves(fn(*a))))
    float(g(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time(); float(g(*args)); ts.append(time.time() - t0)
    return float(np.median(ts)) * 1e3


# fixed stages
ms = timeit(lambda a, b: common.prepare_points(ec, a, b, R)[1], xd, yd)
print(f"prepare_points(fused convert+pack): {ms:.1f} ms")
ms = timeit(lambda a: decompose_signed(a, cfg.chunk_size, cfg.num_subtasks), sd)
print(f"decompose_signed: {ms:.1f} ms")

_, packed = common.prepare_points(ec, xd, yd, R)
keys, signs = decompose_signed(sd, cfg.chunk_size, cfg.num_subtasks)
k4, s4 = keys[:4], signs[:4]

sbit = (n - 1).bit_length()
payload = jnp.arange(n, dtype=jnp.int32)


def sort4(k, sg):
    pv = payload | (sg.astype(jnp.int32) << sbit)
    return jax.vmap(jax.lax.sort_key_val)(k, pv)


ms = timeit(sort4, k4, s4)
print(f"sort x4: {ms:.1f} ms")
sk4, pv4 = sort4(k4, s4)

C = n // R
idx_mask = (1 << sbit) - 1


def gather4(pv):
    pv2 = pv.reshape(4, R, C).swapaxes(1, 2).reshape(4, n)
    return packed[pv2 & idx_mask], pv2 >> sbit


ms = timeit(gather4, pv4)
print(f"perm-transpose + packed gather x4: {ms:.1f} ms")
g4, sg4 = gather4(pv4)

from msm_tpu.ops.pallas_scan import make_scan_rows
W = g4.shape[-1]


def scan4(g, sg):
    return jax.vmap(
        lambda gg, ss: make_scan_rows(ec.cfg, C, R)(
            gg.reshape(C, R, W), ss.reshape(C, R)
        )
    )(g, sg)


ms = timeit(scan4, g4, sg4)
print(f"fused scan kernel x4: {ms:.1f} ms")
rx4, ry4, rz4 = scan4(g4, sg4)


def offsets4(rx, ry, rz):
    return jax.vmap(
        lambda a, b, c: S.exclusive_prefix_points(
            ec, PointBatch(a[-1], b[-1], c[-1])
        )
    )(rx, ry, rz)


ms = timeit(offsets4, rx4, ry4, rz4)
print(f"row-offsets prefix x4: {ms:.1f} ms")
off4 = offsets4(rx4, ry4, rz4)


def ends4(sk):
    return jax.vmap(lambda kk: S._counts_leq(kk, NB))(sk)


ms = timeit(ends4, sk4)
print(f"bucket-ends search x4: {ms:.1f} ms")
e4 = ends4(sk4)


def boundary4(rx, ry, rz, off, e):
    def one(a, b, c, o, ee):
        rp = PointBatch(a, b, c)
        pe = S.prefix_at(ec, rp, PointBatch(*o), ee - 1)
        ident1 = ec.identity((1,))
        prev = PointBatch(
            jnp.concatenate([ident1.x, pe.x[:-1]]),
            jnp.concatenate([ident1.y, pe.y[:-1]]),
            jnp.concatenate([ident1.z, pe.z[:-1]]),
        )
        bb = ec.add(pe, ec.neg(prev))
        return bb.x, bb.y, bb.z

    return jax.vmap(one)(rx, ry, rz, (off.x, off.y, off.z), e)


ms = timeit(boundary4, rx4, ry4, rz4, off4, e4)
print(f"boundary prefix_at+diff x4: {ms:.1f} ms")
bx4, by4, bz4 = boundary4(rx4, ry4, rz4, off4, e4)

b16 = PointBatch(
    jnp.broadcast_to(bx4[:1], (16,) + bx4.shape[1:]),
    jnp.broadcast_to(by4[:1], (16,) + by4.shape[1:]),
    jnp.broadcast_to(bz4[:1], (16,) + bz4.shape[1:]),
)
ms = timeit(
    lambda b: jax.vmap(lambda bb: S.bucket_reduce_blocked(ec, bb, geom.bpr_threads))(b),
    b16,
)
print(f"bucket reduce x16 (batched): {ms:.1f} ms")
