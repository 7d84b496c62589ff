"""Microbenchmark: can the REDC half of mont_mul ride the MXU?

Three kernels, same grid/IO scale:
  A. pure-VPU: the real _make_field_ops mont_mul chain (13 muls like a madd)
  B. pure-MXU: 26 Toeplitz-style matmuls (48,40)@(40,1024) bf16->f32
  C. mixed: 13 x (VPU phase-1 + 2 matmuls) — does Mosaic overlap?

Run on the axon chip. Compare C vs A+B to judge overlap; compare B's
achieved flops vs 197T peak to judge padding waste.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 1024  # lanes
L = 20
DIG = 40  # 7-bit digit rows
OUT = 48  # output digit columns
STEPS = 64  # grid steps (sequential chain like the scan)
MULS = 13


def timeit(fn, *args, reps=5):
    g = jax.jit(lambda *a: jnp.sum(fn(*a)[0]).astype(jnp.float32))
    float(g(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(g(*args))
        ts.append(time.time() - t0)
    return min(ts)


def make_vpu_kernel(n_muls=MULS):
    """Approximate the real mont_mul VPU cost: phase-1 schoolbook (S1=4
    passes) + REDC passes, ~1600 row-ops per mul."""

    def kernel(a_ref, o_ref, acc):
        x = a_ref[0]
        for _ in range(n_muls):
            # phase 1: 20 rows x (mul+add) into 23-row windows, 5 passes
            acc[0:23] = jnp.zeros_like(acc[0:23])
            for i in range(0, L, 4):
                s = x[i : i + 1] * x
                for j in range(1, 4):
                    s = s + x[(i + j) % L : (i + j) % L + 1] * x
                acc[0:L] += s
            # sweep
            v = acc[0:L]
            acc[0:L] = (v & 0x1FFF) + jnp.concatenate(
                [jnp.zeros_like(v[:1]), v[:-1] >> 13], axis=0
            )
            # redc: 20 m-rows x q-mul accumulate (5 passes of 4-wide)
            for i in range(0, L, 4):
                s = acc[i : i + 1] * x
                for j in range(1, 4):
                    s = s + acc[(i + j) % L : (i + j) % L + 1] * x
                acc[0:L] += s
            x = acc[0:L]
        o_ref[0] = x

    return kernel


def run_vpu():
    kernel = make_vpu_kernel()
    x = jnp.ones((STEPS, L, T), jnp.int32)
    f = pl.pallas_call(
        kernel,
        grid=(STEPS,),
        in_specs=[pl.BlockSpec((1, L, T), lambda c: (c, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, L, T), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((STEPS, L, T), jnp.int32),
        scratch_shapes=[pltpu.VMEM((2 * L + 3, T), jnp.int32)],
    )
    t = timeit(lambda a: (f(a),), x)
    ops = STEPS * MULS * (2 * L * L * 2 + 200) * T  # ~2x(mul+add) schoolbook grids
    print(f"VPU:   {t*1e3:8.3f} ms  ~{ops/t/1e12:.2f} T ops/s")
    return t


def make_mxu_kernel(n_mm=2 * MULS, dtype=jnp.bfloat16):
    def kernel(w_ref, a_ref, o_ref):
        w = w_ref[:]
        x = a_ref[0]
        acc = x
        for _ in range(n_mm):
            y = jax.lax.dot_general(
                w, acc,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (OUT, DIG)@(DIG, T) -> (OUT, T)
            acc = y[:DIG].astype(dtype)
        o_ref[0] = acc.astype(jnp.float32)

    return kernel


def run_mxu(dtype=jnp.bfloat16):
    kernel = make_mxu_kernel(dtype=dtype)
    w = jnp.ones((OUT, DIG), dtype)
    x = jnp.ones((STEPS, DIG, T), dtype)
    f = pl.pallas_call(
        kernel,
        grid=(STEPS,),
        in_specs=[
            pl.BlockSpec((OUT, DIG), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DIG, T), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, DIG, T), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((STEPS, DIG, T), jnp.float32),
    )
    t = timeit(lambda a: (f(w, a),), x)
    mm = STEPS * 2 * MULS
    useful = mm * 2 * OUT * DIG * T
    structural = mm * 2 * 128 * 128 * T
    print(f"MXU({dtype.__name__}): {t*1e3:8.3f} ms  useful {useful/t/1e12:.2f} T, "
          f"structural {structural/t/1e12:.2f} T flops/s")
    return t


def make_mixed_kernel():
    vpu_body = make_vpu_kernel(n_muls=1)

    def kernel(w_ref, a_ref, d_ref, o_ref, acc):
        w = w_ref[:]
        x = a_ref[0]
        dg = d_ref[0]
        macc = dg
        for _ in range(MULS):
            # VPU phase-1-equivalent for one mul
            accv = acc
            y = x
            accv[0:23] = jnp.zeros_like(accv[0:23])
            for i in range(0, L, 4):
                s = y[i : i + 1] * y
                for j in range(1, 4):
                    s = s + y[(i + j) % L : (i + j) % L + 1] * y
                accv[0:L] += s
            x = accv[0:L] & 0x3FFF
            # 2 matmuls (the REDC pair)
            for _ in range(2):
                z = jax.lax.dot_general(
                    w, macc, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                macc = z[:DIG].astype(jnp.bfloat16)
        o_ref[0] = x + macc[:L].astype(jnp.int32)

    return kernel


def run_mixed():
    kernel = make_mixed_kernel()
    w = jnp.ones((OUT, DIG), jnp.bfloat16)
    x = jnp.ones((STEPS, L, T), jnp.int32)
    d = jnp.ones((STEPS, DIG, T), jnp.bfloat16)
    f = pl.pallas_call(
        kernel,
        grid=(STEPS,),
        in_specs=[
            pl.BlockSpec((OUT, DIG), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, T), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DIG, T), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, T), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((STEPS, L, T), jnp.int32),
        scratch_shapes=[pltpu.VMEM((2 * L + 3, T), jnp.int32)],
    )
    t = timeit(lambda a, b: (f(w, a, b),), x, d)
    print(f"MIXED: {t*1e3:8.3f} ms  (VPU-half + MXU-half interleaved)")
    return t


if __name__ == "__main__":
    print(f"platform: {jax.devices()[0].platform}")
    tv = run_vpu()
    tm = run_mxu(jnp.bfloat16)
    tx = run_mixed()
    # mixed has HALF the vpu work of run_vpu (phase-1 only) + all matmuls
    print(f"sum-if-serial ~ {1e3*(tv*0.55 + tm):.3f} ms ; overlap if "
          f"mixed << that; mixed/vpu = {tx/tv:.2f}")
