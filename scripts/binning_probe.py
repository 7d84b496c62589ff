"""Measurement suite: can radix-partition/binning beat the sort+gather block?

VERDICT r3 item 1: the 138 ms sort+gather block (103 ms random row gather +
35 ms lax.sort at 2^20 x 16 subtasks) is the only non-VPU-roofline-bound
piece of the MSM budget, and the standard GPU answer (multi-pass bucket
binning) was rejected in r2/r3 on estimates. This script measures every
primitive such a design would be built from, on the real chip, so the
decision is data:

  gather      the production form (packed[perm], 64 B rows) + locality
              probes: random vs sequential vs reversed vs 8-row-granule
              indices. If sequential ~= random, the gather engine is
              descriptor-bound and NO partitioning scheme can help (only
              row-count reduction would, and 16n touches are structural).
  scatter     out.at[perm].set(rows) — is the scatter direction cheaper?
  sortpay     lax.sort carrying W extra int32 payload operands,
              W in {1, 2, 4, 8, 16}: the "sort carries the rows" design
              needs W=16 to land under (sort + gather)/subtask ~ 8.6 ms.
  route       Pallas per-row VMEM->VMEM dynamic-index row copy (the
              binning kernel's inner routing step). ns/row here bounds any
              in-VMEM binning: >= 2 passes x route must beat 6.2 ns/row.
  dma         Pallas chunked-DMA rate: k-row copies (k in {8, 32, 128})
              at dynamic offsets, 8 in flight — the run-granular exchange
              a group-local partition would use (65K runs/pass/subtask vs
              16.8M row descriptors; the r2 rejection extrapolated from
              the per-ROW rate, this measures the per-RUN regime).
  mxu_perm    one-hot bf16 matmul permutation of [T, 64 B] rows inside
              VMEM (local reorder primitive: int32 -> 4x8-bit digits ->
              [T, T] @ [T, 64] -> recombine).

Usage: python scripts/binning_probe.py [--json out.json] [--only a,b,c]
Run with nothing else on the TPU. On CPU it runs in interpret mode
(correctness smoke of the kernels; rates are meaningless).
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def _timeit(f, *a, reps: int = 5) -> float:
    """min-of-reps wall ms; ONE scalar fetch per rep (PERF_NOTES rules)."""
    import jax
    import jax.numpy as jnp

    g = jax.jit(lambda *aa: jnp.sum(f(*aa)))
    float(g(*a))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(g(*a))
        ts.append(time.time() - t0)
    return min(ts) * 1e3


# ---------------------------------------------------------------------------
# XLA-level probes
# ---------------------------------------------------------------------------


def probe_gather(n: int = 1 << 20) -> dict:
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.integers(0, 2**31, size=(n, 16), dtype=np.int64), jnp.int32
    )
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    seq = jnp.arange(n, dtype=jnp.int32)
    # "bin-local" indices: random within 8192-row windows (the locality a
    # 128-way coarse partition would buy before the fine gather)
    win = 8192
    binlocal = jnp.asarray(
        (
            (np.arange(n) // win) * win
            + rng.integers(0, win, size=n)
        ).astype(np.int32)
    )
    out = {}
    out["rand_ms"] = _timeit(lambda t, p: t[p], table, perm)
    out["seq_ms"] = _timeit(lambda t, p: t[p], table, seq)
    out["rev_ms"] = _timeit(lambda t, p: t[p], table, seq[::-1])
    out["binlocal8k_ms"] = _timeit(lambda t, p: t[p], table, binlocal)
    tg = table.reshape(n // 8, 128)
    pg = jnp.asarray(rng.permutation(n // 8).astype(np.int32))
    out["granule8_512B_ms"] = _timeit(lambda t, p: t[p], tg, pg)
    out["rand_ns_per_row"] = out["rand_ms"] * 1e6 / n
    out["seq_ns_per_row"] = out["seq_ms"] * 1e6 / n
    return out


def probe_scatter(n: int = 1 << 20) -> dict:
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    rows = jnp.asarray(
        rng.integers(0, 2**31, size=(n, 16), dtype=np.int64), jnp.int32
    )
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))

    def scat(r, p):
        return jnp.zeros_like(r).at[p].set(r, unique_indices=True)

    ms = _timeit(scat, rows, perm)
    return {"rand_ms": ms, "rand_ns_per_row": ms * 1e6 / n}


def probe_sortpay(n: int = 1 << 20) -> dict:
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    keys = jnp.asarray(
        rng.integers(0, 1 << 15, size=n, dtype=np.int64), jnp.int32
    )
    out = {}
    for w in (1, 2, 4, 8, 16):
        ops = [keys] + [
            jnp.asarray(
                rng.integers(0, 2**31, size=n, dtype=np.int64), jnp.int32
            )
            for _ in range(w)
        ]

        def srt(*aa):
            res = jax.lax.sort(aa, is_stable=False, num_keys=1)
            return res[-1]  # fetch one payload operand

        out[f"pay{w}_ms"] = _timeit(srt, *ops)
    # the decision number: key + 16-word payload = the rows ride the sort
    out["rows_ride_sort_ms"] = out["pay16_ms"]
    return out


# ---------------------------------------------------------------------------
# Pallas probes
# ---------------------------------------------------------------------------


def _interp() -> bool:
    import jax

    return jax.devices()[0].platform != "tpu"


def probe_route(n: int = 1 << 20, T: int = 2048) -> dict:
    """Per-row dynamic routing inside VMEM: out[dst[i]] = in[i] per tile.
    The inner step of ANY in-VMEM binning/permutation kernel; its ns/row
    is a lower bound on a route-based pass."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C = n // T
    rng = np.random.default_rng(3)
    data = jnp.asarray(
        rng.integers(0, 2**31, size=(C, T, 16), dtype=np.int64), jnp.int32
    )
    dst = jnp.asarray(
        np.stack([rng.permutation(T) for _ in range(C)]).astype(np.int32)
    )

    def kernel(dst_ref, in_ref, out_ref):
        def body(i, _):
            d = dst_ref[0, i]
            out_ref[0, pl.ds(d, 1), :] = in_ref[0, pl.ds(i, 1), :]
            return 0

        jax.lax.fori_loop(0, T, body, 0, unroll=4)

    def route(d, x):
        return pl.pallas_call(
            kernel,
            grid=(C,),
            in_specs=[
                pl.BlockSpec((1, T), lambda c: (c, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, T, 16), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, T, 16), lambda c: (c, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, T, 16), jnp.int32),
            interpret=_interp(),
        )(d, x)[:, :, 0]

    # correctness check on one tile
    got = np.asarray(
        route(dst, data)
    )
    want = np.zeros_like(got)
    dn, xn = np.asarray(dst), np.asarray(data)
    for c in range(min(2, C)):
        want[c, dn[c]] = xn[c, :, 0]
    assert (got[:2] == want[:2]).all(), "route kernel wrong"
    ms = _timeit(route, dst, data)
    return {"ms": ms, "ns_per_row": ms * 1e6 / n}


def probe_dma(n: int = 1 << 20) -> dict:
    """Chunked-DMA exchange rate: m chunks of k rows copied HBM->VMEM at
    dynamic offsets, NBUF in flight — the per-RUN descriptor regime of a
    group-local radix partition (vs the per-ROW regime the r2 rejection
    measured). Reports ns/row at k in {8, 32, 128}."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(4)
    table = jnp.asarray(
        rng.integers(0, 2**31, size=(n, 16), dtype=np.int64), jnp.int32
    )
    out = {}
    for k in (8, 32, 128):
        m = n // k  # chunks to move n rows
        offs = jnp.asarray(
            (rng.integers(0, m, size=m) * k).astype(np.int32)
        )
        PER = 512 // k if k < 512 else 1  # chunks per grid step
        PER = max(PER, 1)
        NBUF = 4

        DEPTH = min(NBUF - 1, PER)  # chunks in flight (slots are reused
        # modulo NBUF, so at most NBUF-1 may be outstanding at once)

        def kernel(off_ref, hbm_ref, out_ref, scratch, sems):
            def get(slot, j):
                return pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(off_ref[j], k), :],
                    scratch.at[slot],
                    sems.at[slot],
                )

            for j in range(DEPTH):
                get(j % NBUF, j).start()

            def body(j, _):
                slot = j % NBUF

                @pl.when(j + DEPTH < PER)
                def _():
                    get((j + DEPTH) % NBUF, j + DEPTH).start()

                get(slot, j).wait()
                out_ref[pl.ds(j * k, k), :] = scratch[slot]
                return 0

            jax.lax.fori_loop(0, PER, body, 0)

        def run(off, tbl, k=k, m=m, PER=PER, NBUF=NBUF, kern=kernel):
            return pl.pallas_call(
                kern,
                grid=(m // PER,),
                in_specs=[
                    pl.BlockSpec((PER,), lambda c: (c,),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec((PER * k, 16), lambda c: (c, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((m * k, 16), jnp.int32),
                scratch_shapes=[
                    pltpu.VMEM((NBUF, k, 16), jnp.int32),
                    pltpu.SemaphoreType.DMA((NBUF,)),
                ],
                interpret=_interp(),
            )(off, tbl)

        # correctness: chunk j must equal table[offs[j]:offs[j]+k]
        got = np.asarray(run(offs, table))
        on = np.asarray(offs)
        tn = np.asarray(table)
        for j in (0, 1, m - 1):
            assert (got[j * k : (j + 1) * k] == tn[on[j] : on[j] + k]).all()
        ms = _timeit(run, offs, table)
        out[f"k{k}_ms"] = ms
        out[f"k{k}_ns_per_row"] = ms * 1e6 / n
    return out


def probe_mxu_perm(n: int = 1 << 20, T: int = 1024) -> dict:
    """In-VMEM one-hot matmul permutation of 64 B rows: int32 words split
    into 4 exact bf16 digits, [T, T] one-hot @ [T, 64], f32 accum,
    recombine. The local-reorder primitive of a two-stage partition."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C = n // T
    rng = np.random.default_rng(5)
    data = jnp.asarray(
        rng.integers(0, 2**31, size=(C, T, 16), dtype=np.int64), jnp.int32
    )
    dst = jnp.asarray(
        np.stack([rng.permutation(T) for _ in range(C)]).astype(np.int32)
    )

    def kernel(dst_ref, in_ref, out_ref):
        x = in_ref[0]  # [T, 16] int32
        # 4 exact unsigned 8-bit digits per word -> [T, 64] bf16
        digs = [
            ((x >> (8 * d)) & 0xFF).astype(jnp.bfloat16) for d in range(4)
        ]
        xd = jnp.concatenate(digs, axis=1)  # [T, 64]
        rows = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
        # onehot[i, j] = (dst[j] == i), so out[i] = sum_j onehot[i,j]*xd[j]
        onehot = (rows == dst_ref[0][None, :]).astype(jnp.bfloat16)
        y = jnp.dot(onehot, xd, preferred_element_type=jnp.float32)
        yi = y.astype(jnp.int32)  # exact: digits < 256, one-hot rows
        acc = yi[:, :16]
        for d in range(1, 4):
            acc = acc | (yi[:, 16 * d : 16 * (d + 1)] << (8 * d))
        out_ref[0] = acc

    def perm(d, x):
        return pl.pallas_call(
            kernel,
            grid=(C,),
            in_specs=[
                pl.BlockSpec((1, T), lambda c: (c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, 16), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, T, 16), lambda c: (c, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, T, 16), jnp.int32),
            interpret=_interp(),
        )(d, x)

    got = np.asarray(perm(dst, data))
    dn, xn = np.asarray(dst), np.asarray(data)
    for c in range(min(2, C)):
        want = np.zeros((T, 16), np.int32)
        want[dn[c]] = xn[c]
        assert (got[c] == want).all(), "mxu_perm kernel wrong"
    ms = _timeit(perm, dst, data)
    return {"ms": ms, "ns_per_row": ms * 1e6 / n, "tile": T}


PROBES = {
    "gather": probe_gather,
    "scatter": probe_scatter,
    "sortpay": probe_sortpay,
    "route": probe_route,
    "dma": probe_dma,
    "mxu_perm": probe_mxu_perm,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="")
    ap.add_argument("--only", default="")
    ap.add_argument("--n", type=int, default=20, help="log2 rows")
    args = ap.parse_args()
    import jax

    n = 1 << args.n
    names = args.only.split(",") if args.only else list(PROBES)
    results = {"n_log2": args.n, "platform": jax.devices()[0].platform}
    for name in names:
        t0 = time.time()
        try:
            results[name] = PROBES[name](n)
        except Exception as e:  # record the failure, keep probing
            results[name] = {"error": f"{e!r}"[:300]}
        print(f"[probe] {name}: {results[name]} "
              f"({time.time()-t0:.1f}s incl compile)", file=sys.stderr)
    line = json.dumps(results)
    print(line)
    if args.json:
        with open(args.json, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
