"""Measurement suite: can radix-partition/binning beat the sort+gather block?

VERDICT r3 item 1: the 138 ms sort+gather block (103 ms random row gather +
35 ms lax.sort at 2^20 x 16 subtasks) is the only non-VPU-roofline-bound
piece of the MSM budget, and the standard GPU answer (multi-pass bucket
binning) was rejected in r2/r3 on estimates. This script measures every
primitive such a design would be built from, on the real chip, so the
decision is data.

Measurement model (PERF_NOTES rules): a single 2^20-row op sits UNDER the
~25 ms axon dispatch floor, so every probe amortizes exactly like
production — S=16 independent instances inside ONE jitted program (the 16
subtasks of a 2^20 MSM) — and reports (wall - floor)/S per instance next
to the raw wall time. `floor_ms` is the measured null-program fetch.

  sweep       THE DECISION PROBE. Head-to-head at production shape
              (n=2^20, 16 subtasks, 64 B packed rows, lax.map batch 4):
                a) sortgather: sort (key, idx+sign payload), step-major
                   payload transpose, table[perm] row gather  [today]
                b) sortride:   sort (key, sign, 16 row words) — the rows
                   ride the sort as payload operands; NO gather; the 16
                   sorted columns transpose to kernel layout [candidate]
              If b < a, the 103 ms gather disappears behind a wider sort.
  gather      locality probes (random vs sequential vs bin-local indices),
              16 gathers/program. If sequential ~= random, the gather
              engine is descriptor-bound and NO partitioning can help.
  scatter     out.at[perm].set(rows): is the scatter direction cheaper?
  sortpay     lax.sort carrying W extra int32 payloads, W in {1,4,16} —
              the sort-cost-vs-width curve behind the sweep verdict.
  route       Pallas per-row VMEM->VMEM dynamic-index row copy (the
              binning kernel's inner routing step), 16n rows.
  dma         Pallas chunked-DMA rate: k-row copies (k in {8,32,128}) at
              dynamic offsets, 4 in flight — the run-granular exchange a
              group-local partition would use (the r2 rejection
              extrapolated the per-ROW rate; this measures per-RUN).
  mxu_perm    one-hot bf16 matmul permutation of 64 B rows inside VMEM
              (the local-reorder primitive of a two-stage partition).

Usage: python scripts/binning_probe.py [--json out.json] [--only a,b,c]
Run with nothing else on the TPU. On CPU it runs in interpret mode
(correctness smoke of the kernels; rates are meaningless).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

S = 16  # instances per program (production: 16 subtasks)


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


_FLOOR = None


def dispatch_floor_ms() -> float:
    """Measured null-program dispatch+fetch cost (the axon relay floor)."""
    global _FLOOR
    if _FLOOR is None:
        import jax.numpy as jnp

        _FLOOR = _timeit(lambda x: x * 2 + 1, jnp.float32(3.0), reps=7)
    return _FLOOR


def _amort(ms: float, s: int = S) -> float:
    return max(ms - dispatch_floor_ms(), 0.0) / s


# ---------------------------------------------------------------------------
# XLA-level probes
# ---------------------------------------------------------------------------


def probe_sweep(n: int = 1 << 20) -> dict:
    """Production-shape decision: sort+gather (today) vs rows-ride-sort."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    R = min(16384, n // 4)  # production num_rows at 2^20
    C = n // R
    table = jnp.asarray(
        rng.integers(0, 2**31, size=(n, 16), dtype=np.int64), jnp.int32
    )
    keys = jnp.asarray(
        rng.integers(0, 1 << 15, size=(S, n), dtype=np.int64), jnp.int32
    )
    signs = jnp.asarray(
        rng.integers(0, 2, size=(S, n), dtype=np.int64), jnp.int32
    )
    sbit = (n - 1).bit_length()

    def sortgather(tbl, ks, sg):
        def one(args):
            k, s = args
            pv = jnp.arange(n, dtype=jnp.int32) | (s << sbit)
            _, pv = jax.lax.sort((k, pv), is_stable=False, num_keys=1)
            pv2 = pv.reshape(R, C).swapaxes(0, 1).reshape(n)  # step-major
            perm = pv2 & ((1 << sbit) - 1)
            g = tbl[perm]  # [n, 16] — THE gather
            return g.reshape(C, R, 16).swapaxes(1, 2), pv2 >> sbit

        gs, sgs = jax.lax.map(one, (ks, sg), batch_size=4)
        return jnp.sum(gs) + jnp.sum(sgs)

    def sortride(tbl, ks, sg):
        cols = tuple(tbl[:, w] for w in range(16))

        def one(args):
            k, s = args
            res = jax.lax.sort((k,) + (s,) + cols, is_stable=False,
                               num_keys=1)
            srt = jnp.stack(res[1:], axis=0)  # [17, n] sorted columns
            # step-major kernel layout: [C, 17, R]
            g = srt.reshape(17, R, C).transpose(2, 0, 1)
            return g

        gs = jax.lax.map(one, (ks, sg), batch_size=4)
        return jnp.sum(gs)

    out = {"floor_ms": dispatch_floor_ms()}
    a = _timeit(sortgather, table, keys, signs)
    b = _timeit(sortride, table, keys, signs)
    out["sortgather_ms"] = a
    out["sortride_ms"] = b
    out["sortgather_per_subtask_ms"] = _amort(a)
    out["sortride_per_subtask_ms"] = _amort(b)
    out["verdict"] = "sortride" if b < a else "sortgather"
    return out


def probe_sortride2(n: int = 1 << 20) -> dict:
    """The rescue formulation of rows-ride-sort. probe_sweep showed the
    17-payload sort costs the SAME as the 1-payload sort (sortpay), so
    sortride's 23 ms/subtask loss is entirely the stacked 3-D step-major
    relayout ([17, n] -> [C, 17, R] runs at ~6 GB/s). This probe isolates
    the alternatives:

      trans2d      17 independent [R, C] -> [C, R] 2-D transposes behind an
                   optimization_barrier (is a CLEAN 2-D transpose fast?)
      ride_sep     sort 17 ops -> barrier -> 17 separate 2-D transposes
                   (the scan kernel would take W separate [C, R] refs)
      ride_stack   ... + stack into [C, 17, R] (today's kernel signature)

    Decision: ride_sep < sortgather_per_subtask (9.1 ms) means the 103 ms
    gather disappears; rewire make_scan_rows to take per-word refs."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(8)
    R = min(16384, n // 4)
    C = n // R
    table = jnp.asarray(
        rng.integers(0, 2**31, size=(n, 16), dtype=np.int64), jnp.int32
    )
    keys = jnp.asarray(
        rng.integers(0, 1 << 15, size=(S, n), dtype=np.int64), jnp.int32
    )
    signs = jnp.asarray(
        rng.integers(0, 2, size=(S, n), dtype=np.int64), jnp.int32
    )

    def trans2d(tbl, ks):
        def one(k):
            cols = jax.lax.optimization_barrier(
                tuple(tbl[:, w] + k[0] for w in range(16))
            )
            outs = [c.reshape(R, C).swapaxes(0, 1) for c in cols]
            return sum(jnp.sum(o) for o in outs)

        return jax.lax.map(one, ks, batch_size=4)

    def ride(tbl, ks, sg, stack):
        cols = tuple(tbl[:, w] for w in range(16))

        def one(args):
            k, s = args
            res = jax.lax.sort((k,) + (s,) + cols, is_stable=False,
                               num_keys=1)
            srt = jax.lax.optimization_barrier(res[1:])
            outs = [c.reshape(R, C).swapaxes(0, 1) for c in srt]
            if stack:
                return jnp.sum(jnp.stack(outs, axis=1))
            return sum(jnp.sum(o) for o in outs)

        return jax.lax.map(one, (ks, sg), batch_size=4)

    out = {"floor_ms": dispatch_floor_ms()}
    ms = _timeit(trans2d, table, keys)
    out["trans2d_ms"] = ms
    out["trans2d_per_subtask_ms"] = _amort(ms)
    ms = _timeit(lambda t, k, s: ride(t, k, s, False), table, keys, signs)
    out["ride_sep_ms"] = ms
    out["ride_sep_per_subtask_ms"] = _amort(ms)
    ms = _timeit(lambda t, k, s: ride(t, k, s, True), table, keys, signs)
    out["ride_stack_ms"] = ms
    out["ride_stack_per_subtask_ms"] = _amort(ms)
    return out


def probe_gather(n: int = 1 << 20) -> dict:
    """16 table[perm] gathers per program; random vs structured indices."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.integers(0, 2**31, size=(n, 16), dtype=np.int64), jnp.int32
    )

    def many(tbl, perms):
        return jax.lax.map(
            lambda p: jnp.sum(tbl[p]), perms, batch_size=4
        )

    out = {"floor_ms": dispatch_floor_ms()}
    variants = {
        "rand": np.stack([rng.permutation(n) for _ in range(S)]),
        "seq": np.stack(
            [np.roll(np.arange(n), 13 * i) for i in range(S)]
        ),
        # random within 8192-row windows (the locality a 128-way coarse
        # partition would buy before the fine gather)
        "binlocal8k": np.stack(
            [
                (np.arange(n) // 8192) * 8192
                + rng.integers(0, 8192, size=n)
                for _ in range(S)
            ]
        ),
    }
    for name, idx in variants.items():
        p = jnp.asarray(idx.astype(np.int32))
        ms = _timeit(many, table, p)
        out[f"{name}_ms"] = ms
        out[f"{name}_ns_per_row"] = _amort(ms) * 1e6 / n
    return out


def probe_scatter(n: int = 1 << 20) -> dict:
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    rows = jnp.asarray(
        rng.integers(0, 2**31, size=(n, 16), dtype=np.int64), jnp.int32
    )
    perms = jnp.asarray(
        np.stack([rng.permutation(n) for _ in range(S)]).astype(np.int32)
    )

    def many(r, ps):
        def one(p):
            return jnp.sum(
                jnp.zeros_like(r).at[p].set(r, unique_indices=True)
            )

        return jax.lax.map(one, ps, batch_size=4)

    ms = _timeit(many, rows, perms)
    return {
        "rand_ms": ms,
        "rand_ns_per_row": _amort(ms) * 1e6 / n,
        "floor_ms": dispatch_floor_ms(),
    }


def probe_sortpay(n: int = 1 << 20) -> dict:
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    keys = jnp.asarray(
        rng.integers(0, 1 << 15, size=(S, n), dtype=np.int64), jnp.int32
    )
    pay = jnp.asarray(
        rng.integers(0, 2**31, size=(16, n), dtype=np.int64), jnp.int32
    )
    out = {"floor_ms": dispatch_floor_ms()}
    # use_all=False fetches ONE payload output (XLA dead-code-eliminates
    # the rest — TPU variadic sort materializes payloads per-operand);
    # use_all=True consumes every output: the cost a consumer of all W
    # sorted columns actually pays. The w-slope of use_all is the
    # per-column materialization rate.
    for w, use_all in ((1, False), (4, False), (16, False), (4, True),
                      (16, True)):
        def many(ks, pv, w=w, use_all=use_all):
            cols = tuple(pv[i] for i in range(w))

            def one(k):
                res = jax.lax.sort(
                    (k,) + cols, is_stable=False, num_keys=1
                )
                if use_all:
                    return sum(jnp.sum(r) for r in res[1:])
                return jnp.sum(res[-1])

            return jax.lax.map(one, ks, batch_size=4)

        ms = _timeit(many, keys, pay)
        tag = f"pay{w}{'_all' if use_all else ''}"
        out[f"{tag}_ms"] = ms
        out[f"{tag}_per_subtask_ms"] = _amort(ms)
    return out


# ---------------------------------------------------------------------------
# Pallas probes
# ---------------------------------------------------------------------------


def _interp() -> bool:
    import jax

    return jax.devices()[0].platform != "tpu"


def probe_route(n: int = 1 << 20, T: int = 2048) -> dict:
    """Per-row dynamic routing inside VMEM: out[dst[i]] = in[i] per tile,
    over S*n rows. The inner step of ANY in-VMEM binning/permutation
    kernel; its ns/row is a lower bound on a route-based pass."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    total = S * n if not _interp() else n
    C = total // T
    rng = np.random.default_rng(3)
    data = jnp.asarray(
        rng.integers(0, 2**31, size=(C, T, 16), dtype=np.int64), jnp.int32
    )
    dst = jnp.asarray(
        np.stack([rng.permutation(T) for _ in range(C)])
        .astype(np.int32)
        .reshape(C, 1, T)
    )

    def kernel(dst_ref, in_ref, out_ref):
        def body(i, _):
            d = dst_ref[0, 0, i]
            out_ref[0, pl.ds(d, 1), :] = in_ref[0, pl.ds(i, 1), :]
            return 0

        jax.lax.fori_loop(0, T, body, 0, unroll=4)

    def route(d, x):
        return pl.pallas_call(
            kernel,
            grid=(C,),
            in_specs=[
                pl.BlockSpec((1, 1, T), lambda c: (c, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, T, 16), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, T, 16), lambda c: (c, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, T, 16), jnp.int32),
            interpret=_interp(),
        )(d, x)[:, :, 0]

    got = np.asarray(route(dst, data))
    want = np.zeros_like(got)
    dn, xn = np.asarray(dst)[:, 0], np.asarray(data)
    for c in range(min(2, C)):
        want[c, dn[c]] = xn[c, :, 0]
    assert (got[:2] == want[:2]).all(), "route kernel wrong"
    ms = _timeit(route, dst, data)
    return {
        "ms": ms,
        "ns_per_row": max(ms - dispatch_floor_ms(), 0.0) * 1e6 / total,
        "floor_ms": dispatch_floor_ms(),
    }


def probe_dma(n: int = 1 << 20) -> dict:
    """Chunked-DMA exchange rate: S*n rows moved as k-row chunks copied
    HBM->VMEM at dynamic offsets into a 2^20-row table, 3 in flight — the
    per-RUN descriptor regime of a group-local radix partition (vs the
    per-ROW regime the r2 rejection measured)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(4)
    table = jnp.asarray(
        rng.integers(0, 2**31, size=(n, 16), dtype=np.int64), jnp.int32
    )
    total = S * n if not _interp() else n
    out = {"floor_ms": dispatch_floor_ms()}
    for k in (8, 32, 128):
        m = total // k  # chunks to move total rows
        PER = max(512 // k, 1)  # chunks per grid step
        offs = jnp.asarray(
            (rng.integers(0, n // k, size=m) * k)
            .astype(np.int32)
            .reshape(m // PER, 1, PER)
        )
        NBUF = 4
        DEPTH = min(NBUF - 1, PER)

        def kernel(off_ref, hbm_ref, out_ref, scratch, sems, k=k, PER=PER,
                   NBUF=NBUF, DEPTH=DEPTH):
            def get(slot, j):
                return pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(off_ref[0, 0, j], k), :],
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
                    pl.BlockSpec((1, 1, PER), lambda c: (c, 0, 0),
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

        got = np.asarray(run(offs, table)[: 2 * k])
        on = np.asarray(offs).reshape(-1)
        tn = np.asarray(table)
        for j in (0, 1):
            assert (got[j * k : (j + 1) * k] == tn[on[j] : on[j] + k]).all()
        ms = _timeit(run, offs, table)
        out[f"k{k}_ms"] = ms
        out[f"k{k}_ns_per_row"] = (
            max(ms - dispatch_floor_ms(), 0.0) * 1e6 / total
        )
    return out


def probe_mxu_perm(n: int = 1 << 20, T: int = 1024) -> dict:
    """In-VMEM one-hot matmul permutation of 64 B rows: int32 words split
    into 4 exact bf16 digits, [T, T] one-hot @ [T, 64], f32 accum,
    recombine. The local-reorder primitive of a two-stage partition."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    total = S * n if not _interp() else n
    C = total // T
    rng = np.random.default_rng(5)
    data = jnp.asarray(
        rng.integers(0, 2**31, size=(C, T, 16), dtype=np.int64), jnp.int32
    )
    dst = jnp.asarray(
        np.stack([rng.permutation(T) for _ in range(C)])
        .astype(np.int32)
        .reshape(C, 1, T)
    )

    def kernel(dst_ref, in_ref, out_ref):
        x = in_ref[0]  # [T, 16] int32
        digs = [
            ((x >> (8 * d)) & 0xFF).astype(jnp.bfloat16) for d in range(4)
        ]
        xd = jnp.concatenate(digs, axis=1)  # [T, 64]
        rows = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
        onehot = (rows == dst_ref[0, 0][None, :]).astype(jnp.bfloat16)
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
                pl.BlockSpec((1, 1, T), lambda c: (c, 0, 0),
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
    dn, xn = np.asarray(dst)[:, 0], np.asarray(data)
    for c in range(min(2, C)):
        want = np.zeros((T, 16), np.int32)
        want[dn[c]] = xn[c]
        assert (got[c] == want).all(), "mxu_perm kernel wrong"
    ms = _timeit(perm, dst, data)
    return {
        "ms": ms,
        "ns_per_row": max(ms - dispatch_floor_ms(), 0.0) * 1e6 / total,
        "tile": T,
        "floor_ms": dispatch_floor_ms(),
    }


PROBES = {
    "sweep": probe_sweep,
    "sortride2": probe_sortride2,
    "gather": probe_gather,
    "scatter": probe_scatter,
    "sortpay": probe_sortpay,
    "route": probe_route,
    "dma": probe_dma,
    "mxu_perm": probe_mxu_perm,
}

#: default run: the decision probes. The Pallas binning primitives (route/
#: dma/mxu_perm) are MOOT after the gather-locality result (random ==
#: sequential == bin-local at 6.2 ns/row: no index transformation can speed
#: the gather engine) — run them explicitly with --only if ever needed.
DEFAULT = ["sweep", "sortride2", "gather", "scatter", "sortpay"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="")
    ap.add_argument("--only", default="")
    ap.add_argument("--n", type=int, default=20, help="log2 rows")
    args = ap.parse_args()
    import jax

    n = 1 << args.n
    names = args.only.split(",") if args.only else DEFAULT
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
