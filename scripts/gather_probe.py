"""Microbenchmark: sorted-gather formulations on the real chip.

The per-subtask coordinate gather (packed[perm] of 64 B rows) is ~100 ms of
the 2^20 MSM. This probes alternatives at one-subtask scale (2^20 rows):

  take_row     g = packed[perm]                      (the production form)
  take_row32   32 B rows (x only)                    (is it really row-count bound?)
  take_row128  128 B rows (2 points per row)         (half the descriptors?)
  col16        16 separate column gathers            (element-type gathers)
  onechunk8    permutation quantized to 8-row groups (tile-aligned reads;
               NOT a valid MSM gather — rate probe only)
  twostage     coarse 256-way partition via sort-by-(perm>>12) first, then
               gather from the locally-denser order (locality probe)

Prints one JSON line per form. Run with nothing else on the TPU.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = 1 << 20
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.integers(0, 2**31, size=(n, 16), dtype=np.int64), jnp.int32
    )
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))

    def timeit(f, *a, reps=5):
        # fetch a scalar reduction: block_until_ready under-synchronizes on
        # the axon relay (PERF_NOTES measurement rules)
        g = jax.jit(lambda *aa: jnp.sum(f(*aa)))
        float(g(*a))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(g(*a))
            ts.append(time.time() - t0)
        return min(ts) * 1e3

    results = {}

    results["take_row64B"] = timeit(lambda t, p: t[p], table, perm)
    t32 = table[:, :8]
    results["take_row32B"] = timeit(lambda t, p: t[p], t32, perm)
    t128 = jnp.concatenate([table, table], axis=1)
    results["take_row128B_halfrows"] = timeit(
        lambda t, p: t[p], t128, perm[: n // 2]
    )
    results["col16"] = timeit(
        lambda t, p: jnp.stack([t[:, j][p] for j in range(16)], axis=-1),
        table,
        perm,
    )
    # 8-row groups: gather n/8 rows of 512 B (rate probe only)
    tg = table.reshape(n // 8, 128)
    results["group8_512B"] = timeit(
        lambda t, p: t[p], tg, perm[: n // 8] % (n // 8)
    )
    # gather fused into a cheap consumer (does XLA fuse differently?)
    results["take_row64B_sum"] = timeit(
        lambda t, p: t[p].sum(axis=-1), table, perm
    )
    # take_along_axis formulation
    results["take_along"] = timeit(
        lambda t, p: jnp.take_along_axis(
            t, p[:, None] + jnp.zeros((1, 16), jnp.int32), axis=0
        ),
        table,
        perm,
    )
    # sequential-index gather (upper bound: perfectly coalesced)
    seq = jnp.arange(n, dtype=jnp.int32)
    results["take_row64B_seq"] = timeit(lambda t, p: t[p], table, seq)
    # reversed-sequential (still tile-local)
    results["take_row64B_rev"] = timeit(lambda t, p: t[p], table, seq[::-1])
    # 2^16-row table tiled (fits VMEM easily): latency vs table size
    tsmall = table[: 1 << 16]
    results["take_64B_smalltable"] = timeit(
        lambda t, p: t[p % (1 << 16)], tsmall, perm
    )
    # table-size cliff: same n gather rows, growing tables (MB = rows*w*4)
    for rows_log, width in ((20, 16), (20, 24), (20, 32), (21, 16), (21, 12),
                            (22, 16)):
        m = 1 << rows_log
        tbl = jnp.asarray(
            rng.integers(0, 2**31, size=(m, width), dtype=np.int64),
            jnp.int32,
        )
        pm = jnp.asarray(rng.integers(0, m, size=n, dtype=np.int64), jnp.int32)
        mb = m * width * 4 >> 20
        results[f"tbl{mb}MB_{width*4}B"] = timeit(lambda t, p: t[p], tbl, pm)
        del tbl, pm
    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
