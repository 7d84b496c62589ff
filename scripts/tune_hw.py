"""Hardware sweep: measure the round-2 optimizations on a real chip.

Run (one TPU process at a time!):
    python scripts/tune_hw.py --size 20 [--quick]

Sweeps {base, glv, compress, glv+compress} x {num_rows} at 2^size, plus a
verify pass vs the C++ oracle for the winning config. Prints one JSON line
per measurement (append-friendly). Timing follows PERF_NOTES rules: fetch
a scalar reduction to synchronize (block_until_ready under-synchronizes on
axon), amortize the ~27 ms dispatch by taking min over reps.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from dataclasses import replace

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--quick", action="store_true",
                    help="only base vs glv+compress at default rows")
    ap.add_argument("--only", default="",
                    help="comma-separated variant-name filter")
    ap.add_argument("--verify", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from msm_tpu.models import common
    from msm_tpu.models.cuzk import cuzk_msm_point
    from msm_tpu.models.geometry import MsmGeometry, pick_geometry
    from msm_tpu.oracle.pyecc import Curve
    from msm_tpu.params import BN254, pick_config

    n = 1 << args.size
    base_cfg = pick_config(n)
    cv = Curve(BN254)
    basep = [cv.to_affine(p) for p in cv.sample_points(256, seed=1)]
    pts = [basep[i % 256] for i in range(n)]
    rng = np.random.default_rng(2)
    ks = [
        int.from_bytes(rng.bytes(32), "little") % BN254.order
        for _ in range(n)
    ]
    x_u16, y_u16, s_u16 = common.pad_inputs(pts, ks, base_cfg)
    xd, yd, sd = jnp.asarray(x_u16), jnp.asarray(y_u16), jnp.asarray(s_u16)

    def sync(ws):
        return float(jnp.sum(ws).block_until_ready())

    variants = [
        # (name, cfg flags, num_rows override, subtask_batch override)
        ("base", dict(glv=False, compress=False), None, None),
        ("glv", dict(glv=True, compress=False), None, None),
        ("compress", dict(glv=False, compress=True), None, None),
        ("glv+compress", dict(glv=True, compress=True), None, None),
        ("glv+compress_r2048", dict(glv=True, compress=True), 2048, None),
        ("compress_r2048", dict(glv=False, compress=True), 2048, None),
        ("glv+compress_r512", dict(glv=True, compress=True), 512, None),
        # lax.map batch re-check: bs=4 won pre-compression; the compression
        # kernels change the program under the batching rule (and bs>1 is
        # the platform's known miscompile surface — verify gates it)
        ("glv+compress_bs1", dict(glv=True, compress=True), None, 1),
        ("glv+compress_bs8", dict(glv=True, compress=True), None, 8),
    ]
    if args.quick:
        variants = [variants[0], variants[3]]
    if args.only:
        keep = set(args.only.split(","))
        variants = [v for v in variants if v[0] in keep]

    want = None
    if args.verify:
        from msm_tpu.oracle import best_msm

        want = best_msm(pts, ks)  # loop-invariant: one oracle MSM total

    results = {}
    for name, flags, rows, bs in variants:
        cfg = replace(base_cfg, **flags)
        geom = pick_geometry(
            x_u16.shape[0], cfg.chunk_size, compress=cfg.compress
        )
        if rows or bs:
            geom = MsmGeometry(
                rows or geom.num_rows,
                geom.bpr_threads,
                bs or geom.subtask_batch,
            )
        try:
            t0 = time.time()
            pt = cuzk_msm_point(xd, yd, sd, cfg, geom)
            sync(pt)
            compile_s = time.time() - t0
            times = []
            for _ in range(args.reps):
                t0 = time.time()
                pt = cuzk_msm_point(xd, yd, sd, cfg, geom)
                sync(pt)
                times.append(time.time() - t0)
            ms = min(times) * 1e3
            results[name] = ms
            print(json.dumps({
                "variant": name, "size": args.size, "ms": round(ms, 1),
                "rows": geom.num_rows, "compile_s": round(compile_s, 1),
            }), flush=True)
            if args.verify:
                res = common.std_point_to_jpoint(np.asarray(pt), cfg)
                ok = cv.eq(res, want)
                print(json.dumps({"variant": name, "verified": bool(ok)}),
                      flush=True)
                assert ok, f"{name}: MISMATCH vs oracle"
        except Exception as e:  # keep sweeping on a single-variant failure
            results.pop(name, None)  # a miscompiled variant must not win
            print(json.dumps({"variant": name, "error": repr(e)[:200]}),
                  flush=True)
    if results:
        best = min(results, key=results.get)
        print(json.dumps({"best": best, "ms": round(results[best], 1),
                          "speedup_vs_base":
                          round(results.get("base", 0) / results[best], 3)
                          if "base" in results else None}), flush=True)


if __name__ == "__main__":
    main()
