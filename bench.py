"""Headline benchmark: 2^20 BN254 MSM wall-clock on one TPU chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
computed against a documented estimate of the reference's class of result:
WebGPU cuZK MSM at 2^20 on a desktop GPU runs ~2 s wall-clock (the cuZK
paper's own V100 CUDA figure for 2^20 is ~0.1 s; browser WebGPU
implementations of this codebase's lineage report 1-3 s). We use
BASELINE_MS = 2000 and report speedup = baseline / ours.

Flags:
    --size N       log2 MSM size (default 20)
    --verify       cross-check the result against the CPU oracle (2^16 only
                   by default; slow at 2^20)
    --timings      also print a human-readable stage breakdown to stderr
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

BASELINE_MS = 2000.0  # documented estimate; see module docstring


def sample_inputs(n: int, cfg, seed: int = 0):
    """Benchmark inputs: 1024 distinct curve points tiled to n (point
    distinctness doesn't change MSM cost), uniform random scalars."""
    from msm_tpu.models import common
    from msm_tpu.oracle.pyecc import Curve

    cv = Curve(cfg.curve)
    nbase = min(n, 1024)
    base = [cv.to_affine(p) for p in cv.sample_points(nbase, seed=seed)]
    pts = [base[i % nbase] for i in range(n)]
    rng = np.random.default_rng(seed + 1)
    ks = [
        int.from_bytes(rng.bytes(32), "little") % cfg.curve.order
        for _ in range(n)
    ]
    return pts, ks


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=20)
    ap.add_argument("--chunk", type=int, default=0, help="override window size (0 = config default)")
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--timings", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from msm_tpu.models import common
    from msm_tpu.models.cuzk import cuzk_window_sums
    from msm_tpu.models.geometry import pick_geometry
    from msm_tpu.params import BN254, MsmConfig, pick_config

    n = 1 << args.size
    cfg = MsmConfig(curve=BN254, chunk_size=args.chunk) if args.chunk else pick_config(n)
    t0 = time.time()
    pts, ks = sample_inputs(n, cfg)
    x_u16, y_u16, s_u16 = common.pad_inputs(pts, ks, cfg)
    geom = pick_geometry(x_u16.shape[0], cfg.chunk_size)
    xd, yd, sd = jnp.asarray(x_u16), jnp.asarray(y_u16), jnp.asarray(s_u16)
    print(f"[bench] setup {time.time()-t0:.1f}s; n=2^{args.size}, "
          f"device={jax.devices()[0].platform}", file=sys.stderr)

    # warmup / compile
    t0 = time.time()
    ws = cuzk_window_sums(xd, yd, sd, cfg, geom)
    ws.block_until_ready()
    print(f"[bench] compile+first-run {time.time()-t0:.1f}s", file=sys.stderr)

    times = []
    for _ in range(args.reps):
        t0 = time.time()
        ws = cuzk_window_sums(xd, yd, sd, cfg, geom)
        ws.block_until_ready()
        dev_s = time.time() - t0
        t1 = time.time()
        res = common.window_sums_to_result(np.asarray(ws), cfg)
        host_s = time.time() - t1
        times.append(dev_s + host_s)
        if args.timings:
            print(f"[bench] device {dev_s*1e3:.1f} ms + host horner "
                  f"{host_s*1e3:.1f} ms", file=sys.stderr)
    ms = min(times) * 1e3

    if args.verify:
        from msm_tpu.oracle import best_msm
        from msm_tpu.oracle.pyecc import Curve

        cv = Curve(cfg.curve)
        want = best_msm(pts, ks, curve=cfg.curve)
        assert cv.eq(res, want), "MSM result does not match CPU oracle"
        print("[bench] verified vs CPU oracle", file=sys.stderr)

    print(json.dumps({
        "metric": f"bn254_msm_2^{args.size}_wall_clock",
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / ms, 3),
    }))


if __name__ == "__main__":
    main()
