"""Trace one cuzk_window_sums run and print the device-time budget by op.

Usage: python scripts/trace_breakdown.py [--size 20] [--glv] [--compress]
Parses the Perfetto trace.json.gz the jax profiler writes and groups TPU
device-track slices by op-name prefix, printing a sorted ms table.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import shutil
import sys
import tempfile
from collections import defaultdict
from dataclasses import replace

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=20)
    ap.add_argument("--glv", action="store_true")
    ap.add_argument("--compress", action="store_true")
    ap.add_argument("--karatsuba", action="store_true")
    ap.add_argument("--rows", type=int, default=0)
    ap.add_argument("--keep", default="", help="keep trace dir at this path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from msm_tpu.models import common
    from msm_tpu.models.cuzk import cuzk_window_sums
    from msm_tpu.models.geometry import MsmGeometry, pick_geometry
    from msm_tpu.oracle.pyecc import Curve
    from msm_tpu.params import pick_config

    n = 1 << args.size
    cfg = replace(pick_config(n), glv=args.glv, compress=args.compress,
                  karatsuba=args.karatsuba)
    cv = Curve(cfg.curve)
    basep = [cv.to_affine(p) for p in cv.sample_points(256, seed=1)]
    pts = [basep[i % 256] for i in range(n)]
    rng = np.random.default_rng(2)
    ks = [
        int.from_bytes(rng.bytes(32), "little") % cfg.curve.order
        for _ in range(n)
    ]
    x, y, s = common.pad_inputs(pts, ks, cfg)
    geom = pick_geometry(x.shape[0], cfg.chunk_size, compress=cfg.compress)
    if args.rows:
        geom = MsmGeometry(args.rows, geom.bpr_threads, geom.subtask_batch)
    xd, yd, sd = jnp.asarray(x), jnp.asarray(y), jnp.asarray(s)

    ws = cuzk_window_sums(xd, yd, sd, cfg, geom)
    float(jnp.sum(ws).block_until_ready())  # compile + warm

    tdir = args.keep or tempfile.mkdtemp(prefix="msmtrace")
    jax.profiler.start_trace(tdir)
    ws = cuzk_window_sums(xd, yd, sd, cfg, geom)
    float(jnp.sum(ws).block_until_ready())
    jax.profiler.stop_trace()

    paths = glob.glob(
        os.path.join(tdir, "**", "*.trace.json.gz"), recursive=True
    )
    assert paths, f"no trace under {tdir}"
    with gzip.open(paths[0], "rt") as f:
        tr = json.load(f)

    events = tr["traceEvents"]
    # find device-track pids (process names containing TPU/device)
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")

    dev_pids = {
        p for p, nm in pid_name.items()
        if "TPU" in nm or "tpu" in nm or "Device" in nm
    }
    by_op = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        tname = tid_name.get((e["pid"], e["tid"]), "")
        if "step" in tname.lower():
            continue  # steps track duplicates op slices
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        by_op[name] += dur
        total += dur
    label = pid_name if not by_op else None
    if label:
        print("process names:", json.dumps(pid_name, indent=1)[:2000])
    rows = sorted(by_op.items(), key=lambda kv: -kv[1])
    print(f"config: glv={cfg.glv} compress={cfg.compress} rows={geom.num_rows}"
          f" bs={geom.subtask_batch}")
    print(f"total device ms: {total:.1f}")
    acc = 0.0
    for nm, ms in rows[:40]:
        acc += ms
        print(f"{ms:9.2f}  {nm[:110]}")
    print(f"(top-40 cover {acc:.1f} ms)")
    if not args.keep:
        shutil.rmtree(tdir, ignore_errors=True)


if __name__ == "__main__":
    main()
