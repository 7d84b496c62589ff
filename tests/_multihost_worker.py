"""Subprocess worker for the 2-process multi-host test.

Run as: python _multihost_worker.py <process_id> <num_processes> <port>

Each process pins the CPU backend with 2 local devices, joins the
distributed runtime through ``init_multihost`` (localhost coordinator), and
runs the SPMD multi-host MSM over the 4-device global mesh. Every process
prints the replicated affine result; the pytest parent asserts both match
the oracle.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    proc_id, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    from msm_tpu.parallel.multihost import init_multihost, run_msm_multihost

    init_multihost(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=proc_id,
    )
    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.devices()) == 2 * nprocs, len(jax.devices())

    import numpy as np

    from msm_tpu.oracle.pyecc import Curve
    from msm_tpu.params import BN254, MsmConfig

    cv = Curve(BN254)
    n = 512
    base = [cv.to_affine(p) for p in cv.sample_points(32, seed=5)]
    pts = [base[i % len(base)] for i in range(n)]
    rng = np.random.default_rng(6)
    ks = [
        int.from_bytes(rng.bytes(32), "little") % BN254.order
        for _ in range(n)
    ]
    cfg = MsmConfig(curve=BN254, chunk_size=8)
    res = run_msm_multihost(pts, ks, config=cfg)
    aff = cv.to_affine(res)
    print(f"MULTIHOST_RESULT {proc_id} {aff[0]} {aff[1]}", flush=True)


if __name__ == "__main__":
    main()
