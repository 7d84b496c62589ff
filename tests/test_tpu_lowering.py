"""AOT TPU-lowering regression test (no TPU device needed).

``jax.export`` with ``platforms=("tpu",)`` runs the full StableHLO +
Pallas->Mosaic *lowering* pipeline for the TPU target on a CPU host. That
exercises every production kernel's Mosaic serialization (block specs,
layouts, unsupported-op checks) — the failure class that otherwise only
surfaces on real hardware. (The Mosaic *backend* compile still happens
on-device; this test is the strictly-stronger-than-interpret static gate.)

The reference's analogue is shader-compilation testing: its WGSL templates
are compiled by wgpu at pipeline creation (``src/cuzk/gpu.rs:281-293``)
in every GPU test; here the kernel "compiler" can run hardware-free.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msm_tpu.models import common
from msm_tpu.models.cuzk import cuzk_window_sums
from msm_tpu.models.geometry import pick_geometry
from msm_tpu.oracle.pyecc import Curve
from msm_tpu.ops import curve as curve_mod
from msm_tpu.params import BN254, pick_config


@pytest.fixture
def pallas_on():
    # force the fused-kernel call sites on (normally off on the CPU
    # backend) so the TPU lowering includes every production kernel
    curve_mod.set_pallas_mode("on")
    yield
    curve_mod.set_pallas_mode("auto")


def _inputs(n, cfg, seed=1):
    cv = Curve(cfg.curve)
    base = [cv.to_affine(p) for p in cv.sample_points(8, seed=seed)]
    pts = [base[i % 8] for i in range(n)]
    rng = np.random.default_rng(seed + 1)
    ks = [
        int.from_bytes(rng.bytes(32), "little") % cfg.curve.order
        for _ in range(n)
    ]
    return common.pad_inputs(pts, ks, cfg)


# the base-config lowering gate runs in the DEFAULT tier: on a platform
# with a composition-miscompile history (models/common.py:29-37) the
# Pallas->Mosaic lowering of the production pipeline is the highest-value
# hardware-free check the suite has. The frozen glv+compress variant stays
# behind --runslow.
@pytest.mark.parametrize(
    "glv,compress",
    [(False, False), pytest.param(True, True, marks=pytest.mark.slow)],
)
def test_production_pipeline_lowers_for_tpu(pallas_on, glv, compress):
    from dataclasses import replace

    from jax import export

    n = 1 << 14
    cfg = replace(pick_config(1 << 20), glv=glv, compress=compress)  # chunk 16
    x, y, s = _inputs(n, cfg)
    geom = pick_geometry(x.shape[0], cfg.chunk_size, compress=cfg.compress)

    def f(xa, ya, sa):
        return cuzk_window_sums(xa, ya, sa, cfg, geom)

    exp = export.export(jax.jit(f), platforms=("tpu",))(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(s)
    )
    (out,) = exp.out_avals
    assert out.shape == (cfg.num_subtasks, 3, cfg.num_words)


@pytest.mark.slow
def test_sharded_pipeline_lowers_for_tpu(pallas_on):
    """shard_map x Pallas at production chunk size, 8 devices — the exact
    program a pod slice would compile, minus the Mosaic backend step."""
    from jax import export
    from jax.sharding import NamedSharding, PartitionSpec as P

    from msm_tpu.models.geometry import pick_geometry as pg
    from msm_tpu.parallel.sharded import default_mesh, sharded_window_sums
    from msm_tpu.params import MsmConfig

    D = 8
    cfg = MsmConfig(curve=BN254, chunk_size=16)
    x, y, s = _inputs(1 << 14, cfg)
    mesh = default_mesh(jax.devices()[:D])
    geom = pg(x.shape[0] // D, cfg.chunk_size)
    sh = NamedSharding(mesh, P("data", None))

    def f(xa, ya, sa):
        return sharded_window_sums(xa, ya, sa, cfg, geom, mesh, "data")

    args = [jax.device_put(jnp.asarray(a), sh) for a in (x, y, s)]
    exp = export.export(jax.jit(f), platforms=("tpu",))(*args)
    (out,) = exp.out_avals
    assert out.shape == (cfg.num_subtasks, 3, cfg.num_words)
    assert exp.nr_devices == D
