"""Capture a jax.profiler trace of the full 2^20 pipeline."""
import numpy as np
import jax
import jax.numpy as jnp

from msm_tpu.models import common
from msm_tpu.models.cuzk import cuzk_window_sums
from msm_tpu.models.geometry import pick_geometry
from msm_tpu.oracle.pyecc import Curve
from msm_tpu.params import pick_config

n = 1 << 20
cfg = pick_config(n)
cv = Curve(cfg.curve)
base = [cv.to_affine(p) for p in cv.sample_points(512, seed=0)]
pts_a = [base[i % 512] for i in range(n)]
rng = np.random.default_rng(1)
ks = [int.from_bytes(rng.bytes(32), "little") % cfg.curve.order for _ in range(n)]
x, y, s = common.pad_inputs(pts_a, ks, cfg)
xd, yd, sd = jnp.asarray(x), jnp.asarray(y), jnp.asarray(s)
geom = pick_geometry(n, cfg.chunk_size)

g = jax.jit(
    lambda a, b, c: jnp.sum(cuzk_window_sums(a, b, c, cfg, geom)),
    static_argnums=(),
)
float(g(xd, yd, sd))  # compile+warm
float(g(xd, yd, sd))
jax.profiler.start_trace("/tmp/msmtrace")
float(g(xd, yd, sd))
jax.profiler.stop_trace()
print("trace done")
