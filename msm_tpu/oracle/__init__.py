"""CPU oracles for bit-exact verification.

The reference uses the external ``halo2curves`` crate as its oracle
(``src/lib.rs:45-47``). Here the oracle is built in-repo:

- ``pyecc``   — pure-python ints, always available, always correct (slow)
- ``stages``  — numpy models of every cuZK pipeline stage (golden tests;
                the analogue of ``src/cuzk/test/utils.rs``)
- ``native``  — C++ fast oracle (64-bit limbs, __int128 Montgomery mul,
                serial Pippenger), loaded via ctypes; differential-tested
                against pyecc
"""

from __future__ import annotations

from msm_tpu.params import BN254
from msm_tpu.oracle.pyecc import Curve, JPoint, IDENTITY


def _normalize_points(points, cv: Curve) -> list[JPoint]:
    out = []
    for p in points:
        if isinstance(p, JPoint):
            out.append(p)
        else:
            x, y = p
            out.append(cv.from_affine(x, y))
    return out


def best_msm(points, scalars, curve=BN254) -> JPoint:
    """Fastest available bit-exact CPU MSM (halo2curves ``msm_best`` role)."""
    cv = Curve(curve)
    pts = _normalize_points(points, cv)
    try:
        from msm_tpu.oracle.native import native_msm, native_available

        if native_available(curve):
            return native_msm(pts, scalars, curve=curve)
    except Exception:
        pass
    return cv.msm(pts, list(scalars))


__all__ = ["Curve", "JPoint", "IDENTITY", "best_msm"]
