"""ctypes loader for the C++ fast oracle (built from msm_tpu/oracle/cpp).

Until the shared library is built (``make -C msm_tpu/oracle/cpp``), the
framework transparently falls back to the pure-python oracle.
"""

from __future__ import annotations

import ctypes
import os

from msm_tpu.params import BN254, CurveSpec
from msm_tpu.oracle.pyecc import Curve, JPoint

_LIB = None
_LIB_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "cpp", "libmsm_oracle.so")


def _load():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = _lib_path()
    src = os.path.join(os.path.dirname(path), "msm_oracle.cpp")
    stale = os.path.exists(path) and os.path.exists(src) and (
        os.path.getmtime(src) > os.path.getmtime(path)
    )
    if not os.path.exists(path) or stale:
        # build (or rebuild after source edits — a stale .so must never
        # silently win over msm_oracle.cpp changes)
        import subprocess

        try:
            subprocess.run(
                ["make", "-s", "-B", "-C", os.path.dirname(path)],
                check=True,
                capture_output=True,
                timeout=300,
            )
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.msm_bn254.restype = ctypes.c_int
        lib.msm_bn254.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),  # points: n * 64 bytes (x||y LE)
            ctypes.POINTER(ctypes.c_uint8),  # scalars: n * 32 bytes LE
            ctypes.c_size_t,  # n
            ctypes.POINTER(ctypes.c_uint8),  # out: 96 bytes (x||y||z LE) jacobian
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def native_available(curve: CurveSpec = BN254) -> bool:
    return curve.name == "bn254" and _load() is not None


def native_msm(points: list[JPoint], scalars: list[int], curve: CurveSpec = BN254) -> JPoint:
    """Run the C++ Pippenger oracle. points are JPoints (any Z); they are
    normalized to affine before the FFI call."""
    lib = _load()
    if lib is None or curve.name != "bn254":
        raise RuntimeError("native oracle unavailable")
    cv = Curve(curve)
    n = len(points)
    pbuf = bytearray(64 * n)
    sbuf = bytearray(32 * n)
    for i, (pt, k) in enumerate(zip(points, scalars)):
        if pt.is_identity():
            # encode identity as (0, 0): the C++ side treats x=y=0 as infinity
            x, y = 0, 0
        elif pt.z == 1:
            x, y = pt.x, pt.y  # already affine — skip the modular inverse
        else:
            x, y = cv.to_affine(pt)
        pbuf[64 * i : 64 * i + 32] = x.to_bytes(32, "little")
        pbuf[64 * i + 32 : 64 * i + 64] = y.to_bytes(32, "little")
        sbuf[32 * i : 32 * i + 32] = (k % curve.order).to_bytes(32, "little")
    out = bytes(96)
    obuf = (ctypes.c_uint8 * 96).from_buffer_copy(out)
    rc = lib.msm_bn254(
        (ctypes.c_uint8 * len(pbuf)).from_buffer(pbuf),
        (ctypes.c_uint8 * len(sbuf)).from_buffer(sbuf),
        n,
        obuf,
    )
    if rc != 0:
        raise RuntimeError(f"native msm failed rc={rc}")
    raw = bytes(obuf)
    x = int.from_bytes(raw[0:32], "little")
    y = int.from_bytes(raw[32:64], "little")
    z = int.from_bytes(raw[64:96], "little")
    return JPoint(x, y, z)
