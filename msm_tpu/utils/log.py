"""Logging shim — parity with the reference's ``debug()``
(``src/cuzk/utils.rs:376-383``: console.log on wasm32, println natively).

Here: stderr prints gated by the MSM_TPU_DEBUG env var, with process index
prefixes under multi-host runs.
"""

from __future__ import annotations

import os
import sys


def debug_enabled() -> bool:
    return os.environ.get("MSM_TPU_DEBUG", "0") not in ("0", "", "false")


def debug(*args) -> None:
    """Print to stderr when MSM_TPU_DEBUG is set."""
    if not debug_enabled():
        return
    prefix = ""
    try:
        import jax

        if jax.process_count() > 1:
            prefix = f"[proc {jax.process_index()}] "
    except Exception:
        pass
    print(prefix + " ".join(str(a) for a in args), file=sys.stderr)
