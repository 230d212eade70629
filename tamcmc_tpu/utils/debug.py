"""Debug mode: NaN tracing + per-chunk finite checks.

SURVEY.md section 5.2: the reference needs no sanitizers (single-threaded
C++); the rebuild's debug story is `jax_debug_nans` (fail at the op that
produced the first NaN instead of at the MH reject that absorbs it) plus
cheap host-side finite checks on every emitted chunk, surfaced in
metrics.jsonl.  Off by default: NEG_BIG rejection already makes NaNs
non-fatal in production runs; debug mode makes them *visible*.
"""

from __future__ import annotations

import numpy as np
import jax


def enable_debug_mode():
    """Turn on jax_debug_nans (and chex-style strict asserts downstream)."""
    jax.config.update("jax_debug_nans", True)


def chunk_finite_report(outs: dict) -> dict:
    """Count non-finite entries in a chunk's scalar diagnostics.

    Returns {} when everything is finite (the cheap, common case); otherwise
    a {field: n_nonfinite} map ready for metrics.jsonl.  theta0 is checked
    too — a walker parked at NaN keeps emitting finite logL=NEG_BIG, which
    only this check catches.
    """
    bad = {}
    for field in ("logL", "logP0", "theta0"):
        if field not in outs:
            continue
        arr = np.asarray(outs[field])
        n = int(np.size(arr) - np.isfinite(arr).sum())
        if n:
            bad[field] = n
    return bad
