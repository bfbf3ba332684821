"""Scratch-space selection for staged fixtures and checkpoints.

Streaming checkpoints and staged file-arrival feeds are thousands of
tiny files committed via rename — on a disk-backed /tmp that metadata
traffic dominates the fixed cost of every drain-and-stop streaming
query. Prefer a RAM-backed tmpfs (/dev/shm) when one exists; honor
``$SPARK_GRAFT_SCRATCH`` as an explicit override.

This is local-harness plumbing, not engine design: on a real cluster
checkpoints belong on the shared store (S3/HDFS) and the trade-off is
durability, which a drain-and-stop correctness run doesn't need.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from pathlib import Path

_ROOT: Path | None = None


def scratch_root() -> Path:
    """The fastest usable scratch root, computed once."""
    global _ROOT
    if _ROOT is None:
        override = os.environ.get("SPARK_GRAFT_SCRATCH")
        candidates = [override, "/dev/shm", tempfile.gettempdir()]
        for c in candidates:
            if not c:
                continue
            p = Path(c)
            if p.is_dir() and os.access(p, os.W_OK):
                _ROOT = p
                break
        else:  # pragma: no cover - gettempdir always exists
            _ROOT = Path(tempfile.gettempdir())
    return _ROOT


def scratch_dir(prefix: str) -> Path:
    """A fresh, unique (not yet created) scratch path."""
    return scratch_root() / f"{prefix}_{uuid.uuid4().hex[:8]}"
