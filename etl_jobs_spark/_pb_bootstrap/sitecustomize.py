"""Worker-interpreter bootstrap for the protobuf shim.

This directory is placed on the Python workers' PYTHONPATH by
``etl_jobs_spark.protobuf_compat.enable_tws``; the interpreter's
``site`` module imports ``sitecustomize`` at startup, which replays
the driver-side shim (locate a pure-Python protobuf runtime on disk,
relax the gencode version gate to same-major) BEFORE pyspark.worker
unpickles a stateful processor that imports StateMessage_pb2.

Must never raise: a failure here would break every worker for every
query, not just transformWithState — hence the blanket guard.
"""

try:
    import sys
    from pathlib import Path

    sys.path.append(str(Path(__file__).resolve().parents[2]))
    from etl_jobs_spark.protobuf_compat import _relax_version_gate, ensure_protobuf

    if ensure_protobuf():
        _relax_version_gate()
except Exception:  # pragma: no cover - defensive by design
    pass
