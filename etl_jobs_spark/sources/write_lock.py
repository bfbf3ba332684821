"""Single-writer mutual exclusion for plain-parquet table roots.

Plain parquet has no commit log, so two concurrent writers to ONE
table root race: Spark's Hadoop committer stages every in-flight
write under the shared ``<root>/_temporary`` (app attempt 0), and
the round-13 two-writer probe measured the consequences — usually
one writer dies loudly with TASK_WRITE_FAILED, and once a TORN
append was left visible (22,501 of 40,000 rows committed by a job
that then failed). A transactional table format (Delta/Iceberg)
buys mutual exclusion with its commit log; the stand-in here is the
storage-level equivalent: an exclusive lockfile NEXT TO the table
root (never inside it — overwrite mode deletes the root's
contents), acquired with atomic O_CREAT|O_EXCL.

Scope, stated honestly: ``os.open(O_EXCL)`` is atomic on a local
filesystem and on NFS; on S3 the same contract needs a conditional
PUT (If-None-Match) or DynamoDB-style lock table — the API here is
the seam where that swap happens. Locking protects writers that go
through THIS module's acquire; a foreign writer bypassing it is the
documented-unsafe path the concurrency axis records as the baseline.

Writers that hold disjoint sub-roots (sink_parquet_partitions_direct:
one committer root per partition value) do not need this lock across
partitions — that is the point of that helper.
"""

from __future__ import annotations

import contextlib
import os
import time
from pathlib import Path


class ConcurrentWriteError(RuntimeError):
    """Another writer holds the table's write lock."""


def _lock_path(root: str | Path) -> Path | None:
    """Lockfile path for a table root; None when the root is on a
    store where a posix lockfile is meaningless (s3a:// etc. — the
    conditional-PUT seam documented above)."""
    s = str(root).rstrip("/")
    if s.startswith("file://"):
        from urllib.parse import unquote, urlparse

        s = unquote(urlparse(s).path)
    elif "://" in s:
        return None
    p = Path(s)
    # sibling, not child: overwrite mode recreates the root dir
    return p.with_name(p.name + ".__write_lock")


def acquire_table_lock(
    root: str | Path,
    timeout_sec: float = 30.0,
    poll_sec: float = 0.05,
    stale_sec: float = 3600.0,
) -> None:
    """Acquire the exclusive write lock for ``root`` (no-op for
    non-posix stores — see ``_lock_path``).

    Blocks up to ``timeout_sec`` waiting for the current holder,
    then raises ``ConcurrentWriteError`` LOUDLY — never proceeds
    without the lock (a silent torn append is the one outcome this
    module exists to rule out). A lockfile older than ``stale_sec``
    is presumed abandoned by a dead writer and is broken; the age is
    generous because breaking a LIVE writer's lock reintroduces the
    race being prevented. Split from the context manager so sinks
    with driver-side begin/commit hooks (the ledger DataSource)
    can span acquire over a whole job."""
    lock = _lock_path(root)
    if lock is None:
        return
    lock.parent.mkdir(parents=True, exist_ok=True)
    deadline = time.monotonic() + timeout_sec
    while True:
        try:
            fd = os.open(str(lock), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, f"{os.getpid()} {time.time()}".encode())
            os.close(fd)
            return
        except FileExistsError:
            try:
                age = time.time() - lock.stat().st_mtime
            except FileNotFoundError:
                continue  # holder released between open and stat
            if age > stale_sec:
                # abandoned by a dead writer: break it (best-effort;
                # a concurrent breaker losing the unlink race just
                # loops back to the O_EXCL create)
                with contextlib.suppress(FileNotFoundError):
                    lock.unlink()
                continue
            if time.monotonic() >= deadline:
                raise ConcurrentWriteError(
                    f"write lock for {root} held by another writer "
                    f"({lock}, age {age:.1f}s) after "
                    f"{timeout_sec:.1f}s wait — refusing to race on "
                    "a plain-parquet root"
                ) from None
            time.sleep(poll_sec)


def release_table_lock(root: str | Path) -> None:
    lock = _lock_path(root)
    if lock is not None:
        with contextlib.suppress(FileNotFoundError):
            lock.unlink()


@contextlib.contextmanager
def table_write_lock(
    root: str | Path,
    timeout_sec: float = 30.0,
    poll_sec: float = 0.05,
    stale_sec: float = 3600.0,
):
    """Context-manager face of acquire/release (the common case)."""
    acquire_table_lock(
        root, timeout_sec=timeout_sec, poll_sec=poll_sec, stale_sec=stale_sec
    )
    try:
        yield
    finally:
        release_table_lock(root)
