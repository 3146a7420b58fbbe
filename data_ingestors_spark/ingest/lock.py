"""V18: advisory per-table ingest lock.

Concurrent ingests into one table race the non-transactional side
effects (sidecar file copies land before the atomic table swap).
The reference guards this with an ``O_EXCL`` lock file carrying holder
metadata and a 12-hour stale cutoff
(tracebloc_ingestor/ingestors/base.py:482-620); same contract here:

- atomic acquire via ``O_CREAT | O_EXCL`` — works on any POSIX
  filesystem including NFS-backed volumes;
- conflict error names the current holder (pid / host / started_at);
- locks older than the stale cutoff are removed and re-acquired, so a
  crashed run never blocks forever; corrupt metadata falls back to
  file mtime for the age check;
- release is idempotent.
"""

from __future__ import annotations

import json
import os
import socket
import time
from datetime import datetime, timezone

STALE_SECONDS = 12 * 3600


class TableLockError(RuntimeError):
    pass


class TableLock:
    """``with TableLock(lock_dir, table): ...`` around the side-effecting
    span of an ingest run."""

    def __init__(self, lock_dir: str, table_name: str, owner: str = "spark-ingestor"):
        self.lock_dir = lock_dir
        self.table_name = table_name
        self.owner = owner
        self.path = os.path.join(lock_dir, f".ingest-{table_name}.lock")
        self._held = False

    # -- protocol --------------------------------------------------------

    def acquire(self) -> "TableLock":
        os.makedirs(self.lock_dir, exist_ok=True)
        info = {
            "owner": self.owner,
            "table_name": self.table_name,
            "pid": os.getpid(),
            "hostname": socket.gethostname(),
            "started_at": datetime.now(timezone.utc).isoformat(),
        }
        try:
            fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
        except FileExistsError:
            holder, age = self._read_holder()
            if age is not None and age > STALE_SECONDS:
                # Atomic stale takeover. A bare remove() races: between
                # our staleness read and the remove, another contender
                # may have already taken over and created a FRESH lock —
                # removing that runs two ingests concurrently. Instead:
                # (a) stat and capture (st_ino, st_mtime) of the file we
                # believe is stale, (b) rename it aside — atomic, exactly
                # one contender wins — then (c) VERIFY the aside file is
                # the same inode we statted. If a full takeover slipped
                # between (a) and (b) (rename-aside + O_EXCL recreate),
                # the file we grabbed is the new holder's FRESH lock:
                # restore it with an atomic link() (fails rather than
                # clobbers if the path was re-created meanwhile) and
                # report the table as held. The unrecoverable window is
                # now two nested full takeovers inside one stat-rename
                # gap, vs one takeover before.
                try:
                    st = os.stat(self.path)
                except OSError:
                    return self.acquire()  # vanished meanwhile — retry
                if time.time() - st.st_mtime > STALE_SECONDS:
                    aside = f"{self.path}.stale.{os.getpid()}.{time.monotonic_ns()}"
                    try:
                        os.rename(self.path, aside)
                    except OSError:
                        return self.acquire()  # lost the rename race — re-evaluate
                    try:
                        ast = os.stat(aside)
                        grabbed_fresh = (
                            ast.st_ino != st.st_ino or ast.st_mtime != st.st_mtime
                        )
                    except OSError:
                        grabbed_fresh = False
                    if grabbed_fresh:
                        try:
                            os.link(aside, self.path)  # restore same inode
                        except OSError:
                            pass  # path re-created meanwhile — holder exists either way
                        try:
                            os.remove(aside)
                        except OSError:
                            pass
                        holder, _ = self._read_holder()
                        raise TableLockError(
                            f"another ingest is already running for table "
                            f"{self.table_name!r} (lock at {self.path}, "
                            f"holder: {holder!r}); a concurrent stale takeover "
                            "was detected and its fresh lock preserved"
                        )
                    try:
                        os.remove(aside)
                    except OSError:
                        pass
                    return self.acquire()
                # metadata says stale but the file itself is fresh —
                # treat as held (conservative) and fall through
            raise TableLockError(
                f"another ingest is already running for table "
                f"{self.table_name!r} (lock at {self.path}, holder: {holder!r}); "
                f"wait for it, or remove the lock if its process crashed "
                f"(auto-clears after {STALE_SECONDS}s)"
            )
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(info, f)
        except Exception:
            try:
                os.remove(self.path)
            except FileNotFoundError:
                pass
            raise
        self._held = True
        return self

    def release(self) -> None:
        if not self._held:
            return
        self._held = False
        try:
            os.remove(self.path)
        except FileNotFoundError:
            pass

    def _read_holder(self) -> tuple[dict, float | None]:
        holder: dict = {}
        age: float | None = None
        try:
            with open(self.path) as f:
                holder = json.load(f)
            started = datetime.fromisoformat(holder["started_at"])
            age = (datetime.now(timezone.utc) - started).total_seconds()
        except Exception:
            # corrupt/truncated metadata: fall back to file mtime so a
            # bad lock still auto-expires
            try:
                age = time.time() - os.path.getmtime(self.path)
            except OSError:
                pass
        return holder, age

    def __enter__(self) -> "TableLock":
        return self.acquire()

    def __exit__(self, *exc) -> None:
        self.release()


def preflight_src_path(src_path: str | None) -> str:
    """V17: one clear, actionable error for a bad source root
    (reference base.py:458-480) instead of N per-validator failures."""
    if not src_path:
        raise ValueError(
            "SRC_PATH is not configured: file-bearing categories need the "
            "absolute path of the directory holding images/ annotations/ "
            "masks/ texts/ sequences/"
        )
    if not os.path.isabs(src_path):
        raise ValueError(f"SRC_PATH must be an absolute path, got {src_path!r}")
    if not os.path.isdir(src_path):
        raise ValueError(f"SRC_PATH does not exist or is not a directory: {src_path!r}")
    return src_path
