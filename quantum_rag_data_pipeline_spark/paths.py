"""Per-user, ownership-verified, PER-PROCESS scratch roots for derived
on-disk state.

Two kinds of local state outlive a single query call:

- ARTIFACTS: session-shared derived tables (the co-purchase edge list)
  that non-gated consumers (bench) trust without an oracle check;
- LANDINGS: query-local materializations (hive-partitioned events, CSV /
  JSONL / format-matrix layouts) that layout queries write once per
  testdata fingerprint and re-read.

A fixed world-writable /tmp path for either would let another local
user pre-plant a directory with _SUCCESS + arbitrary parquet and feed
wrong rows to any run that trusts the existence check (round-6 advisor
finding on the graph artifact; the landing sites shared the pattern).
Both roots are therefore keyed by uid, created 0700, and REFUSED if a
pre-existing directory is owned by someone else.

Round 14: both roots are additionally scoped to the CURRENT PROCESS
(``run_<pid>`` subdir, removed at interpreter exit, dead siblings
pruned). Rationale: a fingerprint-keyed artifact that survives the
process would hand a LATER bench/oracle invocation a precomputed
intermediate — the second invocation would no longer compute from the
parquet inputs, which is result caching across runs, not optimization.
Within one invocation the sharing is intact (the first caller builds,
every later query in the same process re-reads), which is the honest
shared-derived-table design: each run pays the build exactly once.
"""

from __future__ import annotations

import atexit
import os
import shutil
import stat as stat_mod
import tempfile


def _user_root(kind: str) -> str:
    uid = os.getuid() if hasattr(os, "getuid") else 0
    base = os.environ.get("XDG_CACHE_HOME") or tempfile.gettempdir()
    root = os.path.join(base, f"{kind}_{uid}")
    os.makedirs(root, mode=0o700, exist_ok=True)
    # lstat, not stat: a pre-planted SYMLINK in the world-writable base
    # pointing at a directory the victim already owns would pass a
    # follow-the-link st_uid check while redirecting every artifact write
    # (and the chmod below) to the target (round-7 advisor item;
    # fs.protected_symlinks mitigates on default Linux but this module
    # claims the threat model explicitly).
    st = os.lstat(root)
    if stat_mod.S_ISLNK(st.st_mode) or not stat_mod.S_ISDIR(st.st_mode):
        raise RuntimeError(
            f"scratch root {root} is not a real directory "
            f"(mode {stat_mod.filemode(st.st_mode)}); refusing to trust it"
        )
    if hasattr(os, "getuid") and st.st_uid != uid:
        raise RuntimeError(
            f"scratch root {root} is owned by uid {st.st_uid}, not {uid}; "
            "refusing to trust it"
        )
    os.chmod(root, 0o700)
    return root


_PRUNED: set[str] = set()
_CLEANUP_REGISTERED: set[str] = set()


def _prune_dead_runs(base: str) -> None:
    """Remove ``run_<pid>`` siblings whose process is gone (a killed
    harness can't atexit-clean its own dir). Once per (process, base)."""
    if base in _PRUNED:
        return
    _PRUNED.add(base)
    try:
        entries = os.listdir(base)
    except OSError:
        return
    for name in entries:
        if not name.startswith("run_"):
            continue
        try:
            pid = int(name[4:])
        except ValueError:
            continue
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            shutil.rmtree(os.path.join(base, name), ignore_errors=True)
        except OSError:
            continue  # alive or not ours to signal — leave it


def _run_root(kind: str) -> str:
    """Per-process scratch dir under the per-user root; removed at exit."""
    base = _user_root(kind)
    _prune_dead_runs(base)
    run = os.path.join(base, f"run_{os.getpid()}")
    os.makedirs(run, mode=0o700, exist_ok=True)
    if run not in _CLEANUP_REGISTERED:
        _CLEANUP_REGISTERED.add(run)
        atexit.register(shutil.rmtree, run, ignore_errors=True)
    return run


def artifact_root() -> str:
    """Per-process root for session-shared derived-table artifacts."""
    return _run_root("spark_graft_artifacts")


def landing_root() -> str:
    """Per-process root for per-testdata materialized layouts."""
    return _run_root("spark_graft_landing")
