"""Per-user, ownership-verified scratch roots for derived on-disk state.

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
"""

from __future__ import annotations

import os
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


def artifact_root() -> str:
    """Root for session-shared derived-table artifacts."""
    return _user_root("spark_graft_artifacts")


def landing_root() -> str:
    """Root for per-testdata materialized layouts (landing zones)."""
    return _user_root("spark_graft_landing")
