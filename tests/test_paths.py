"""Per-user scratch roots (round-6 advisor: a fixed world-writable /tmp
artifact path lets another user pre-plant wrong parquet). Pins: roots
are uid-keyed and 0700, a root owned by someone else is refused, and no
package source retains a fixed /tmp scratch literal."""

import glob
import os
import stat

from quantum_rag_data_pipeline_spark import paths


def test_roots_are_uid_keyed_private_and_process_scoped():
    uid = os.getuid()
    pid = os.getpid()
    for root in (paths.artifact_root(), paths.landing_root()):
        # round 14: <base>/<kind>_<uid>/run_<pid> — per-process so no
        # derived artifact survives into a later bench/oracle invocation
        assert os.path.basename(root) == f"run_{pid}"
        assert os.path.dirname(root).endswith(f"_{uid}")
        for p in (root, os.path.dirname(root)):
            st = os.stat(p)
            assert st.st_uid == uid
            assert stat.S_IMODE(st.st_mode) == 0o700


def test_dead_run_dirs_are_pruned(monkeypatch, tmp_path):
    """A killed harness leaves its run_<pid> dir behind; the next
    process using the same per-user base must sweep it (pid no longer
    alive) and must NOT touch the live process's own dir."""
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    base = tmp_path / f"spark_graft_artifacts_{os.getuid()}"
    base.mkdir(mode=0o700)
    # pick a pid that cannot be alive: max_pid + 1 is unreachable
    try:
        dead = int(open("/proc/sys/kernel/pid_max").read()) + 1
    except OSError:
        dead = 2**22 + 17
    stale = base / f"run_{dead}"
    stale.mkdir()
    (stale / "leftover.parquet").write_text("x")
    paths._PRUNED.discard(str(base))
    root = paths.artifact_root()
    assert not stale.exists()
    assert os.path.isdir(root)


def test_foreign_owned_root_is_refused(monkeypatch, tmp_path):
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    root = tmp_path / f"spark_graft_artifacts_{os.getuid()}"
    root.mkdir(mode=0o700)
    real_lstat = os.lstat

    def fake_lstat(p, *a, **k):
        st = real_lstat(p, *a, **k)
        if str(p) == str(root):
            class _S:
                st_uid = st.st_uid + 1
                st_mode = st.st_mode
            return _S()
        return st

    monkeypatch.setattr(os, "lstat", fake_lstat)
    try:
        paths.artifact_root()
    except RuntimeError as exc:
        assert "refusing" in str(exc)
    else:
        raise AssertionError("foreign-owned root was accepted")


def test_preplanted_symlink_root_is_refused(monkeypatch, tmp_path):
    """Round-7 advisor: os.stat follows symlinks, so an attacker symlink
    in the world-writable base pointing at a directory the victim
    already owns passed the uid check and redirected every write (and
    the chmod 0700) to the target. The root must be lstat'd and refused
    if it is a link."""
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    target = tmp_path / "victim_owned_target"
    target.mkdir(mode=0o755)
    link = tmp_path / f"spark_graft_artifacts_{os.getuid()}"
    link.symlink_to(target)
    try:
        paths.artifact_root()
    except RuntimeError as exc:
        assert "not a real directory" in str(exc)
    else:
        raise AssertionError("symlinked scratch root was accepted")
    # and the attack must not have succeeded as a side effect: the
    # target's permissions were not clamped by our chmod.
    assert stat.S_IMODE(os.stat(target).st_mode) == 0o755


def test_xdg_cache_home_is_honored(monkeypatch, tmp_path):
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    root = paths.landing_root()
    assert root.startswith(str(tmp_path))


def test_no_fixed_tmp_scratch_literals_in_package():
    pkg = os.path.dirname(os.path.abspath(paths.__file__))
    hits = []
    for p in glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
        src = open(p).read()
        if '"/tmp/spark_graft' in src or "'/tmp/spark_graft" in src:
            hits.append(p)
    assert not hits, hits
