"""Evidence-chain tooling tests (r13; VERDICT r12 #1): the snapshot
gate must FAIL when a tracked root artifact is dirty — regenerated in
the working tree but not committed — the exact wound that let r12's
at-HEAD gate re-run ship uncommitted while the committed gate
certified a superseded tree."""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools"))

from snapshot_check import dirty_tracked_artifacts  # noqa: E402


def _git(repo, *args):
    subprocess.run(["git", *args], cwd=repo, check=True,
                   capture_output=True)


def _init_repo(tmp_path):
    repo = str(tmp_path)
    _git(repo, "init", "-q")
    _git(repo, "config", "user.email", "t@t")
    _git(repo, "config", "user.name", "t")
    return repo


def test_dirty_tracked_artifact_is_flagged(tmp_path):
    repo = _init_repo(tmp_path)
    art = os.path.join(repo, "ROUND_GATE_r99.json")
    with open(art, "w") as fh:
        json.dump({"ok": True, "head_sha": "aaa"}, fh)
    _git(repo, "add", "ROUND_GATE_r99.json")
    _git(repo, "commit", "-qm", "gate")
    assert dirty_tracked_artifacts(repo) == []
    # regenerate the artifact without committing — the r12 failure
    with open(art, "w") as fh:
        json.dump({"ok": True, "head_sha": "bbb"}, fh)
    assert dirty_tracked_artifacts(repo) == ["ROUND_GATE_r99.json"]
    # committing the regeneration clears the flag
    _git(repo, "commit", "-aqm", "gate rerun")
    assert dirty_tracked_artifacts(repo) == []


def test_untracked_and_nonartifact_files_are_not_dirty(tmp_path):
    repo = _init_repo(tmp_path)
    with open(os.path.join(repo, "BENCH_r99.json"), "w") as fh:
        json.dump({"metric": "x"}, fh)
    with open(os.path.join(repo, "notes.json"), "w") as fh:
        json.dump({}, fh)
    _git(repo, "add", "notes.json")
    _git(repo, "commit", "-qm", "base")
    # BENCH_r99.json is untracked (rides the snapshot commit);
    # notes.json is tracked but not an artifact prefix
    with open(os.path.join(repo, "notes.json"), "w") as fh:
        json.dump({"changed": True}, fh)
    assert dirty_tracked_artifacts(repo) == []


def test_deleted_tracked_artifact_is_flagged(tmp_path):
    repo = _init_repo(tmp_path)
    art = os.path.join(repo, "CORRECTNESS_r99.json")
    with open(art, "w") as fh:
        json.dump({}, fh)
    _git(repo, "add", "CORRECTNESS_r99.json")
    _git(repo, "commit", "-qm", "art")
    os.remove(art)
    assert dirty_tracked_artifacts(repo) == ["CORRECTNESS_r99.json"]
