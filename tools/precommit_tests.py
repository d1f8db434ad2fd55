#!/usr/bin/env python
"""Pre-commit test gate: map changed files -> owning test modules, run them.

Rounds 3 and 4 both ended RED from a final-turn edit committed untested
(VERDICT r3 #1, r4 Weak #1).  This gate makes "which tests does this diff
own?" mechanical:

  python tools/precommit_tests.py            # diff vs HEAD (staged+unstaged)
  python tools/precommit_tests.py --ref HEAD~1
  python tools/precommit_tests.py --list     # print selection, don't run
  python tools/precommit_tests.py --full     # force the full suite

Selection rules (in order):
  * a changed file under tests/ selects itself (conftest/ref_loader select
    the whole suite -- they are imported by everything);
  * a changed source file under audio_fewshot_tpu/, tools/, or a repo-root
    entry point selects every tests/test_*.py whose text mentions its module
    stem (word-boundary grep) -- stems are unique enough here that this is
    precise;
  * docs / configs / JSON / md changes select nothing;
  * an empty selection for a non-trivial diff falls back to the smoke tests.

Exit status is pytest's.  Run this before EVERY commit that touches .py
files; a red gate means the commit is not ready.
"""
from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS = os.path.join(REPO, "tests")

# Files whose change invalidates everything.
GLOBAL_TRIGGERS = {
    "tests/conftest.py",
    "tests/ref_loader.py",
    "pytest.ini",
    "audio_fewshot_tpu/config.py",
    "audio_fewshot_tpu/registry.py",
}
SMOKE_FALLBACK = ["tests/test_trainer_smoke.py", "tests/test_graft_entry.py"]
# Extensions that never own tests.
INERT_EXT = {".md", ".json", ".jsonl", ".txt", ".npy", ".npz", ".yaml", ".yml",
             ".png", ".csv"}


def changed_files(ref: str) -> list[str]:
    out = subprocess.run(
        ["git", "diff", "--name-only", ref],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.split()
    out += subprocess.run(
        ["git", "diff", "--name-only", "--cached", ref],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.split()
    return sorted(set(out))


def select(changed: list[str]) -> tuple[list[str], bool]:
    """Return (test files to run, full_suite_requested)."""
    test_files = sorted(
        f for f in os.listdir(TESTS)
        if f.startswith("test_") and f.endswith(".py")
    )
    picked: set[str] = set()
    stems: list[str] = []
    for f in changed:
        if f in GLOBAL_TRIGGERS:
            return [], True
        ext = os.path.splitext(f)[1]
        if ext in INERT_EXT and not f.startswith("config/"):
            continue
        if f.startswith("tests/") and os.path.basename(f).startswith("test_"):
            if os.path.exists(os.path.join(REPO, f)):
                picked.add(os.path.basename(f))
            continue
        if ext != ".py":
            continue
        stem = os.path.splitext(os.path.basename(f))[0]
        if stem not in ("__init__",):
            stems.append(stem)
        else:
            # package __init__ edits: use the package name
            stems.append(os.path.basename(os.path.dirname(f)))
    if stems:
        pats = [re.compile(r"\b%s\b" % re.escape(s)) for s in set(stems)]
        for tf in test_files:
            try:
                text = open(os.path.join(TESTS, tf)).read()
            except OSError:
                continue
            if any(p.search(text) for p in pats):
                picked.add(tf)
    return sorted(picked), False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="HEAD")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--full", action="store_true")
    ap.add_argument("pytest_args", nargs="*", default=[])
    args = ap.parse_args()

    changed = changed_files(args.ref)
    if not changed:
        print("precommit_tests: no changes vs %s; nothing to run" % args.ref)
        return 0
    sel, full = select(changed)
    full = full or args.full
    if full:
        targets = ["tests/"]
        print("precommit_tests: global trigger changed -> FULL suite")
    elif not sel:
        py = [f for f in changed if f.endswith(".py")]
        if not py:
            print("precommit_tests: doc/config-only diff; nothing to run")
            return 0
        targets = SMOKE_FALLBACK
        print("precommit_tests: no owning tests matched %s -> smoke fallback"
              % py)
    else:
        targets = ["tests/" + f for f in sel]
    print("precommit_tests: changed =", changed)
    print("precommit_tests: running  =", targets)
    if args.list:
        return 0
    cmd = [sys.executable, "-m", "pytest", "-x", "-q", *targets,
           *args.pytest_args]
    return subprocess.run(cmd, cwd=REPO).returncode


if __name__ == "__main__":
    sys.exit(main())
