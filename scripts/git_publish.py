#!/usr/bin/env python
"""Stage, commit, and push the working tree in one command.

Covers the reference's dev convenience utility (`push_to_github.py`: stage
everything, prompt for a message, commit, push with upstream setup) as a
NON-interactive CLI suited to scripted/CI use:

    python scripts/git_publish.py -m "message"            # stage+commit+push
    python scripts/git_publish.py -m "message" --no-push  # local commit only
    python scripts/git_publish.py --dry-run               # show what would run

Unlike the reference it never blocks on stdin (the message is a flag, with
a timestamped default), refuses to run with detached HEAD, and exits
non-zero on any git failure so callers can gate on it.
"""

from __future__ import annotations

import argparse
import shutil
import subprocess
import sys
import time


def run(cmd: list[str], dry: bool = False) -> subprocess.CompletedProcess | None:
    print("$ " + " ".join(cmd))
    if dry:
        return None
    return subprocess.run(cmd, text=True, capture_output=True)


def die(msg: str) -> None:
    print(f"error: {msg}", file=sys.stderr)
    sys.exit(1)


def git_out(args: list[str]) -> str:
    r = subprocess.run(["git", *args], text=True, capture_output=True)
    if r.returncode != 0:
        die((r.stderr or r.stdout).strip() or f"git {' '.join(args)} failed")
    return r.stdout.strip()


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("-m", "--message", default=None,
                    help="commit message (default: timestamped)")
    ap.add_argument("--remote", default="origin")
    ap.add_argument("--no-push", action="store_true",
                    help="commit locally, skip the push")
    ap.add_argument("--dry-run", action="store_true",
                    help="print the git commands without running them")
    args = ap.parse_args()

    if shutil.which("git") is None:
        die("git is not on PATH")
    if git_out(["rev-parse", "--is-inside-work-tree"]) != "true":
        die("not inside a git repository")
    # symbolic-ref works on an unborn branch (fresh repo); it fails only
    # on detached HEAD, which is the state we refuse
    r = subprocess.run(["git", "symbolic-ref", "--short", "HEAD"],
                       text=True, capture_output=True)
    if r.returncode != 0:
        die("detached HEAD; check out a branch first")
    branch = r.stdout.strip()

    if not git_out(["status", "--porcelain"]):
        print("nothing to commit (working tree clean)")
    else:
        msg = args.message or time.strftime("checkpoint %Y-%m-%d %H:%M:%S")
        for cmd in (["git", "add", "-A"], ["git", "commit", "-m", msg]):
            r = run(cmd, args.dry_run)
            if r is not None and r.returncode != 0:
                die((r.stderr or r.stdout).strip())

    if args.no_push:
        return
    remotes = git_out(["remote"]).splitlines()
    if args.remote not in remotes:
        print(f"no remote '{args.remote}' configured; skipping push")
        return
    has_upstream = subprocess.run(
        ["git", "rev-parse", "--abbrev-ref", "@{u}"],
        capture_output=True).returncode == 0
    push = ["git", "push"] if has_upstream else \
        ["git", "push", "--set-upstream", args.remote, branch]
    r = run(push, args.dry_run)
    if r is not None and r.returncode != 0:
        die((r.stderr or r.stdout).strip())
    print("done")


if __name__ == "__main__":
    main()
