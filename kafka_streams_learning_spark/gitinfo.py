"""Code-version stamps for bench artifacts.

BENCH_PAIRED.json records the code state it was benched from; bench.py
refuses to stamp paired medians produced by a different code state next
to current single-pass rows (ADVICE r12: a stale paired record recreates
the jitter-vs-cost confusion the stamping exists to prevent).

Two stamps: `git_head` (forensics — which commit produced the record)
and `code_fingerprint` (the freshness gate — a content hash of the
engine sources + bench.py, so a doc-only commit between the paired run
and the bench does not spuriously invalidate the record).
"""

from __future__ import annotations

import hashlib
import os
import subprocess


def git_head(repo_dir: str) -> str | None:
    """`git rev-parse HEAD` of ``repo_dir``, or None outside a repo /
    without git — callers treat None as "unknown", never as a match."""
    try:
        out = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=repo_dir,
            capture_output=True,
            text=True,
            timeout=10,
        )
    except (OSError, subprocess.TimeoutExpired):
        return None
    if out.returncode != 0:
        return None
    return out.stdout.strip() or None


def code_fingerprint(repo_dir: str) -> str:
    """md5 over (relpath, content) of every engine source file plus the
    bench harness (bench.py AND tools/bench_paired.py — ADVICE r13: a
    change to the paired protocol itself must invalidate old paired
    records), sorted by path — identical iff the timing-relevant code is
    identical, regardless of doc/test/artifact churn in between."""
    h = hashlib.md5()
    pkg = os.path.join(repo_dir, "kafka_streams_learning_spark")
    paths = [
        os.path.join(repo_dir, "bench.py"),
        os.path.join(repo_dir, "tools", "bench_paired.py"),
    ]
    for root, _dirs, files in os.walk(pkg):
        for f in files:
            if f.endswith(".py"):
                paths.append(os.path.join(root, f))
    for p in sorted(paths):
        if not os.path.exists(p):
            continue
        h.update(os.path.relpath(p, repo_dir).encode())
        h.update(b"\x00")
        with open(p, "rb") as fh:
            h.update(fh.read())
        h.update(b"\x01")
    return h.hexdigest()
