"""Code-version stamps for the paired-bench freshness gate (ADVICE r12)."""

from __future__ import annotations

import os
import shutil
import tempfile

from kafka_streams_learning_spark.gitinfo import code_fingerprint, git_head

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_git_head_resolves_in_repo_and_none_outside():
    head = git_head(REPO)
    assert head is not None and len(head) == 40
    d = tempfile.mkdtemp(prefix="ksl-nongit-")
    try:
        assert git_head(d) is None
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_code_fingerprint_tracks_engine_source_only():
    """Stable across calls; changes when an engine source changes;
    does NOT change for doc churn — so a doc-only commit between the
    paired run and the bench can't spuriously stale the record."""
    d = tempfile.mkdtemp(prefix="ksl-fp-")
    try:
        pkg = os.path.join(d, "kafka_streams_learning_spark")
        os.makedirs(pkg)
        with open(os.path.join(pkg, "a.py"), "w") as f:
            f.write("x = 1\n")
        with open(os.path.join(d, "bench.py"), "w") as f:
            f.write("pass\n")
        fp1 = code_fingerprint(d)
        assert fp1 == code_fingerprint(d)
        with open(os.path.join(d, "README.md"), "w") as f:
            f.write("docs only\n")
        assert code_fingerprint(d) == fp1
        with open(os.path.join(pkg, "a.py"), "w") as f:
            f.write("x = 2\n")
        fp2 = code_fingerprint(d)
        assert fp2 != fp1
        # ADVICE r13: the paired protocol itself is timing-relevant code —
        # editing tools/bench_paired.py must invalidate old paired records
        os.makedirs(os.path.join(d, "tools"))
        with open(os.path.join(d, "tools", "bench_paired.py"), "w") as f:
            f.write("PAIR_STABLE_FACTOR = 2.0\n")
        assert code_fingerprint(d) != fp2
    finally:
        shutil.rmtree(d, ignore_errors=True)
