"""Property-based state machine over the manifest-pointer commit
protocol (sinks/commit.py) — the invariants every store built on the
seam relies on, exercised under random interleavings of publishes,
stale-CAS attempts, history expiry, crash-orphaned data dirs, and
vacuums.  Pure filesystem (no Spark), so hundreds of steps run in
seconds.

Invariants (checked after EVERY step):

* retained versions are a CONTIGUOUS ascending suffix of everything
  ever published (expiry drops oldest-first and keeps the latest);
* every retained version reads back exactly the dict that was
  published (plus the stamped ``version`` field);
* a stale ``expected_version`` publish always raises CommitConflict
  and changes nothing;
* vacuum never removes a data dir any RETAINED manifest references,
  and (with the age guard disabled) removes every unreferenced one;
* publish staging debris never surfaces in version listings.
"""

from __future__ import annotations

import json
import os

import pytest
from hypothesis import settings
from hypothesis import strategies as st
from hypothesis.stateful import (
    RuleBasedStateMachine,
    invariant,
    rule,
)

from cosmap_spark.sinks.commit import CommitConflict, ManifestStore


class CommitProtocol(RuleBasedStateMachine):
    def __init__(self):
        super().__init__()
        import tempfile

        self.root = tempfile.mkdtemp(prefix="commit_proto_")
        self.ms = ManifestStore(os.path.join(self.root, "store"))
        # model state
        self.published: dict[int, dict] = {}   # version -> manifest
        self.expired: set[int] = set()
        self.live_dirs: set[str] = set()       # rel names with bytes
        self.orphans: set[str] = set()         # written, never published

    def _write_dir(self) -> str:
        rel, target = self.ms.new_data_dir()
        os.makedirs(target)
        with open(os.path.join(target, "part-0.bin"), "w") as f:
            f.write(rel)
        self.live_dirs.add(rel)
        return rel

    @rule(n_dirs=st.integers(0, 2))
    def publish_next(self, n_dirs):
        """A well-behaved committer: fresh dirs + CAS at the real
        latest version."""
        dirs = [self._write_dir() for _ in range(n_dirs)]
        latest = max(self.published, default=0)
        # reference a random retained predecessor's dirs too (the MOR
        # append shape: old dirs stay referenced)
        if self.published:
            prev = self.published[latest]
            dirs += prev.get("data_dirs", [])[:2]
        man = {"data_dirs": sorted(set(dirs)), "tag": f"v{latest + 1}"}
        got = self.ms.publish(man, expected_version=latest)
        assert got == latest + 1
        self.published[got] = {**man, "version": got}

    @rule()
    def stale_publish_refused(self):
        """A committer holding a stale version must lose the CAS and
        change nothing."""
        if not self.published:
            return
        latest = max(self.published)
        before = self.ms.versions()
        with pytest.raises(CommitConflict):
            self.ms.publish({"data_dirs": [], "tag": "stale"},
                            expected_version=latest - 1)
        assert self.ms.versions() == before

    @rule()
    def crash_before_publish(self):
        """A died writer: data staged, no manifest — invisible."""
        self.orphans.add(self._write_dir())

    @rule()
    def crash_inside_publish_staging(self):
        """A died publish: dot-prefixed staging file in _manifests —
        structurally excluded from version listings."""
        mdir = os.path.join(self.ms.path, "_manifests")
        os.makedirs(mdir, exist_ok=True)
        with open(os.path.join(mdir, ".v999999999.json.dead"), "w") as f:
            f.write(json.dumps({"torn": True}))

    @rule(keep=st.integers(1, 4))
    def expire(self, keep):
        if not self.published:
            return
        dropped = self.ms.expire_versions(keep_last=keep)
        expect_drop = sorted(set(self.published) - self.expired)[:-keep]
        assert dropped == expect_drop
        self.expired.update(dropped)

    @rule()
    def vacuum_all_ages(self):
        """With the age guard off, vacuum removes EXACTLY the
        unreferenced data (orphans + dirs released by expiry) and the
        staging debris."""
        refs: set[str] = set()
        for v in sorted(set(self.published) - self.expired):
            refs.update(self.published[v]["data_dirs"])
        removed = self.ms.vacuum(min_age_seconds=0)
        removed_rel = {
            os.path.relpath(p, self.ms.path) for p in removed
            if "/_manifests/" not in p
        }
        expect = {d for d in self.live_dirs if d not in refs}
        assert removed_rel == expect, (removed_rel, expect)
        for d in expect:
            assert not os.path.exists(self.ms.data_path(d))
        self.live_dirs -= expect
        self.orphans -= expect

    @invariant()
    def versions_are_contiguous_retained_suffix(self):
        got = self.ms.versions()
        want = sorted(set(self.published) - self.expired)
        assert got == want
        if got:
            assert got == list(range(got[0], got[-1] + 1))
            assert max(self.published) in got  # latest always kept

    @invariant()
    def retained_versions_read_back_exactly(self):
        for v in self.ms.versions():
            assert self.ms.read_version(v) == self.published[v]

    @invariant()
    def referenced_dirs_exist(self):
        for v in self.ms.versions():
            for d in self.published[v]["data_dirs"]:
                assert os.path.isdir(self.ms.data_path(d)), (v, d)

    def teardown(self):
        import shutil

        shutil.rmtree(self.root, ignore_errors=True)


TestCommitProtocol = CommitProtocol.TestCase
TestCommitProtocol.settings = settings(
    max_examples=40, stateful_step_count=30, deadline=None,
)
