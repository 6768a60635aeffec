"""Table maintenance policy: the operational loop that keeps a streaming
merge-on-read table healthy without operator intervention.

MOR apply is O(batch) because it defers work: every delta batch appends
bucket-SPANNING files that (a) disable bucket pruning for themselves and
(b) make every ``read_state`` pay a growing LWW resolve. Left alone at
streaming cadence the table degrades without bound — so the stream job
(or a cron'd maintenance worker on a fleet) runs :func:`maintain` after
each commit:

1. **Full compact** when pending delta files exceed ``max_delta_files``
   OR delta rows exceed ``max_delta_row_fraction`` of the table — folds
   deltas into single-version bucketed files, restoring plain-scan reads
   and bucket pruning. Both triggers come from snapshot METADATA (file
   counts + footer row counts), zero Spark jobs to evaluate.
2. **Incremental bucket compact** otherwise: the ≤ ``max_fragmented_buckets``
   worst buckets with more than ``max_bucket_files`` fragments get
   rewritten — the continuous shape a fleet runs so no single cycle ever
   pays a full-table rewrite.
3. **Snapshot expiry** (``expire_keep_last``): streaming cadence mints one
   snapshot per micro-batch; without GC, metadata and dead files grow
   forever. Runs with the orphan grace window so it is safe next to
   in-flight work.

Tombstone safety: auto-compaction keeps tombstones (``drop_tombstones``
defaults to False here, unlike manual ``compact``) — dropping a tombstone
is only safe once no event older than it can still arrive, which is an
operator-level statement about the upstream log, not something a policy
timer can know.
"""

from __future__ import annotations

import os
import time
from collections import Counter
from dataclasses import dataclass
from typing import Any

from rockefeller_spark.lake import (CommitConflictError, LakeTable,
                                    MultiVersionError)


@dataclass
class CompactionPolicy:
    """Thresholds for :func:`maintain`. Defaults suit a trickle stream
    (small frequent batches into a large table)."""
    max_delta_files: int = 8
    max_delta_row_fraction: float = 0.25
    max_bucket_files: int = 8
    max_fragmented_buckets: int = 4
    expire_keep_last: int | None = 8
    orphan_grace_s: float = 3600.0
    # how often to run the FULL-LISTING orphan sweep (Iceberg's
    # removeOrphanFiles analog — O(table listing), so not per batch).
    # Snapshot expiry itself still runs every cycle and is O(churn).
    orphan_sweep_every_s: float = 3600.0
    drop_tombstones: bool = False
    write_salt: int = 0
    # bound compacted FILE sizes (Iceberg write.target-file-size analog);
    # None keeps one file per bucket per compaction task
    target_rows_per_file: int | None = None


def maintain(table: LakeTable, policy: CompactionPolicy) -> dict[str, Any]:
    """Run one maintenance cycle; returns what was done. Decision inputs
    are snapshot metadata only — evaluating a no-op cycle costs zero
    Spark jobs AND O(n_shards) driver work, not O(table files): the
    delta/total triggers come from manifest-LIST aggregates, and the
    fragmented-bucket census loads only shards whose total file count
    exceeds ``max_bucket_files`` (exact: a bucket with more than K files
    necessarily lives in a shard holding more than K files). This runs
    after EVERY stream micro-batch, so it must stay metadata-flat at any
    table size."""
    snap = table.current()
    if snap.manifests is not None and snap._files is None:
        n_delta_files = sum(e.n_files for e in snap.manifests
                            if e.lo is None)
        delta_rows = sum(e.rows for e in snap.manifests if e.lo is None)
        total_rows = sum(e.rows for e in snap.manifests)
    else:
        delta = [f for f in snap.files if f.bucket is None]
        n_delta_files = len(delta)
        delta_rows = sum(f.rows for f in delta)
        total_rows = sum(f.rows for f in snap.files)
    actions: dict[str, Any] = {"full_compact": False, "bucket_compacts": [],
                               "pending_delta_files": n_delta_files,
                               "expired": None}

    if n_delta_files and (
            n_delta_files > policy.max_delta_files
            or delta_rows > policy.max_delta_row_fraction * max(total_rows, 1)):
        # a maintenance daemon shares the table with live writers: losing
        # the optimistic commit race to a stream batch is ROUTINE, not an
        # error — drop the attempt (its staged files become grace-window
        # orphans) and let the next cycle re-evaluate against the new head
        try:
            table.compact(drop_tombstones=policy.drop_tombstones,
                          write_salt=policy.write_salt,
                          target_rows_per_file=policy.target_rows_per_file)
            actions["full_compact"] = True
        except CommitConflictError:
            actions["full_compact"] = "lost_race"
    elif not snap.multi_version:
        # incremental: rewrite only the worst-fragmented buckets. Census
        # loads only shards that COULD contain a bucket over the threshold
        if snap.manifests is not None and snap._files is None:
            cand = [f for e in snap.manifests
                    if e.lo is not None and e.n_files > policy.max_bucket_files
                    for f in table._load_manifest(e.path)]
        else:
            cand = [f for f in snap.files if f.bucket is not None]
        counts = Counter(f.bucket for f in cand if f.bucket is not None)
        frag = [b for b, c in counts.most_common(policy.max_fragmented_buckets)
                if c > policy.max_bucket_files]
        if frag:
            try:
                table.compact(buckets=set(frag),
                              drop_tombstones=policy.drop_tombstones,
                              write_salt=policy.write_salt,
                              target_rows_per_file=policy.target_rows_per_file)
                actions["bucket_compacts"] = sorted(frag)
            except CommitConflictError:
                actions["bucket_compacts"] = "lost_race"
            except MultiVersionError:
                # a MOR delta landed between the census and the compact:
                # bucket-scoped compaction refuses on multi-version
                # tables — next cycle's census will route to full compact.
                # Any OTHER ValueError (e.g. compact's rows-outside-buckets
                # invariant) is a genuine engine bug and propagates.
                actions["bucket_compacts"] = "deferred_multi_version"

    if policy.expire_keep_last is not None:
        marker = os.path.join(table.meta_dir, ".last-orphan-sweep")
        try:
            sweep_due = (time.time() - os.path.getmtime(marker)
                         > policy.orphan_sweep_every_s)
        except FileNotFoundError:
            sweep_due = True
        actions["expired"] = table.expire_snapshots(
            policy.expire_keep_last, clean_orphans=sweep_due,
            orphan_grace_s=policy.orphan_grace_s)
        if sweep_due:
            with open(marker, "w") as fh:
                fh.write(str(time.time()))
    return actions
