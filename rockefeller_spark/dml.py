"""Predicate DML on lake tables: DELETE FROM / UPDATE ... WHERE.

Both are expressed as CHANGE EVENTS fed back through the engine's own
apply path (``merge.apply_batch``) rather than as a second write pipeline:
a DELETE is a batch of tombstone events for the matching keys, an UPDATE a
batch of upsert events carrying the new payload, both stamped one LSN past
the table's high-water mark. That buys, for free, everything apply already
guarantees — touched-bucket pruning (only buckets containing matches are
rewritten), salted writes, atomic snapshot commit, LWW idempotence, and
correctness on multi-version (pending MOR delta) tables — and it makes
DML visible to :func:`feed.changes_between` consumers like any other
change. (Iceberg's DELETE FROM/UPDATE are the same idea: predicate →
row-level deletes → commit.)

The reference mutates rows imperatively per entity
(``/root/reference/scripts/verify.py:60-87``); here DML is one declarative
batch through the MERGE path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rockefeller_spark import schema as S
from rockefeller_spark.lake import LakeTable
from rockefeller_spark.merge import ApplyResult, apply_batch, read_state


def _next_lsn(table: LakeTable) -> int:
    hwm = table.stats()["max_lsn"]
    return (hwm if hwm is not None else -1) + 1


def _as_events(rows: DataFrame, op: str, lsn: int) -> DataFrame:
    """Wrap visible rows in the change-event envelope at a fixed LSN (each
    key appears once per DML batch, so a shared LSN is unambiguous)."""
    payload = [c for c in rows.columns]
    return rows.select(
        F.lit(lsn).cast("long").alias("lsn"),
        F.lit(op).alias("op"),
        *payload,
        F.current_timestamp().alias("event_ts"))


def delete_where(table: LakeTable, condition: Column, *,
                 write_salt: int = 4, mode: str = "cow",
                 retries: int = 0) -> ApplyResult:
    """DELETE FROM table WHERE condition — tombstones the matching keys.

    Scan side: one pruned read of the visible state to find matching keys
    (predicates reach the parquet scan). Write side: exactly the apply
    path — only the buckets containing matches are rewritten (``mode=
    "mor"`` appends tombstone deltas instead, O(matches)). Tombstones
    outrank every existing version (LSN = high-water mark + 1), so late
    lower-LSN events cannot resurrect the rows.

    The event batch is built by a FACTORY the apply path re-invokes per
    recompute attempt, so under ``retries`` > 0 a conflicting concurrent
    commit gets a FRESH matched-row set and a fresh high-water-mark LSN —
    the tombstones-outrank-everything guarantee holds on every attempt,
    not just the first."""
    def make() -> DataFrame:
        matches = read_state(table).filter(condition)
        return _as_events(matches, "D", _next_lsn(table))
    return apply_batch(table, make, write_salt=write_salt, mode=mode,
                       retries=retries)


def update_where(table: LakeTable, condition: Column,
                 set_exprs: dict[str, Column], *,
                 write_salt: int = 4, mode: str = "cow",
                 retries: int = 0) -> ApplyResult:
    """UPDATE table SET col = expr, ... WHERE condition — rewrites the
    matching rows' payload through the apply path (same pruning/commit/
    fresh-LSN-per-attempt story as :func:`delete_where`). ``set_exprs``
    maps payload column names to expressions evaluated over the current
    row; key columns cannot be assigned (that's a delete + insert, by
    design — same rule as every MERGE engine)."""
    bad = set(set_exprs) & set(S.KEY_COLS)
    if bad:
        raise ValueError(f"cannot UPDATE key columns {sorted(bad)}; "
                         f"delete + re-insert instead")
    unknown = set(set_exprs) - set(read_state(table).columns)
    if unknown:
        raise ValueError(f"unknown columns in SET: {sorted(unknown)}")

    def make() -> DataFrame:
        matches = read_state(table).filter(condition)
        updated = matches.select(
            *[set_exprs.get(c, F.col(c)).alias(c) for c in matches.columns])
        return _as_events(updated, "U", _next_lsn(table))
    return apply_batch(table, make, write_salt=write_salt, mode=mode,
                       retries=retries)


def merge_into(table: LakeTable, source: DataFrame, *,
               when_matched_update: "dict[str, Column] | str | None" = "all",
               when_matched_delete: Column | None = None,
               when_not_matched_insert: bool = True,
               write_salt: int = 4, mode: str = "cow",
               retries: int = 0) -> ApplyResult:
    """Declarative MERGE INTO (the Iceberg/Delta ``MERGE INTO t USING s
    ON keys`` shape) over the engine's apply path: ``source`` rows join
    the visible table state on the key columns, each clause compiles to
    change events at one fresh high-water-mark LSN, and the single event
    batch rides :func:`merge.apply_batch` — touched-bucket pruning,
    salting, atomic commit, conflict rebase/retry, feed visibility, all
    for free. Every key appears in exactly one clause, so one shared LSN
    is unambiguous.

    ``source`` must carry the key columns plus every visible payload
    column (the INSERT rule). Clauses:

    - ``when_matched_delete``: a Column predicate over the joined row —
      source columns keep their names, target columns are ``t_``-prefixed
      — matching TARGET keys it's true for become tombstones. Evaluated
      first (Delta's clause-order rule).
    - ``when_matched_update``: ``"all"`` (default) overwrites matched
      rows with the source payload; a ``{col: expr}`` dict updates only
      those columns (exprs see source names + ``t_`` target columns);
      ``None`` leaves matched rows untouched.
    - ``when_not_matched_insert``: insert source rows whose key is absent.

    The event batch is built by a factory re-invoked per conflict retry,
    so every attempt sees a fresh matched set and a fresh LSN — the same
    recompute contract as :func:`delete_where`."""
    if isinstance(when_matched_update, str) and when_matched_update != "all":
        raise ValueError("when_matched_update: 'all', a {col: expr} dict, "
                         "or None")
    keys = list(S.KEY_COLS)
    missing = set(keys) - set(source.columns)
    if missing:
        raise ValueError(f"source lacks key columns {sorted(missing)}")
    if isinstance(when_matched_update, dict):
        bad = set(when_matched_update) & set(keys)
        if bad:
            raise ValueError(f"cannot UPDATE key columns {sorted(bad)}")
    # Delta/Iceberg MERGE raise when several source rows match one target
    # row; without this guard duplicate source keys would compile to
    # multiple events for the same key at the one shared LSN with
    # different payloads — an arbitrary LWW tie-break, i.e. a silently
    # nondeterministic MERGE. Duplication is a property of `source` alone
    # (not of table state), so one check outside the retry factory is
    # enough.
    dup = (source.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
           .filter(F.col("_n") > 1).limit(1).collect())
    if dup:
        k = {c: dup[0][c] for c in keys}
        raise ValueError(
            f"MERGE source has {dup[0]['_n']} rows for key {k}; MERGE "
            "requires each key to appear at most once in the source — "
            "dedupe upstream (e.g. cdc.dedupe_lww) before merging")

    def make() -> DataFrame:
        tgt = read_state(table)
        payload = [c for c in tgt.columns if c not in keys]
        lacks = set(payload) - set(source.columns)
        if lacks:
            raise ValueError(
                f"source lacks payload columns {sorted(lacks)} (MERGE "
                "sources carry the full visible row, like INSERT)")
        j = source.select(*keys, *payload).join(
            tgt.select(*keys, F.lit(True).alias("_matched"),
                       *[F.col(c).alias(f"t_{c}") for c in payload]),
            on=keys, how="left")
        matched = F.coalesce(F.col("_matched"), F.lit(False))
        lsn = _next_lsn(table)
        branches: list[DataFrame] = []
        del_cond = when_matched_delete
        if del_cond is not None:
            branches.append(_as_events(
                j.filter(matched & del_cond).select(*keys, *payload),
                "D", lsn))
        rest = matched if del_cond is None else (matched & ~F.coalesce(
            del_cond, F.lit(False)))
        if when_matched_update == "all":
            branches.append(_as_events(
                j.filter(rest).select(*keys, *payload), "U", lsn))
        elif isinstance(when_matched_update, dict):
            unknown = set(when_matched_update) - set(payload)
            if unknown:
                raise ValueError(f"unknown columns in SET: {sorted(unknown)}")
            branches.append(_as_events(
                j.filter(rest).select(
                    *keys, *[when_matched_update.get(c, F.col(c)).alias(c)
                             for c in payload]),
                "U", lsn))
        if when_not_matched_insert:
            branches.append(_as_events(
                j.filter(~matched).select(*keys, *payload), "I", lsn))
        if not branches:
            raise ValueError("MERGE with every clause disabled is a no-op")
        out = branches[0]
        for b in branches[1:]:
            out = out.unionByName(b)
        return out
    return apply_batch(table, make, write_salt=write_salt, mode=mode,
                       retries=retries)
