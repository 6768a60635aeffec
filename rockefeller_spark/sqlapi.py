"""SQL text surface over lake tables: views + MERGE/UPDATE/DELETE text.

The engine is DataFrame-first, but the reference user speaks SQL strings
(``/root/reference/scripts/collector.py:54-64`` builds its reads as SQL
text; ``/root/reference/scripts/verify.py:60`` mutates with SQL). This
module closes that interface gap without adding a second execution
engine: queries become Spark temp views over snapshot-pinned lake reads
(Catalyst sees exactly the same plan as the DataFrame API — pruning,
pushdown and bucket skipping all survive ``spark.sql``), and DML text
compiles onto :mod:`rockefeller_spark.dml`, so a SQL ``MERGE INTO`` rides
the same single-shuffle apply path, atomic commit, conflict retry and
change-feed visibility as the programmatic one.

Scope is the statement shapes the engine's DML supports — documented
per function; anything outside the subset raises ``SqlUnsupportedError``
with the reason, never a silently-different semantics.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rockefeller_spark import schema as S
from rockefeller_spark import dml
from rockefeller_spark.lake import LakeTable
from rockefeller_spark.merge import ApplyResult, read_state


class SqlUnsupportedError(ValueError):
    """The statement parses but uses a construct outside the supported
    subset (the message says which, and what to use instead)."""


# --------------------------------------------------------------- views

def register_view(table: LakeTable, name: str, *,
                  snapshot_id: "int | str | None" = None,
                  as_of=None) -> DataFrame:
    """Publish the table's VISIBLE state (LWW-resolved, tombstones
    dropped, engine columns hidden — :func:`merge.read_state`) as a Spark
    temp view, so ``spark.sql(f"SELECT ... FROM {name}")`` works.

    The view is SNAPSHOT-PINNED at registration (repeatable read): later
    commits do not leak into an already-registered view — re-register to
    advance, exactly like re-resolving a branch head. ``snapshot_id``
    accepts an id, a tag, or a branch name (anything
    :meth:`LakeTable.snapshot` resolves); ``as_of`` pins by timestamp.
    Returns the underlying DataFrame (the view and the return value share
    one plan)."""
    if as_of is not None:
        if snapshot_id is not None:
            raise ValueError("pass snapshot_id or as_of, not both")
        snapshot_id = table.snapshot_as_of(as_of).snapshot_id
    df = read_state(table, snapshot_id)
    df.createOrReplaceTempView(name)
    return df


# ------------------------------------------------- lexing-lite helpers

def _mask_strings(text: str) -> str:
    """Same-length copy with single-quoted literal CONTENTS blanked, so
    structural regexes can't match keywords inside strings while every
    span still indexes the original text ('' escapes respected)."""
    out = list(text)
    i, n = 0, len(text)
    while i < n:
        if text[i] == "'":
            j = i + 1
            while j < n:
                if text[j] == "'":
                    if j + 1 < n and text[j + 1] == "'":   # escaped ''
                        j += 2
                        continue
                    break
                j += 1
            if j >= n:
                raise ValueError("unterminated string literal in SQL text")
            for k in range(i + 1, j):
                out[k] = "x"
            i = j + 1
        else:
            i += 1
    return "".join(out)


def _split_top(text: str, masked: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren depth 0 (masked copy decides structure,
    original supplies the pieces)."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(masked):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append(text[start:i])
            start = i + 1
    parts.append(text[start:])
    return [p.strip() for p in parts if p.strip()]


def _rewrite_refs(expr: str, target_alias: str | None,
                  source_alias: str | None) -> str:
    """Map SQL alias references onto the joined-row namespace
    :func:`dml.merge_into` evaluates predicates in: ``t.col`` → ``t_col``
    (target side), ``s.col`` → ``col`` (source side keeps bare names).
    Quoted strings are left untouched."""
    masked = _mask_strings(expr)
    out, consumed = [], 0

    def _sub(m: re.Match) -> None:
        nonlocal consumed
        alias, col = m.group(1), m.group(2)
        out.append(expr[consumed:m.start()])
        if target_alias and alias.lower() == target_alias.lower():
            out.append(f"t_{col}")
        elif source_alias and alias.lower() == source_alias.lower():
            out.append(col)
        else:
            raise SqlUnsupportedError(
                f"unknown table alias {alias!r} in expression {expr!r} "
                f"(aliases in scope: target={target_alias!r}, "
                f"source={source_alias!r})")
        consumed = m.end()

    for m in re.finditer(r"\b([A-Za-z_][A-Za-z0-9_]*)\s*\.\s*"
                         r"([A-Za-z_][A-Za-z0-9_]*)", masked):
        _sub(m)
    out.append(expr[consumed:])
    return "".join(out)


def _parse_on_keys(cond: str, target_alias: str, source_alias: str) -> None:
    """The engine MERGE joins on the table key — verify the ON clause is
    exactly that equality conjunction (any order), else raise."""
    masked = _mask_strings(cond)
    seen: set[str] = set()
    pieces = re.split(r"(?i)\bAND\b", masked)
    spans, pos = [], 0
    for p in pieces:
        spans.append(cond[pos:pos + len(p)])
        pos += len(p) + 3                      # len("AND")
    pat = re.compile(
        r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*\.\s*([A-Za-z_][A-Za-z0-9_]*)"
        r"\s*=\s*([A-Za-z_][A-Za-z0-9_]*)\s*\.\s*([A-Za-z_][A-Za-z0-9_]*)"
        r"\s*$")
    for piece in spans:
        m = pat.match(piece)
        if not m:
            raise SqlUnsupportedError(
                f"unsupported ON condition {piece.strip()!r}: the engine "
                f"MERGE joins on the table key {tuple(S.KEY_COLS)}; the ON "
                "clause must be the key-equality conjunction like "
                "t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx")
        a1, c1, a2, c2 = m.groups()
        aliases = {a1.lower(), a2.lower()}
        if c1 != c2 or aliases != {target_alias.lower(),
                                   source_alias.lower()}:
            raise SqlUnsupportedError(
                f"ON term {piece.strip()!r} must equate the SAME key "
                "column across the two aliases")
        seen.add(c1)
    if seen != set(S.KEY_COLS):
        raise SqlUnsupportedError(
            f"ON clause covers {sorted(seen)}; it must cover exactly the "
            f"table key {sorted(S.KEY_COLS)}")


# ----------------------------------------------------------- MERGE INTO

_MERGE_HEAD = re.compile(
    r"^\s*MERGE\s+INTO\s+(?P<target>[A-Za-z_][\w.]*)"
    r"(?:\s+(?:AS\s+)?(?P<talias>[A-Za-z_]\w*))?"
    r"\s+USING\s+(?:(?P<subq>\()|(?P<source>[A-Za-z_][\w.]*))",
    re.IGNORECASE)

_WHEN = re.compile(
    r"\bWHEN\s+(?P<not>NOT\s+)?MATCHED\b(?:\s+AND\b(?P<pred>.*?))?"
    r"\s*THEN\s+(?P<action>DELETE|UPDATE\s+SET\b(?P<set>.*?)|INSERT\s+\*)"
    r"\s*(?=\bWHEN\b|$)",
    re.IGNORECASE | re.DOTALL)


@dataclass
class _Merge:
    target: str
    target_alias: str
    source_sql: str | None          # subquery text (without parens)
    source_name: str | None
    source_alias: str
    on: str
    clauses: list  # (kind, pred, payload)


def _parse_merge(text: str) -> _Merge:
    masked = _mask_strings(text)
    m = _MERGE_HEAD.match(masked)
    if not m:
        raise SqlUnsupportedError(
            "statement does not match 'MERGE INTO <table> [AS t] USING "
            "<source>|(<subquery>) [AS s] ON ...'")
    target = m.group("target")
    talias = m.group("talias") or target
    pos = m.end()
    source_sql = source_name = None
    if m.group("subq"):
        depth, i = 1, pos
        while i < len(masked) and depth:
            if masked[i] == "(":
                depth += 1
            elif masked[i] == ")":
                depth -= 1
            i += 1
        if depth:
            raise ValueError("unbalanced parens in USING (<subquery>)")
        source_sql = text[pos:i - 1].strip()
        pos = i
    else:
        source_name = m.group("source")
    mm = re.match(r"\s*(?:AS\s+)?([A-Za-z_]\w*)?\s*ON\b",
                  masked[pos:], re.IGNORECASE)
    if not mm:
        raise SqlUnsupportedError("expected '[AS alias] ON <cond>' after "
                                  "the USING source")
    salias = mm.group(1) or source_name or "src"
    if salias.upper() == "ON":      # bare 'ON' captured as alias
        salias = source_name or "src"
    pos += mm.end()
    first_when = re.search(r"\bWHEN\b", masked[pos:], re.IGNORECASE)
    if not first_when:
        raise SqlUnsupportedError("MERGE with no WHEN clause is a no-op")
    on = text[pos:pos + first_when.start()].strip()
    rest, rest_masked = text[pos + first_when.start():], \
        masked[pos + first_when.start():]

    clauses: list = []
    consumed = 0
    for w in _WHEN.finditer(rest_masked):
        if rest_masked[consumed:w.start()].strip():
            raise SqlUnsupportedError(
                f"unparsed text between WHEN clauses: "
                f"{rest[consumed:w.start()].strip()!r}")
        action_masked = w.group("action").upper()
        pred = (rest[w.start('pred'):w.end('pred')].strip()
                if w.group("pred") else None)
        if w.group("not"):
            if not action_masked.startswith("INSERT"):
                raise SqlUnsupportedError(
                    "WHEN NOT MATCHED supports only 'THEN INSERT *' "
                    "(sources carry the full visible row, like INSERT)")
            if pred:
                raise SqlUnsupportedError(
                    "WHEN NOT MATCHED AND <pred> is not supported (the "
                    "engine inserts every absent source key)")
            clauses.append(("insert", None, None))
        elif action_masked == "DELETE":
            clauses.append(("delete", pred, None))
        elif action_masked.startswith("UPDATE"):
            if pred:
                raise SqlUnsupportedError(
                    "WHEN MATCHED AND <pred> THEN UPDATE is not supported "
                    "(only DELETE takes a matched-predicate; updates apply "
                    "to the remaining matched rows)")
            set_txt = rest[w.start("set"):w.end("set")].strip()
            clauses.append(("update", None, set_txt))
        else:                                  # INSERT * without NOT
            raise SqlUnsupportedError("'WHEN MATCHED THEN INSERT' is not "
                                      "valid MERGE syntax")
        consumed = w.end()
    if rest_masked[consumed:].strip():
        raise SqlUnsupportedError(
            f"trailing unparsed text: {rest[consumed:].strip()!r}")
    return _Merge(target, talias, source_sql, source_name, salias, on,
                  clauses)


def sql_merge_into(spark: SparkSession, text: str,
                   tables: dict[str, LakeTable], *,
                   source: DataFrame | None = None,
                   write_salt: int = 4, mode: str = "cow",
                   retries: int = 0) -> ApplyResult:
    """Execute a ``MERGE INTO`` statement against a lake table by
    compiling it onto :func:`dml.merge_into` (one event batch at one
    fresh high-water-mark LSN through the apply path).

    Supported shape — the exact surface the engine MERGE has::

        MERGE INTO <table> [AS t]
        USING <view-or-table-name> | (<any SELECT>) [AS s]
        ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
        [WHEN MATCHED [AND <pred>] THEN DELETE]
        [WHEN MATCHED THEN UPDATE SET * | SET col = <expr>, ...]
        [WHEN NOT MATCHED THEN INSERT *]

    ``<table>`` resolves through ``tables`` (name → LakeTable).  The
    USING side resolves as a Spark temp view / catalog name, a full
    subquery run through ``spark.sql``, or an explicit ``source=``
    DataFrame (then the USING name is just its alias).  Predicates and
    SET expressions are any Spark SQL expressions; ``t.col`` refers to
    the current target row, ``s.col`` (or a bare name) to the source row
    — the same namespace the programmatic API documents.

    Guard rails (each raises :class:`SqlUnsupportedError`): the ON clause
    must be the key-equality conjunction (the engine merges by table
    key); when both DELETE and UPDATE clauses appear, DELETE must be
    written first (the engine evaluates it first — Delta's clause-order
    rule — so accepting the other order would silently reorder);
    UPDATE/INSERT clauses take no extra predicate."""
    p = _parse_merge(text)
    if p.target not in tables:
        raise KeyError(f"unknown MERGE target {p.target!r}; known tables: "
                       f"{sorted(tables)}")
    table = tables[p.target]
    _parse_on_keys(p.on, p.target_alias, p.source_alias)

    kinds = [k for k, _, _ in p.clauses]
    for k in ("delete", "update", "insert"):
        if kinds.count(k) > 1:
            raise SqlUnsupportedError(f"multiple {k.upper()} clauses")
    if ("delete" in kinds and "update" in kinds
            and kinds.index("update") < kinds.index("delete")):
        raise SqlUnsupportedError(
            "UPDATE before DELETE: the engine evaluates the DELETE clause "
            "first (Delta clause-order semantics) — write DELETE first so "
            "the text order matches what runs")

    if source is None:
        source = (spark.sql(p.source_sql) if p.source_sql is not None
                  else spark.table(p.source_name))

    when_matched_update: "dict | str | None" = None
    when_matched_delete = None
    insert = False
    for kind, pred, set_txt in p.clauses:
        if kind == "insert":
            insert = True
        elif kind == "delete":
            when_matched_delete = (
                F.expr(_rewrite_refs(pred, p.target_alias, p.source_alias))
                if pred else F.lit(True))
        elif kind == "update":
            if set_txt.strip() == "*":
                when_matched_update = "all"
            else:
                masked = _mask_strings(set_txt)
                assigns = {}
                for item in _split_top(set_txt, masked):
                    im = re.match(r"^\s*(?:[A-Za-z_]\w*\s*\.\s*)?"
                                  r"([A-Za-z_]\w*)\s*=\s*(.+)$",
                                  item, re.DOTALL)
                    if not im:
                        raise SqlUnsupportedError(
                            f"cannot parse SET assignment {item!r}")
                    assigns[im.group(1)] = F.expr(_rewrite_refs(
                        im.group(2).strip(), p.target_alias,
                        p.source_alias))
                when_matched_update = assigns
    return dml.merge_into(
        table, source,
        when_matched_update=when_matched_update,
        when_matched_delete=when_matched_delete,
        when_not_matched_insert=insert,
        write_salt=write_salt, mode=mode, retries=retries)


# ------------------------------------------------------ DELETE / UPDATE

_DELETE = re.compile(r"^\s*DELETE\s+FROM\s+(?P<t>[A-Za-z_][\w.]*)"
                     r"\s+WHERE\b(?P<pred>.+)$",
                     re.IGNORECASE | re.DOTALL)
_UPDATE = re.compile(r"^\s*UPDATE\s+(?P<t>[A-Za-z_][\w.]*)"
                     r"\s+SET\b(?P<set>.*?)\s+WHERE\b(?P<pred>.+)$",
                     re.IGNORECASE | re.DOTALL)


def sql_delete(spark: SparkSession, text: str,
               tables: dict[str, LakeTable], **apply_kw) -> ApplyResult:
    """``DELETE FROM <table> WHERE <pred>`` → :func:`dml.delete_where`
    (tombstone events through the apply path; predicate is any Spark SQL
    expression over the visible row)."""
    # match against the MASKED text (like every other parser here) so a
    # WHERE inside a string literal can't mis-split; slice the predicate
    # out of the ORIGINAL text by span (masking is length-preserving)
    m = _DELETE.match(_mask_strings(text))
    if not m:
        raise SqlUnsupportedError(
            "statement does not match 'DELETE FROM <table> WHERE <pred>' "
            "(an unfiltered DELETE must say WHERE true explicitly)")
    if m.group("t") not in tables:
        raise KeyError(f"unknown table {m.group('t')!r}")
    return dml.delete_where(
        tables[m.group("t")],
        F.expr(text[m.start("pred"):m.end("pred")].strip()), **apply_kw)


def sql_update(spark: SparkSession, text: str,
               tables: dict[str, LakeTable], **apply_kw) -> ApplyResult:
    """``UPDATE <table> SET col = <expr>, ... WHERE <pred>`` →
    :func:`dml.update_where` (upsert events through the apply path;
    expressions see the current row's columns)."""
    # masked match + span slicing, as _parse_merge/_INSERT do: a WHERE
    # keyword inside a SET string literal must not split the statement
    m = _UPDATE.match(_mask_strings(text))
    if not m:
        raise SqlUnsupportedError(
            "statement does not match 'UPDATE <table> SET col = expr[, "
            "...] WHERE <pred>' (an unfiltered UPDATE must say WHERE "
            "true explicitly)")
    if m.group("t") not in tables:
        raise KeyError(f"unknown table {m.group('t')!r}")
    set_txt = text[m.start("set"):m.end("set")].strip()
    masked = _mask_strings(set_txt)
    assigns = {}
    for item in _split_top(set_txt, masked):
        im = re.match(r"^\s*([A-Za-z_]\w*)\s*=\s*(.+)$", item, re.DOTALL)
        if not im:
            raise SqlUnsupportedError(f"cannot parse SET assignment "
                                      f"{item!r}")
        assigns[im.group(1)] = F.expr(im.group(2).strip())
    return dml.update_where(
        tables[m.group("t")],
        F.expr(text[m.start("pred"):m.end("pred")].strip()), assigns,
        **apply_kw)


def execute(spark: SparkSession, text: str,
            tables: dict[str, LakeTable], **apply_kw) -> ApplyResult:
    """Route a DML statement by its leading keyword (MERGE / DELETE /
    UPDATE). SELECTs don't come here — register a view and use
    ``spark.sql`` directly."""
    head = text.lstrip().split(None, 1)[0].upper() if text.strip() else ""
    if head == "MERGE":
        return sql_merge_into(spark, text, tables, **apply_kw)
    if head == "DELETE":
        return sql_delete(spark, text, tables, **apply_kw)
    if head == "UPDATE":
        return sql_update(spark, text, tables, **apply_kw)
    if head == "INSERT":
        return sql_insert(spark, text, tables, **apply_kw)
    if head == "OPTIMIZE":
        return sql_optimize(spark, text, tables, **apply_kw)
    if head == "VACUUM":
        return sql_vacuum(spark, text, tables, **apply_kw)
    raise SqlUnsupportedError(
        f"cannot route statement starting with {head!r}: MERGE/DELETE/"
        "UPDATE/INSERT/OPTIMIZE/VACUUM are statements here; for "
        "SELECT, register_view + "
        "spark.sql")


# ------------------------------------------------------ metadata tables

def register_meta_views(table: LakeTable, name: str, *,
                        snapshot_id: "int | str | None" = None,
                        files: bool = False) -> "dict[str, DataFrame]":
    """Iceberg metadata-table analogs as temp views, for SQL-side table
    introspection (``SELECT * FROM conv_history ORDER BY snapshot_id``):

    - ``<name>_history``  — retained snapshots: id, parent, commit time,
      operation (from lineage), bucket count, multi-version flag. Cost
      O(retained snapshots) driver-side.
    - ``<name>_refs``     — ``main`` + every tag and branch with the
      snapshot it points at. Cost O(refs).
    - ``<name>_manifests`` — the pinned snapshot's manifest list: shard
      path, bucket range, per-shard file/row/LSN aggregates. Cost
      O(shards), ZERO manifest loads — this is the scale-shaped view
      (the per-shard aggregates answer most "how big / how fragmented /
      where" questions).
    - ``<name>_files``    — per-file entries (path, bucket, rows, LSN and
      ts bounds, schema vintage). O(table files) driver materialization:
      an audit surface, so it is OPT-IN via ``files=True``; prefer
      ``_manifests`` in anything scheduled.

    Views are snapshot-pinned like :func:`register_view`; re-register to
    advance. Returns the DataFrames by view name."""
    spark = table.spark
    snap = (table.current() if snapshot_id is None
            else table.snapshot(snapshot_id))
    out: dict[str, DataFrame] = {}

    hist = [(s.snapshot_id, s.parent_id, s.timestamp_ms,
             s.lineage.get("op", "append" if s.parent_id is not None
                           else "create"),
             s.multi_version, s.n_buckets)
            for s in table.history()]
    out[f"{name}_history"] = spark.createDataFrame(
        hist, "snapshot_id long, parent_id long, timestamp_ms long, "
              "operation string, multi_version boolean, n_buckets int")

    refs = [("main", "branch", table.current_version(), None, None)]
    for nm, t in table.tags().items():
        refs.append((nm, "tag", int(t["snapshot_id"]),
                     t.get("created_ms"), t.get("note")))
    for nm, b in table.branches().items():
        refs.append((nm, "branch", int(b["head"]),
                     b.get("created_ms"), b.get("note")))
    out[f"{name}_refs"] = spark.createDataFrame(
        refs, "name string, type string, snapshot_id long, "
              "created_ms long, note string")

    man = [(e.path, e.lo, e.hi, e.n_files, e.rows, e.min_lsn, e.max_lsn)
           for e in (snap.manifests or [])]
    out[f"{name}_manifests"] = spark.createDataFrame(
        man, "path string, bucket_lo int, bucket_hi int, n_files long, "
             "rows long, min_lsn long, max_lsn long")

    if files:
        rows = []
        for cols in snap.file_columns():
            n = len(cols["path"])
            get = lambda k: cols.get(k) or [None] * n  # noqa: E731
            rows.extend(zip(cols["path"], get("bucket"), get("rows"),
                            get("min_lsn"), get("max_lsn"),
                            get("min_ts"), get("max_ts"), get("schema_v")))
        out[f"{name}_files"] = spark.createDataFrame(
            rows, "path string, bucket int, rows long, min_lsn long, "
                  "max_lsn long, min_ts long, max_ts long, schema_v long")

    for view, df in out.items():
        df.createOrReplaceTempView(view)
    return out


# -------------------------------------------------------------- INSERT

_INSERT = re.compile(
    r"^\s*INSERT\s+INTO\s+(?P<t>[A-Za-z_][\w.]*)"
    r"(?:\s*\((?P<cols>[^)]*)\))?"
    r"\s+(?P<q>(?:SELECT|VALUES|WITH|TABLE)\b.*)$",
    re.IGNORECASE | re.DOTALL)


def sql_insert(spark: SparkSession, text: str,
               tables: dict[str, LakeTable], **apply_kw) -> ApplyResult:
    """``INSERT INTO <table> [(col, ...)] SELECT ...|VALUES ...`` —
    UPSERT-BY-KEY semantics: the rows become insert events at one fresh
    high-water-mark LSN through :func:`dml.merge_into` (update-all +
    insert), so inserting an existing key REPLACES that row. A keyed
    CDC table cannot hold two live versions of one key, which is what
    warehouse-append INSERT semantics would require — the upsert reading
    is the only consistent one, and it is what the reference's
    ``ON CONFLICT``-style loads mean. Duplicate keys WITHIN the
    statement raise (the MERGE determinism rule).

    With a column list, the query's output maps to it positionally and
    unlisted payload columns become NULL; without one, the query must
    produce every visible column. VALUES rows ride Spark's own
    ``VALUES`` parser, so any Spark SQL literal/expression works."""
    masked = _mask_strings(text)
    m = _INSERT.match(masked)
    if not m:
        raise SqlUnsupportedError(
            "statement does not match 'INSERT INTO <table> [(cols)] "
            "SELECT ...|VALUES ...' (INSERT OVERWRITE and DEFAULT "
            "VALUES are not supported)")
    if m.group("t") not in tables:
        raise KeyError(f"unknown table {m.group('t')!r}")
    table = tables[m.group("t")]
    src = spark.sql(text[m.start("q"):])
    schema = table.current().schema
    visible = [f.name for f in schema.fields if not f.name.startswith("_")]
    if m.group("cols"):
        names = [c.strip() for c in m.group("cols").split(",") if c.strip()]
        extra = set(names) - set(visible)
        if extra:
            raise SqlUnsupportedError(
                f"unknown columns in INSERT list: {sorted(extra)}")
        if len(set(names)) != len(names):
            raise SqlUnsupportedError(
                "duplicate columns in INSERT column list")
        missing_keys = set(S.KEY_COLS) - set(names)
        if missing_keys:
            # the NULL-fill below would otherwise land a null-key row in
            # the keyed table — unjoinable and un-updatable forever
            raise SqlUnsupportedError(
                f"INSERT column list must include the table key columns "
                f"{sorted(S.KEY_COLS)} (missing {sorted(missing_keys)})")
    else:
        names = visible                     # SQL positional-insert rule
    if len(names) != len(src.columns):
        raise SqlUnsupportedError(
            f"column list has {len(names)} names but the query "
            f"produces {len(src.columns)} columns")
    src = src.toDF(*names)                  # positional mapping
    for f in schema.fields:
        if f.name not in names and not f.name.startswith("_"):
            src = src.withColumn(f.name, F.lit(None).cast(f.dataType))
    return dml.merge_into(table, src, when_matched_update="all",
                          when_not_matched_insert=True, **apply_kw)


# ------------------------------------------------- OPTIMIZE / VACUUM

_OPTIMIZE = re.compile(
    r"^\s*OPTIMIZE\s+(?P<t>[A-Za-z_][\w.]*)"
    r"(?:\s+ZORDER\s+BY\s*\(\s*(?P<z>[^)]+?)\s*\))?\s*$",
    re.IGNORECASE)
_VACUUM = re.compile(
    r"^\s*VACUUM\s+(?P<t>[A-Za-z_][\w.]*)"
    r"(?:\s+RETAIN\s+(?P<n>\d+)\s+SNAPSHOTS)?\s*$",
    re.IGNORECASE)


def sql_optimize(spark: SparkSession, text: str,
                 tables: dict[str, LakeTable], **compact_kw):
    """``OPTIMIZE <table> [ZORDER BY (col, ...)]`` → ``LakeTable.compact``
    (Delta's OPTIMIZE surface): plain = key-sorted sized compaction,
    ZORDER BY = multi-column clustering (numeric/timestamp/date columns;
    the engine raises on strings exactly like the programmatic call).
    Returns the new snapshot."""
    m = _OPTIMIZE.match(_mask_strings(text))
    if not m:
        raise SqlUnsupportedError(
            "statement does not match 'OPTIMIZE <table> "
            "[ZORDER BY (col, ...)]'")
    if m.group("t") not in tables:
        raise KeyError(f"unknown table {m.group('t')!r}")
    if m.group("z"):
        cols = [c.strip() for c in m.group("z").split(",") if c.strip()]
        compact_kw.setdefault("zorder_by", cols)
    return tables[m.group("t")].compact(**compact_kw)


def sql_vacuum(spark: SparkSession, text: str,
               tables: dict[str, LakeTable], **expire_kw):
    """``VACUUM <table> [RETAIN <n> SNAPSHOTS]`` →
    ``LakeTable.expire_snapshots`` (+ the grace-windowed orphan sweep).
    Default retention matches the programmatic default; the statement
    never goes below 1 (the current snapshot is always kept). Returns
    the expiry stats dict."""
    m = _VACUUM.match(_mask_strings(text))
    if not m:
        raise SqlUnsupportedError(
            "statement does not match 'VACUUM <table> "
            "[RETAIN <n> SNAPSHOTS]'")
    if m.group("t") not in tables:
        raise KeyError(f"unknown table {m.group('t')!r}")
    if m.group("n"):
        expire_kw.setdefault("keep_last", int(m.group("n")))
    return tables[m.group("t")].expire_snapshots(**expire_kw)
