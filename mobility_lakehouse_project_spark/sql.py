"""SQL front-end: one entry point that runs a SQL string against the
lakehouse.

The reference drives its entire pipeline through SQL strings executed
by an embedded engine inside DAG tasks
(/root/reference/dags/Queries_dag.py:54-95 ``con.execute(query)``,
/root/reference/src/sql/{silver,gold}.sql). This module is that entry
point for the Spark engine: :func:`execute_sql` takes a statement and

* delegates **reads** verbatim to ``spark.sql`` over registered table
  views — the full Spark SQL surface, Catalyst-optimized, untouched;
* parses the **statement head** of writes / DDL / maintenance and
  dispatches to the native operators (``merge_into``, ``delete_where``,
  ``compact``, ...), which own the correctness machinery (stats
  pruning, pinned commits, MOR position deletes) that a naive rewrite
  through views could not provide.

Expression and query *fragments* (everything after WHERE / SET = /
AS / USING) are handed to Spark **unparsed**, so any expression Spark
SQL accepts works there; only the statement skeleton is parsed here.
Identifiers must be unquoted (``ns.table``, plain column names).
DELETE/UPDATE predicates are evaluated as DataFrame filters over the
target scan — scalar expressions of the target's columns, plus one
uncorrelated ``col [NOT] IN (SELECT ...)`` conjunct: small key sets
(<= OPTIONS(subquery_limit), default 100k distinct) compile to a
literal predicate on the normal chunked row-level engine, with the
key list doubling as a bloom/point_eq pruning hint; an over-cap
plain-IN DELETE auto-plans as the distributed semi-join ``MERGE ...
WHEN MATCHED THEN DELETE``. A single-source equality-correlated
``[NOT] EXISTS (SELECT ... FROM s WHERE s.k = t.col AND ...)``
conjunct decorrelates to the same IN plan (NOT EXISTS keeps its exact
ANSI difference from NOT IN: outer NULLs match, inner NULL keys are
ignored); EXISTS shapes beyond one source + one correlation equality
still need a MERGE whose USING query does the correlated work.

Supported statements (heads case-insensitive)::

  SELECT / WITH / VALUES / TABLE ...                 -> DataFrame
  INSERT INTO [TABLE] t [(cols)] <query>             -> append (positional)
  INSERT OVERWRITE [TABLE] t [(cols)] <query>        -> dynamic partition overwrite
  DELETE FROM t [WHERE <expr>] [OPTIONS(...)]        -> delete_where
      OPTIONS(mode='eq') + exact key-equality WHERE   -> blind equality
      delete (zero table read, sequence-scoped)
      OPTIONS(mode='mor' | 'dv')                      -> merge-on-read
      position deletes / deletion vectors (one merged bitmap per
      touched file, Iceberg v3 form — tableformat/dv.py)
      OPTIONS(rebase_retries=N) — validated-rebase attempts over
      concurrent appends (operators/rebase.py; 0 = surface on any
      concurrent commit). Also accepted by UPDATE and MERGE.
  UPDATE t SET c = <expr>, ... [WHERE <expr>] [OPTIONS(...)]
  UPDATE t SET c = <expr over s>, ... FROM <name | (query)> [AS s]
      WHERE t.k = s.k [AND <source-side filter>]... [OPTIONS(...)]
      -- Postgres join-update, planned as the equivalent MERGE
  MERGE INTO t [AS a] USING <name | (query)> [AS b]
      ON a.k = b.k [AND ...]
      [WHEN MATCHED THEN UPDATE SET * | a.c = b.c, ...]
      [WHEN MATCHED THEN DELETE]
      [WHEN NOT MATCHED THEN INSERT *]
      [WHEN NOT MATCHED BY SOURCE THEN DELETE |
       WHEN NOT MATCHED BY SOURCE THEN UPDATE SET col = expr, ...]
      [OPTIONS(mode='mor', ...)]
  CREATE TABLE [IF NOT EXISTS] t [(col type, ...)] [PARTITIONED BY (c)]
      [OPTIONS(...)] [AS <query>]
  DROP TABLE [IF EXISTS] t [PURGE]
  CREATE [OR REPLACE] VIEW v AS <query>              -> catalog view
      (versioned SQL stored in the catalog; body analyzed at
      definition time; reads re-plan it against current table state)
  DROP VIEW [IF EXISTS] v / SHOW VIEWS [IN ns]
  TRUNCATE TABLE t                                   -> metadata-only full delete
  OPTIMIZE t [ZORDER BY (a, b, ...)] [WHERE pred] [OPTIONS(...)]
      (WHERE scopes maintenance to the partitions whose files can
      match — Delta's partition-scoped OPTIMIZE)
  VACUUM t [RETAIN <n> HOURS] [DRY RUN]
  ALTER TABLE t SET TBLPROPERTIES ('k' = 'v', ...)
  ALTER TABLE t ADD COLUMNS (c type, ...)
  ALTER TABLE t DROP COLUMN c
  ALTER TABLE t RENAME COLUMN a TO b
  ALTER TABLE t ALTER COLUMN c TYPE <type>
  ALTER TABLE t ADD CONSTRAINT name CHECK (expr)     -> write-time gate
  ALTER TABLE t DROP CONSTRAINT name
  CALL proc('ns.table' [, key => value, ...])        -> PROCEDURES
  SHOW TABLES [IN ns] / SHOW TBLPROPERTIES t / SHOW PARTITIONS t
  DESCRIBE [TABLE] [EXTENDED] t                      -> DataFrame

Reads may also query a table's inspection views — mentioning
``<view>_files`` / ``_snapshots`` / ``_manifests`` / ``_partitions`` /
``_history`` / ``_refs`` / ``_stats`` (persisted ANALYZE statistics)
in the statement registers them on demand —
and time travel with the Delta/Iceberg idiom: ``FROM <view> VERSION AS
OF <snapshot_id | 'tag-or-branch'>`` or ``FROM <view> TIMESTAMP AS OF
'<iso-ts | epoch-ms>'`` (rewritten into pinned views on the spot).
``FROM <view> UPDATED SINCE <seq>`` reads the incremental net-upsert
feed (rows created/updated after that commit sequence, file-pruned via
the v3 ``_last_updated_seq`` lineage field).

``OPTIONS(key = value, ...)`` is this engine's extension carrying
operator knobs (``mode='mor'``, ``target_file_size=...``,
``evolve_schema=true``, ...) straight through to the operator call.

**Pruning hints are derived automatically**: a DELETE/UPDATE predicate
that is a top-level AND of ``col <op> literal`` comparisons is compiled
into the operators' ``int_ranges`` / ``point_eq`` file-skipping hints
(each derived conjunct is an over-approximation of the matching file
set, so partial derivation is always safe — the full predicate still
decides rows). SQL users get manifest-stats pruning without knowing it
exists.

Named parameters: ``:name`` placeholders (outside string literals) are
bound from ``args`` as SQL literals before parsing — the reference's
parameterized-query idiom (dags/Queries_dag.py:54 f-string dates)
without the injection surface.
"""
from __future__ import annotations

import datetime
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (re-export convenience)
from pyspark.sql import types as T
from pyspark.sql.types import StructType

from .operators.clustering import cluster
from .operators.compaction import compact, split_oversized
from .operators.delete import (
    compact_deletion_vectors,
    delete_where,
    drop_partitions,
    rewrite_position_deletes,
    truncate,
    update_where,
)
from .operators.merge import merge_into
from .tableformat.catalog import Catalog
from .tableformat.table import LakehouseTable


class LakehouseSqlError(ValueError):
    """Statement understood well enough to be rejected with a reason."""


_IDENT = r"[A-Za-z_][\w]*(?:\.[A-Za-z_][\w]*)*"
_INTEGRAL = {"byte", "short", "integer", "long"}
_META_SUFFIXES = ("files", "snapshots", "manifests", "partitions",
                  "history", "refs", "stats")


# --------------------------------------------------------------------------
# lexing helpers: all keyword/position searches run on a MASKED copy of the
# statement (string literals, quoted identifiers, and comments blanked out),
# while every extracted fragment is sliced from the ORIGINAL text.
# --------------------------------------------------------------------------

def _mask(sql: str) -> str:
    out = list(sql)
    i, n = 0, len(sql)

    def blank(a: int, b: int) -> None:
        for k in range(a, min(b, n)):
            if out[k] not in ("\n",):
                out[k] = " "

    while i < n:
        c = sql[i]
        if c in ("'", '"'):
            # Spark string literals: both quote chars, ''-doubling AND
            # backslash escapes (escapedStringLiterals=false default)
            j = i + 1
            while j < n:
                if sql[j] == "\\" and j + 1 < n:
                    j += 2
                    continue
                if sql[j] == c:
                    if j + 1 < n and sql[j + 1] == c:
                        j += 2
                        continue
                    break
                j += 1
            blank(i, j + 1)
            i = j + 1
        elif c == "`":
            j = sql.find(c, i + 1)
            j = n - 1 if j < 0 else j
            blank(i, j + 1)
            i = j + 1
        elif c == "-" and sql[i:i + 2] == "--":
            j = sql.find("\n", i)
            j = n if j < 0 else j
            blank(i, j)
            i = j
        elif c == "/" and sql[i:i + 2] == "/*":
            j = sql.find("*/", i)
            j = n - 2 if j < 0 else j
            blank(i, j + 2)
            i = j + 2
        else:
            i += 1
    return "".join(out)


def _literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, (list, tuple)):
        return "(" + ", ".join(_literal(x) for x in v) + ")"
    raise LakehouseSqlError(f"cannot encode parameter value {v!r} as SQL")


def _bind(sql: str, args: dict) -> str:
    masked = _mask(sql)
    out, last = [], 0
    for m in re.finditer(r"(?<!:):(\w+)", masked):
        if m.group(1) not in args:
            raise LakehouseSqlError(f"unbound SQL parameter :{m.group(1)}")
        out.append(sql[last:m.start()])
        out.append(_literal(args[m.group(1)]))
        last = m.end()
    out.append(sql[last:])
    return "".join(out)


def _split_top(masked: str, sql: str, sep: str,
               lo: int, hi: int) -> list[tuple[int, int]]:
    """(start, end) spans of ``sql[lo:hi]`` split on depth-0 ``sep``."""
    spans, depth, start = [], 0, lo
    for i in range(lo, hi):
        c = masked[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == sep and depth == 0:
            spans.append((start, i))
            start = i + 1
    spans.append((start, hi))
    return spans


def _kw(masked: str, pattern: str, lo: int = 0, hi: int | None = None):
    """First depth-0 match of ``pattern`` in masked[lo:hi]."""
    hi = len(masked) if hi is None else hi
    for m in re.finditer(pattern, masked, re.I):
        if not lo <= m.start() < hi:
            continue
        depth = masked.count("(", lo, m.start()) - masked.count(
            ")", lo, m.start())
        if depth == 0:
            return m
    return None


def _match_paren(masked: str, i: int) -> int:
    """Index just past the ')' matching the '(' at ``i``."""
    depth = 0
    for j in range(i, len(masked)):
        if masked[j] == "(":
            depth += 1
        elif masked[j] == ")":
            depth -= 1
            if depth == 0:
                return j + 1
    raise LakehouseSqlError("unbalanced parentheses")


def _parse_scalar(text: str):
    t = text.strip()
    low = t.lower()
    if low in ("true", "false"):
        return low == "true"
    if low in ("null", "none"):
        return None
    if re.fullmatch(r"[+-]?\d+", t):
        return int(t)
    if re.fullmatch(r"[+-]?\d*\.\d+(e[+-]?\d+)?", low):
        return float(t)
    # a SINGLE complete quoted literal only — "'a' || 'b'" must NOT
    # parse as the string "a' || 'b" (it would poison pruning hints)
    if re.fullmatch(r"'(?:[^'\\]|\\.|'')*'", t, re.S):
        body = t[1:-1].replace("''", "'")
        # decode ONLY the escapes whose Spark semantics are certain; any
        # other backslash sequence must not become a (wrong) hint value
        esc = {"\\\\": "\\", "\\'": "'", '\\"': '"',
               "\\n": "\n", "\\t": "\t", "\\r": "\r"}

        def _unesc(m: re.Match) -> str:
            seq = m.group(0)
            if seq not in esc:
                raise LakehouseSqlError(
                    f"unsupported escape {seq!r} in literal {text!r}")
            return esc[seq]

        return re.sub(r"\\.", _unesc, body)
    raise LakehouseSqlError(f"expected a literal, got {text!r}")


def _parse_value(text: str):
    t = text.strip()
    m = re.fullmatch(r"(?is)array\s*\((.*)\)", t)
    if m:
        inner = m.group(1)
        if not inner.strip():
            return []
        spans = _split_top(_mask(inner), inner, ",", 0, len(inner))
        return [_parse_scalar(inner[a:b]) for a, b in spans]
    return _parse_scalar(t)


def _parse_kv_pairs(masked: str, sql: str, lo: int, hi: int,
                    what: str, string_keys: bool = False,
                    key_re: str = r"\w+") -> dict:
    """``k = v`` pairs split on depth-0 commas in ``sql[lo:hi]``.
    Keys are bare words lowercased (``string_keys=True``: quoted
    literals, case kept — the TBLPROPERTIES form); values are parsed
    literals. Shared by OPTIONS / CTAS OPTIONS / TBLPROPERTIES so the
    three can't drift."""
    out: dict = {}
    if not sql[lo:hi].strip():
        return out
    for a, b in _split_top(masked, sql, ",", lo, hi):
        part = sql[a:b]
        eq = masked[a:b].find("=")
        if eq < 0:
            raise LakehouseSqlError(f"bad {what} entry {part.strip()!r}")
        if string_keys:
            key = _parse_scalar(part[:eq])
            if not isinstance(key, str):
                raise LakehouseSqlError(
                    f"{what} keys must be 'strings', got {part[:eq].strip()!r}")
        elif part[:eq].strip().startswith("'"):
            # quoted keys: table-property style, case preserved
            key = _parse_scalar(part[:eq])
        else:
            key = part[:eq].strip().lower()
            if not re.fullmatch(key_re, key):
                raise LakehouseSqlError(f"bad {what} key {key!r}")
        if key in out:
            raise LakehouseSqlError(f"{what} key {key!r} given twice")
        out[key] = _parse_value(part[eq + 1:])
    return out


def _parse_options(masked: str, sql: str) -> tuple[dict, int]:
    """Trailing ``OPTIONS(k = v, ...)``: (dict, start index) — start is
    ``len(sql)`` when absent."""
    m = _kw(masked, r"\bOPTIONS\s*\(")
    if m is None:
        return {}, len(sql)
    close = _match_paren(masked, m.end() - 1)
    if masked[close:].strip():
        raise LakehouseSqlError("OPTIONS(...) must be the final clause")
    return (_parse_kv_pairs(masked, sql, m.end(), close - 1, "OPTIONS"),
            m.start())


def _check_opts(opts: dict, allowed: set[str], stmt: str) -> dict:
    bad = sorted(set(opts) - allowed)
    if bad:
        raise LakehouseSqlError(
            f"unsupported OPTIONS for {stmt}: {bad} (allowed: "
            f"{sorted(allowed)})")
    return opts


# --------------------------------------------------------------------------
# name resolution
# --------------------------------------------------------------------------

def _resolve(name: str, catalog: Catalog | None,
             tables: dict[str, LakehouseTable] | None) -> LakehouseTable:
    if tables and name in tables:
        return tables[name]
    if catalog is not None:
        return catalog.load_table(name)
    raise LakehouseSqlError(
        f"cannot resolve table {name!r}: pass catalog= or tables=")


_STATS_ITEM = re.compile(
    r"(?is)\s*(?:(count)\s*\(\s*\*\s*\)|(min|max)\s*\(\s*([A-Za-z_]\w*)\s*\))"
    r"(?:\s+AS\s+([A-Za-z_]\w*))?\s*")


def _try_stats_read(spark: SparkSession, sql: str, masked: str,
                    catalog: Catalog | None,
                    tables: "dict[str, LakehouseTable] | None"):
    """Metadata-only aggregate fast path — Iceberg's aggregate
    pushdown: a bare ``SELECT count(*) / min(c) / max(c) FROM <one
    lakehouse table>`` (no WHERE/GROUP BY/JOIN) is answered from
    manifest stats via ``LakehouseTable.stats_aggregate`` — an
    O(files) metadata aggregation instead of a 100 TB data scan.
    Returns None (fall through to the spark.sql read path) whenever
    the statement has any other shape, the name is not a catalog
    table, or metadata cannot answer exactly (delete files, missing
    stats, unsupported column type) — so this is never a semantics
    change, only a plan change."""
    partition_eq = None
    m = re.fullmatch(
        r"(?is)\s*SELECT\s+(.*\S)\s+FROM\s+([A-Za-z_][\w.]*)\s*;?\s*",
        masked)
    if not m:
        # one more metadata-answerable shape: a single equality on the
        # table's identity partition column (partition-pruned count —
        # the per-partition dashboard query)
        wm = re.match(
            r"(?is)\s*SELECT\s+(.*\S)\s+FROM\s+([A-Za-z_][\w.]*)\s+"
            r"WHERE\s+([A-Za-z_]\w*)\s*=", masked)
        if not wm:
            return None
        # the literal must come from SQL, not MASKED (string literals
        # are blanked there) — skip the real whitespace by hand
        pos = wm.end()
        while pos < len(sql) and sql[pos] in " \t\n":
            pos += 1
        lm = re.match(r"(-?\d+)|'([^']*)'", sql[pos:])
        if not lm or sql[pos + lm.end():].strip(" ;\t\n"):
            return None
        value = (int(lm.group(1)) if lm.group(1) is not None
                 else lm.group(2))
        partition_eq = (wm.group(3), value)
        m = wm
    if partition_eq is not None and tables is None and catalog is None:
        return None
    name = m.group(2)
    table = None
    if tables and name in tables:
        table = tables[name]
    elif catalog is not None:
        for full in catalog.list_tables():
            ns, _, tbl = full.rpartition(".")
            view = f"{ns}_{tbl}" if ns else f"default_{tbl}"
            if view.lower() == name.lower() or full.lower() == name.lower():
                table = catalog.load_table(full)
                break
    if table is None:
        return None
    if partition_eq is not None:
        # the literal's TYPE must match the partition column's family:
        # ANSI coercion of a mismatched pair (`s = 5` casting a string
        # column to bigint — '05' matches 5) has no partition-value
        # analog, so anything else takes the generic scan path
        pf = next((f for f in table.schema().fields
                   if f.name == partition_eq[0]), None)
        if pf is None or not (
                (isinstance(pf.dataType, T.StringType)
                 and isinstance(partition_eq[1], str))
                or (isinstance(pf.dataType,
                               (T.ByteType, T.ShortType, T.IntegerType,
                                T.LongType))
                    and isinstance(partition_eq[1], int))):
            return None
    items = []
    for a, b in _split_top(masked, sql, ",", m.start(1), m.end(1)):
        im = _STATS_ITEM.fullmatch(masked, a, b)
        if not im:
            return None
        func = (im.group(1) or im.group(2)).lower()
        col = im.group(3)
        alias = im.group(4) or ("count(1)" if func == "count"
                                else f"{func}({col})")
        items.append((func, col, alias))
    cols = sorted({c for _, c, _ in items if c})
    stats = table.stats_aggregate(spark, cols, partition_eq=partition_eq)
    if stats is None:
        return None
    schema = table.schema()
    exprs = []
    for func, col, alias in items:
        if func == "count":
            exprs.append(F.lit(stats["row_count"]).cast("long").alias(alias))
            continue
        v = stats["mins"][col] if func == "min" else stats["maxs"][col]
        dt = next(f.dataType for f in schema.fields if f.name == col)
        if isinstance(dt, T.DateType) and v is not None:
            v = datetime.date(1970, 1, 1) + datetime.timedelta(days=int(v))
        exprs.append(F.lit(v).cast(dt).alias(alias))
    return spark.range(1).select(*exprs)


def _register_reads(spark: SparkSession, catalog: Catalog | None,
                    tables: dict[str, LakehouseTable] | None,
                    masked: str | None = None,
                    _seen: frozenset = frozenset()) -> None:
    """Register lakehouse tables as temp views for a read. When the
    statement's ``masked`` text is given, only views whose name appears
    as a word in it are registered — a script over a wide warehouse
    must not pay one scan-plan job per table per statement. The filter
    is an over-approximation (a name inside a comment/literal is
    masked out; a mentioned-but-unused view costs one registration),
    never an under-approximation — the view name must appear verbatim
    for spark.sql to reference it."""

    def wanted(view: str) -> bool:
        return masked is None or re.search(
            rf"\b{re.escape(view)}\b", masked, re.I) is not None

    def wanted_meta(view: str) -> bool:
        return masked is not None and any(
            wanted(f"{view}_{sfx}") for sfx in _META_SUFFIXES)

    for name, t in (tables or {}).items():
        if not re.fullmatch(r"[A-Za-z_]\w*", name):
            raise LakehouseSqlError(
                f"tables= key {name!r} is not a valid SQL view name")
        if wanted(name):
            t.register(spark, name)
        if wanted_meta(name):
            t.register_metadata(spark, name)
    if catalog is not None:
        views: dict[str, str] = {}
        for full in catalog.list_tables():
            ns, _, tbl = full.rpartition(".")
            view = f"{ns}_{tbl}" if ns else f"default_{tbl}"
            if view in views:
                raise ValueError(
                    f"view name {view!r} collides: {views[view]!r} "
                    f"and {full!r}")
            views[view] = full
        for view, full in views.items():
            w, wm = wanted(view), wanted_meta(view)
            if w or wm:
                t = catalog.load_table(full)
                if w:
                    t.register(spark, view)
                if wm:
                    t.register_metadata(spark, view)
        # catalog VIEWS mentioned in the statement: register the
        # tables (and views) the view body references first, then the
        # view itself — recursion handles view-over-view; a cycle is
        # cut by _seen and surfaces as spark's unresolved-relation
        # error on the inner body
        for full in catalog.list_views():
            ns, _, v = full.rpartition(".")
            flat = f"{ns}_{v}" if ns else f"default_{v}"
            if flat in views or flat in (tables or {}):
                # same loud failure register_all gives for table-table
                # collisions — silently shadowing the already-registered
                # table view would resolve the name inconsistently
                raise ValueError(
                    f"view name {flat!r} collides: table "
                    f"{views.get(flat) or flat!r} and view {full!r}")
            if flat in _seen or not wanted(flat):
                continue
            body = catalog.load_view(full)
            _register_reads(spark, catalog, tables, _mask(body),
                            _seen | {flat})
            spark.sql(f"CREATE OR REPLACE TEMP VIEW {flat} AS {body}")


def _resolve_view(view: str, catalog: Catalog | None,
                  tables: dict[str, LakehouseTable] | None
                  ) -> LakehouseTable | None:
    """The lakehouse table behind a VIEW name (``tables`` key or the
    catalog's ``<ns>_<table>`` flattening), or None."""
    if tables and view in tables:
        return tables[view]
    if catalog is not None:
        for full in catalog.list_tables():
            ns, _, tbl = full.rpartition(".")
            if f"{ns}_{tbl}" == view:
                return catalog.load_table(full)
    return None


def _rewrite_updated_since(spark, sql: str, catalog, tables) -> str:
    """Rewrite ``<view> UPDATED SINCE <seq>`` into a synthetic
    incremental view (scan(updated_since=seq): the net-upsert feed of
    rows created/updated after that commit sequence, file-seq-pruned —
    see tableformat/table.py::scan). Sequence numbers come from the
    ``<view>_snapshots`` inspection view or a prior read's bookkeeping,
    the same way Iceberg incremental consumers track them."""
    masked = _mask(sql)
    pat = re.compile(rf"\b({_IDENT})\s+UPDATED\s+SINCE\s+(\d+)\b", re.I)
    out = sql
    for m in reversed(list(pat.finditer(masked))):
        view, seq = m.group(1), int(m.group(2))
        t = _resolve_view(view, catalog, tables)
        if t is None:
            raise LakehouseSqlError(
                f"UPDATED SINCE on unknown table/view {view!r}")
        synth = f"{view}__upd_since_{seq}"
        t.register(spark, synth, updated_since=seq)
        out = out[:m.start(1)] + synth + out[m.end():]
    return out


def _rewrite_time_travel(spark, sql: str, catalog, tables) -> str:
    """Rewrite ``<view> VERSION AS OF <id|'ref'>`` and ``<view>
    TIMESTAMP AS OF '<ts>'`` (the Delta/Iceberg read idiom) into
    synthetic pinned views registered on the spot, so plain spark.sql
    can run the rest of the statement. Returns the rewritten text."""
    masked = _mask(sql)
    pat = re.compile(
        rf"\b({_IDENT})\s+(VERSION|TIMESTAMP)\s+AS\s+OF\b", re.I)
    out = sql
    for m in reversed(list(pat.finditer(masked))):
        view = m.group(1)
        kind = m.group(2).upper()
        # the operand may be a string literal (masked to spaces), so
        # scan the ORIGINAL text from the end of the OF keyword
        om = re.match(r"\s*(?:(\d+)|([A-Za-z_]\w*))", sql[m.end():])
        lm = re.match(r"\s*('(?:[^'\\]|\\.|'')*')", sql[m.end():])
        if lm:
            operand = _parse_scalar(lm.group(1))
            op_end = m.end() + lm.end()
        elif om and om.group(1):
            operand = int(om.group(1))
            op_end = m.end() + om.end()
        elif om and om.group(2):
            operand = om.group(2)
            op_end = m.end() + om.end()
        else:
            raise LakehouseSqlError(
                f"{kind} AS OF needs a snapshot id, 'ref', or timestamp")
        t = _resolve_view(view, catalog, tables)
        if t is None:
            raise LakehouseSqlError(
                f"time travel on unknown table/view {view!r}")
        ref = None
        snapshot_id = None
        if kind == "VERSION":
            if isinstance(operand, int):
                snapshot_id = operand
            else:
                ref = operand
        else:
            if isinstance(operand, str) and operand.isdigit():
                operand = int(operand)  # quoted epoch-ms
            if isinstance(operand, int):
                ts_ms = operand
            else:
                import datetime

                try:
                    dt = datetime.datetime.fromisoformat(str(operand))
                except ValueError as e:
                    raise LakehouseSqlError(
                        f"bad TIMESTAMP AS OF value {operand!r}: {e}"
                    ) from None
                if dt.tzinfo is None:
                    # naive timestamps resolve in the SESSION timezone,
                    # the Spark/Delta idiom
                    import zoneinfo

                    tz = spark.conf.get("spark.sql.session.timeZone")
                    try:
                        dt = dt.replace(tzinfo=zoneinfo.ZoneInfo(tz))
                    except (KeyError, zoneinfo.ZoneInfoNotFoundError):
                        dt = dt.replace(tzinfo=datetime.timezone.utc)
                ts_ms = int(dt.timestamp() * 1000)
            snapshot_id = t.snapshot_as_of(ts_ms).snapshot_id
        # distinct refs must get distinct views even when the readable
        # sanitization collides ('v-1' vs 'v_1', tag '123' vs id 123)
        import hashlib

        tok = hashlib.md5(
            repr((kind, ref, snapshot_id)).encode()).hexdigest()[:8]
        synth = (f"{view}__asof_" + re.sub(
            r"\W", "_", str(ref if ref is not None else snapshot_id))
            + "_" + tok)
        t.register(spark, synth, ref=ref, snapshot_id=snapshot_id)
        out = out[:m.start(1)] + synth + out[op_end:]
    return out


# --------------------------------------------------------------------------
# pruning-hint derivation from WHERE text
# --------------------------------------------------------------------------

def _conjuncts(pred: str) -> list[str] | None:
    """Depth-0 AND conjuncts, or None if the top level is not a pure
    conjunction (OR present). BETWEEN's interior AND is re-joined."""
    masked = _mask(pred)
    if _kw(masked, r"\bOR\b") is not None:
        return None
    parts, depth, start, out = [], 0, 0, []
    for m in re.finditer(r"\bAND\b", masked, re.I):
        depth = masked.count("(", 0, m.start()) - masked.count(
            ")", 0, m.start())
        if depth == 0:
            parts.append((start, m.start()))
            start = m.end()
    parts.append((start, len(pred)))
    i = 0
    while i < len(parts):
        a, b = parts[i]
        frag = pred[a:b]
        # a dangling BETWEEN consumed its AND in the split — re-join
        if re.search(r"(?is)\bBETWEEN\b(?:(?!\bAND\b).)*$", _mask(frag)) \
                and i + 1 < len(parts):
            parts[i] = (a, parts[i + 1][1])
            del parts[i + 1]
            continue
        i += 1
    return [pred[a:b] for a, b in parts]


def derive_hints(table: LakehouseTable, pred: str) -> tuple[dict, dict]:
    """Compile a predicate's derivable conjuncts into ``(int_ranges,
    point_eq)`` file-skipping hints. Conservative by construction: each
    hint comes from one AND-conjunct, so the hinted file set is a
    superset of the matching file set; fragments that do not parse are
    simply ignored, and a top-level OR disables derivation entirely."""
    frags = _conjuncts(pred)
    if frags is None:
        return {}, {}
    types = {f.name: f.dataType.typeName() for f in table.schema().fields}
    int_cols = {c for c, t in types.items() if t in _INTEGRAL}
    str_cols = {c for c, t in types.items() if t == "string"}
    dbl_cols = {c for c, t in types.items() if t in ("double", "float")}
    int_ranges: dict[str, tuple] = {}
    point_eq: dict[str, object] = {}

    def hintable(col: str, val) -> bool:
        """point_eq hashing/partition transforms use the literal's
        PYTHON value verbatim — a hint is only sound when the literal's
        type agrees with the column's (Spark's ``=`` coerces, e.g.
        string '012345' = 12345 is TRUE, but a pruned str(12345) hash
        would skip that file)."""
        t = types.get(col)
        if t in _INTEGRAL:
            return isinstance(val, int) and not isinstance(val, bool)
        if t == "string":
            return isinstance(val, str)
        return False

    def narrow(col: str, lo, hi) -> None:
        plo, phi = int_ranges.get(col, (None, None))
        lo = plo if lo is None else (lo if plo is None else max(lo, plo))
        hi = phi if hi is None else (hi if phi is None else min(hi, phi))
        int_ranges[col] = (lo, hi)

    for frag in frags:
        t = frag.strip()
        m = re.fullmatch(
            rf"(?is)\s*({_IDENT})\s*(=|<=|>=|<|>)\s*(.+?)\s*", t)
        rev = re.fullmatch(
            rf"(?is)\s*(.+?)\s*(=|<=|>=|<|>)\s*({_IDENT})\s*", t)
        col = op = lit_text = None
        if m and re.fullmatch(_IDENT, m.group(1)):
            col, op, lit_text = m.group(1), m.group(2), m.group(3)
        elif rev and re.fullmatch(_IDENT, rev.group(3)):
            flip = {"<": ">", ">": "<", "<=": ">=", ">=": "<=", "=": "="}
            col, op, lit_text = rev.group(3), flip[rev.group(2)], rev.group(1)
        if col is not None and "." not in col:
            try:
                val = _parse_scalar(lit_text)
            except LakehouseSqlError:
                continue
            if op == "=" and val is not None and hintable(col, val):
                prev = point_eq.get(col)
                if prev is None or prev == val:
                    point_eq[col] = val
            if col in int_cols and isinstance(val, int) \
                    and not isinstance(val, bool):
                if op == "=":
                    narrow(col, val, val)
                elif op == "<":
                    narrow(col, None, val - 1)
                elif op == "<=":
                    narrow(col, None, val)
                elif op == ">":
                    narrow(col, val + 1, None)
                elif op == ">=":
                    narrow(col, val, None)
            elif col in str_cols and isinstance(val, str):
                # string stats ranges: strict ops keep the bound
                # inclusive — an over-approximation of the file set,
                # which is the safe direction for pruning
                if op == "=":
                    narrow(col, val, val)
                elif op in ("<", "<="):
                    narrow(col, None, val)
                elif op in (">", ">="):
                    narrow(col, val, None)
            elif (col in dbl_cols and isinstance(val, (int, float))
                  and not isinstance(val, bool)):
                # double stats (encoded-domain manifests): inclusive
                # bounds, strict ops over-approximate like strings;
                # plan_files applies only the NaN-safe prune side
                if op == "=":
                    narrow(col, float(val), float(val))
                elif op in ("<", "<="):
                    narrow(col, None, float(val))
                elif op in (">", ">="):
                    narrow(col, float(val), None)
            continue
        m = re.fullmatch(
            rf"(?is)\s*({_IDENT})\s+BETWEEN\s+(.+?)\s+AND\s+(.+?)\s*", t)
        if m and "." not in m.group(1):
            col = m.group(1)
            try:
                lo, hi = _parse_scalar(m.group(2)), _parse_scalar(m.group(3))
            except LakehouseSqlError:
                continue
            if col in int_cols and isinstance(lo, int) \
                    and isinstance(hi, int):
                narrow(col, lo, hi)
            elif col in str_cols and isinstance(lo, str) \
                    and isinstance(hi, str):
                narrow(col, lo, hi)
            elif (col in dbl_cols
                  and isinstance(lo, (int, float))
                  and isinstance(hi, (int, float))
                  and not isinstance(lo, bool)
                  and not isinstance(hi, bool)):
                narrow(col, float(lo), float(hi))
            continue
        m = re.fullmatch(rf"(?is)\s*({_IDENT})\s+IN\s*\((.*)\)\s*", t)
        if m and "." not in m.group(1):
            inner = m.group(2)
            try:
                vals = [
                    _parse_scalar(inner[a:b]) for a, b in
                    _split_top(_mask(inner), inner, ",", 0, len(inner))
                ]
            except LakehouseSqlError:
                continue
            if vals and all(v is not None and hintable(m.group(1), v)
                            for v in vals):
                point_eq.setdefault(m.group(1), vals)
                ints = [v for v in vals
                        if isinstance(v, int) and not isinstance(v, bool)]
                if m.group(1) in int_cols and len(ints) == len(vals):
                    narrow(m.group(1), min(ints), max(ints))
                strs = [v for v in vals if isinstance(v, str)]
                if m.group(1) in str_cols and len(strs) == len(vals):
                    narrow(m.group(1), min(strs), max(strs))
    return int_ranges, point_eq


# --------------------------------------------------------------------------
# statement handlers
# --------------------------------------------------------------------------

def _stmt_insert(spark, sql, masked, catalog, tables, txn=None):
    m = re.match(
        rf"(?is)\s*INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?({_IDENT})\s*",
        masked)
    if not m:
        raise LakehouseSqlError("expected INSERT INTO|OVERWRITE <table> ...")
    overwrite = m.group(1).upper() == "OVERWRITE"
    if txn is not None and overwrite:
        raise LakehouseSqlError(
            "INSERT OVERWRITE is not transactional — only INSERT INTO "
            "appends can be staged inside BEGIN TRANSACTION")
    name = m.group(2)
    if txn is not None:
        # transactional staging goes through the CATALOG (the txn's
        # intent journal records catalog names); a tables= view is a
        # bare location with no catalog identity to journal
        if catalog is None or (tables and name in tables):
            raise LakehouseSqlError(
                f"BEGIN TRANSACTION stages catalog tables only; "
                f"{name!r} is not a catalog table")
        table = catalog.load_table(name)
    else:
        table = _resolve(name, catalog, tables)
    pos = m.end()
    collist = None
    if pos < len(sql) and masked[pos] == "(":
        close = _match_paren(masked, pos)
        inner = sql[pos + 1:close - 1]
        head = re.match(r"\s*(\w+)", _mask(inner))
        if head and head.group(1).upper() not in (
                "SELECT", "WITH", "VALUES", "TABLE"):
            collist = [c.strip() for c in inner.split(",")]
            if not all(re.fullmatch(r"[A-Za-z_]\w*", c) for c in collist):
                raise LakehouseSqlError(f"bad INSERT column list {inner!r}")
            pos = close
    query = sql[pos:].strip()
    if not query:
        raise LakehouseSqlError("INSERT needs a query (SELECT/VALUES/TABLE)")
    _register_reads(spark, catalog, tables, masked)
    df = spark.sql(query)
    tcols = [f.name for f in table.schema().fields]
    if collist is not None:
        if len(df.columns) != len(collist):
            raise LakehouseSqlError(
                f"INSERT column list has {len(collist)} names but the "
                f"query produces {len(df.columns)} columns")
        df = df.toDF(*collist)
        df = df.select(
            *collist,
            *[F.lit(None).alias(c) for c in tcols if c not in collist])
    else:
        if len(df.columns) != len(tcols):
            raise LakehouseSqlError(
                f"query produces {len(df.columns)} columns, table has "
                f"{len(tcols)} — SQL INSERT is positional")
        df = df.toDF(*tcols)  # positional, ANSI INSERT semantics
    if txn is not None:
        txn.stage_append(name, df)
        return {"operation": "insert_staged", "table": name,
                "txn_id": txn.txn_id}
    snap = (table.overwrite_partitions(df) if overwrite
            else table.append(df))
    return {"operation": "insert_overwrite" if overwrite else "insert",
            "snapshot_id": snap.snapshot_id}


def _where_and_options(sql, masked, lo, stmt):
    opts, opt_start = _parse_options(masked, sql)
    w = _kw(masked, r"\bWHERE\b", lo, opt_start)
    if w is None:
        return "true", opts, opt_start
    pred = sql[w.end():opt_start].strip()
    if not pred:
        raise LakehouseSqlError(f"{stmt}: empty WHERE clause")
    return pred, opts, w.start()


def _strip_comments(text: str) -> str:
    """Blank comment spans only (string literals kept) — fragment
    parsers slice the ORIGINAL text, so a comment inside a predicate
    must not reach them. Scans with the same literal rules as _mask."""
    out = list(text)
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c in ("'", '"'):
            j = i + 1
            while j < n:
                if text[j] == "\\" and j + 1 < n:
                    j += 2
                    continue
                if text[j] == c:
                    if j + 1 < n and text[j + 1] == c:
                        j += 2
                        continue
                    break
                j += 1
            i = j + 1
        elif c == "`":
            j = text.find(c, i + 1)
            i = (n if j < 0 else j) + 1
        elif text[i:i + 2] == "--":
            j = text.find("\n", i)
            j = n if j < 0 else j
            for k in range(i, j):
                out[k] = " "
            i = j
        elif text[i:i + 2] == "/*":
            j = text.find("*/", i)
            j = (n - 2) if j < 0 else j
            for k in range(i, min(j + 2, n)):
                out[k] = " "
            i = j + 2
        else:
            i += 1
    return "".join(out)


def _eq_delete_keys(table, pred: str) -> tuple[list[str], list[tuple]]:
    """EXACT key-equality parse for mode='eq' — unlike the pruning
    hints (safe over-approximations), an equality delete must encode
    the predicate precisely: an AND of `col = lit` / `col IN (...)`
    over distinct columns, nothing else, with each literal's type
    agreeing with its column (a silently-cast 2.5 would delete id=2 —
    a row the SQL predicate does NOT match). Returns (cols, key tuples
    = the cross product of the deduplicated per-column value lists)."""
    frags = _conjuncts(_strip_comments(pred))
    if frags is None:
        raise LakehouseSqlError(
            "mode='eq' needs a pure key-equality predicate "
            "(no OR at the top level)")
    fields = {f.name.lower(): f for f in table.schema().fields}
    per_col: dict[str, list] = {}

    def add(col, vals):
        f = fields.get(col.lower())
        if f is None:
            raise LakehouseSqlError(f"unknown column {col!r}")
        col = f.name
        if col in per_col:
            raise LakehouseSqlError(
                f"mode='eq': column {col!r} constrained twice")
        if any(v is None for v in vals):
            raise LakehouseSqlError(
                "mode='eq' cannot delete by NULL key (equality deletes "
                "match values; use a CoW/MOR DELETE for NULL predicates)")
        t = f.dataType.typeName()
        for v in vals:
            ok = (
                (t in _INTEGRAL and isinstance(v, int)
                 and not isinstance(v, bool))
                or (t == "string" and isinstance(v, str))
                or (t in ("float", "double")
                    and isinstance(v, (int, float))
                    and not isinstance(v, bool))
                or (t == "boolean" and isinstance(v, bool))
            )
            if not ok:
                raise LakehouseSqlError(
                    f"mode='eq': literal {v!r} does not match column "
                    f"{col!r} type {t} — an implicit cast could delete "
                    "rows the predicate does not match")
        if t in ("float", "double"):
            # uniform Python type, or createDataFrame refuses to merge
            # LongType/DoubleType rows for a mixed IN (1, 2.5) list
            vals = [float(v) for v in vals]
        seen, dedup = set(), []
        for v in vals:
            if v not in seen:
                seen.add(v)
                dedup.append(v)
        per_col[col] = dedup

    for frag in frags:
        t = frag.strip()
        m = re.fullmatch(rf"(?is)\s*({_IDENT})\s*=\s*(.+?)\s*", t)
        rev = re.fullmatch(rf"(?is)\s*(.+?)\s*=\s*({_IDENT})\s*", t)
        im = re.fullmatch(rf"(?is)\s*({_IDENT})\s+IN\s*\((.*)\)\s*", t)
        try:
            if m and re.fullmatch(_IDENT, m.group(1)) and "." not in m.group(1):
                add(m.group(1), [_parse_scalar(m.group(2))])
            elif rev and "." not in rev.group(2):
                add(rev.group(2), [_parse_scalar(rev.group(1))])
            elif im and "." not in im.group(1):
                inner = im.group(2)
                add(im.group(1), [
                    _parse_scalar(inner[a:b]) for a, b in
                    _split_top(_mask(inner), inner, ",", 0, len(inner))])
            else:
                raise LakehouseSqlError(
                    f"mode='eq': conjunct {t!r} is not col = literal "
                    "or col IN (literals)")
        except LakehouseSqlError as e:
            raise LakehouseSqlError(
                f"mode='eq' needs an exact key-equality predicate: {e}"
            ) from None
    cols = sorted(per_col)
    keys: list[tuple] = [()]
    for c in cols:
        keys = [k + (v,) for k in keys for v in per_col[c]]
        if len(keys) > 100_000:
            raise LakehouseSqlError(
                "mode='eq': key cross-product exceeds 100k tuples")
    return cols, keys


# distinct-key cap for driver-materialized IN (SELECT ...) plans; a
# larger set switches DELETE to the distributed semi-join MERGE plan
# (or errors for shapes MERGE cannot express). Override per statement
# with OPTIONS(subquery_limit=N).
_SUBQUERY_LIMIT = 100_000


def _decorrelate_exists(frag: str, target: str | None):
    """Rewrite one ``[NOT] EXISTS (SELECT ... FROM src [alias] WHERE
    ...)`` conjunct into ``(outer_col, subquery_sql)`` — the classic
    semi-join decorrelation, honored for the bounded shape this
    planner can prove equivalent: a single inner source (no joins /
    comma lists / nested subqueries in FROM) and exactly ONE
    correlation conjunct, an equality between an inner column and a
    target-qualified outer column. Every other inner conjunct must
    reference only the inner relation. Inner NULL keys are filtered
    (an equality correlation never matches NULL), which is exactly
    what makes the NOT EXISTS form differ from NOT IN."""
    body = frag[frag.find("(") + 1:frag.rfind(")")]
    mb = re.match(
        rf"(?is)^\s*SELECT\s+.+?\s+FROM\s+({_IDENT})"
        r"(?:\s+(?:AS\s+)?(?!WHERE\b)([A-Za-z_]\w*))?"
        r"\s*(?:WHERE\s+(.*))?$",
        _mask(body), re.S)
    if not mb:
        raise LakehouseSqlError(
            "EXISTS supports exactly `[NOT] EXISTS (SELECT ... FROM "
            "<one source> [alias] WHERE <correlation> [AND ...])` — "
            "joins or FROM-subqueries need a MERGE whose USING query "
            "does the correlated work")
    src, alias = mb.group(1), mb.group(2)
    if mb.group(3) is None:
        raise LakehouseSqlError(
            "EXISTS needs a WHERE with one correlation equality "
            "(an uncorrelated EXISTS is a constant — test it outside "
            "the DELETE/UPDATE)")
    where = body[mb.start(3):]
    inner_q = {(alias or src).lower(), src.lower()}
    outer_q = set()
    if target:
        outer_q = {target.lower(), target.rsplit(".", 1)[-1].lower()}
    outer_q -= inner_q  # a shadowing alias makes the name inner-side
    conjs = _conjuncts(where)
    if conjs is None:
        raise LakehouseSqlError(
            "the EXISTS body's WHERE must be a pure AND conjunction "
            "(the correlation cannot sit under OR)")

    def qualifier(side: str) -> str | None:
        s = side.strip()
        return s.rsplit(".", 1)[0].lower() if (
            re.fullmatch(_IDENT, s) and "." in s) else None

    corr, rest = None, []
    for c in conjs:
        eq = re.fullmatch(r"(?is)\s*(.+?)\s*=\s*(.+?)\s*", _mask(c))
        sides = ((c[eq.start(1):eq.end(1)], c[eq.start(2):eq.end(2)])
                 if eq else None)
        quals = tuple(qualifier(s) for s in sides) if sides else ()
        hit = None
        for i in (0, 1):
            if sides and quals[i] in outer_q and quals[1 - i] not in outer_q:
                hit = (sides[i].strip().rsplit(".", 1)[-1],
                       sides[1 - i].strip())
        if hit is not None:
            if corr is not None:
                raise LakehouseSqlError(
                    "EXISTS supports exactly one correlation equality "
                    "conjunct (AND the rest inside the subquery)")
            corr = hit
            continue
        if any(q in outer_q for q in quals) or (outer_q and re.search(
                rf"(?is)(?<![\w.])({'|'.join(map(re.escape, outer_q))})"
                r"\s*\.", _mask(c))):
            raise LakehouseSqlError(
                f"EXISTS conjunct {c.strip()!r} references the target "
                "table but is not a correlation equality — only "
                "`inner.col = target.col` correlation is planned")
        rest.append(c)
    if corr is None:
        raise LakehouseSqlError(
            "EXISTS needs one correlation equality conjunct "
            f"qualified by the target table name ({target!r}), e.g. "
            f"`s.key = {target}.key`")
    outer_col, inner_expr = corr
    src_clause = f"{src} {alias}" if alias else src
    sub_sql = f"SELECT {inner_expr} FROM {src_clause}"
    null_guard = f"({inner_expr}) IS NOT NULL"
    sub_sql += " WHERE " + " AND ".join(
        [f"({c.strip()})" for c in rest] + [null_guard])
    return outer_col, sub_sql


def _extract_in_subquery(pred: str, target: str | None = None):
    """Split one top-level ``col [NOT] IN (SELECT ...)`` or
    equality-correlated ``[NOT] EXISTS (SELECT ...)`` conjunct out
    of a DELETE/UPDATE predicate. Returns ``None`` when the predicate
    has no subquery, else ``(col, negated, subquery_sql, residual,
    from_exists)`` where ``residual`` is the AND of the remaining
    conjuncts (or None). EXISTS decorrelates to the IN plan
    (``_decorrelate_exists``); ``from_exists`` marks the NOT EXISTS
    ANSI difference the planner must keep — outer NULLs DO match NOT
    EXISTS, and inner NULL keys never correlate. Raises for shapes the
    planner cannot honor: a subquery under OR, or more than one
    subquery conjunct."""
    masked = _mask(_strip_comments(pred))
    if not re.search(r"(?is)\(\s*(?:SELECT|WITH)\b", masked):
        return None
    pred = _strip_comments(pred)
    frags = _conjuncts(pred)
    if frags is None:
        raise LakehouseSqlError(
            "IN (SELECT ...) / EXISTS (...) must be a top-level AND "
            "conjunct of the DELETE/UPDATE predicate (a subquery "
            "under OR cannot be planned as a semi-join)")
    pat = re.compile(
        rf"(?is)^\s*({_IDENT})\s+(NOT\s+)?IN\s*\(\s*(SELECT|WITH)\b.*\)\s*$")
    epat = re.compile(r"(?is)^\s*(NOT\s+)?EXISTS\s*\(.*\)\s*$")
    hit, residual = None, []
    for frag in frags:
        mfrag = _mask(frag)
        m = pat.match(mfrag)
        em = epat.match(mfrag) if m is None else None
        if m is None and em is None:
            if re.search(r"(?is)\(\s*(?:SELECT|WITH)\b", mfrag):
                raise LakehouseSqlError(
                    f"cannot plan subquery conjunct {frag.strip()!r} — "
                    "supported shapes: `col [NOT] IN (SELECT ...)` or "
                    "`[NOT] EXISTS (SELECT ... FROM s WHERE s.k = "
                    "<target>.k ...)`")
            residual.append(frag)
            continue
        if hit is not None:
            raise LakehouseSqlError(
                "at most one IN (SELECT ...) / EXISTS conjunct per "
                "DELETE/UPDATE (compose several in the subquery itself)")
        if em is not None:
            col, sub_sql = _decorrelate_exists(frag, target)
            hit = (col, bool(em.group(1)), sub_sql, True)
            continue
        col = m.group(1)
        if "." in col:
            col = col.rsplit(".", 1)[-1]
        # subquery text: from the SELECT/WITH keyword to the conjunct's
        # final close paren (positions index the raw frag — _mask is
        # length-preserving)
        hit = (col, bool(m.group(2)), frag[m.start(3):frag.rfind(")")],
               False)
    col, negated, sub_sql, from_exists = hit
    return (col, negated, sub_sql, (" AND ".join(residual) or None),
            from_exists)


def _subquery_keys_df(spark, table, col, sub_sql, catalog, tables):
    """Run the uncorrelated subquery through the front-end and return
    its single-column DataFrame (validated)."""
    if col.lower() not in {f.name.lower() for f in table.schema().fields}:
        raise LakehouseSqlError(f"unknown column {col!r} in IN (SELECT ...)")
    kdf = execute_sql(spark, sub_sql, catalog=catalog, tables=tables)
    if not isinstance(kdf, DataFrame) or len(kdf.columns) != 1:
        raise LakehouseSqlError(
            "IN (SELECT ...) subquery must produce exactly one column")
    return kdf


def _plan_subquery_dml(spark, table, sub, pred, opts, catalog, tables,
                       kind, assignments=None):
    """Plan DELETE/UPDATE with a ``col [NOT] IN (SELECT ...)`` conjunct.

    Small key sets (<= OPTIONS(subquery_limit), default 100k distinct)
    compile to a literal ``isin`` predicate handed to the normal
    chunked row-level engine — keeping every mode (cow/mor/dv), stats
    pruning (the key list doubles as a bloom/point_eq hint), chunked
    commits, and ANSI three-valued semantics (NULL never deletes; a
    NULL in a NOT IN set matches nothing). Beyond the cap, a plain
    ``IN`` DELETE switches to the fully distributed plan the keys-
    unbounded case demands: MERGE INTO target USING (subquery) ON col
    WHEN MATCHED THEN DELETE — a semi-join; no key ever lands on the
    driver (``chunk_files`` does not apply there; MERGE bounds its own
    planning). Over-cap NOT IN / residual-conjunct / UPDATE shapes
    error with the cap to raise, because anti-join MERGE would delete
    NULL-key rows ANSI keeps, and SET expressions of target columns
    are not source-driven.

    ``from_exists`` plans the same way but keeps the EXISTS truth
    table: the decorrelated subquery already filters inner NULL keys
    (no NOT-IN NULL short-circuit applies), a positive EXISTS is
    value-identical to IN, and NOT EXISTS additionally matches
    outer-NULL rows (``col IS NULL OR col NOT IN (keys)``)."""
    col, negated, sub_sql, residual, from_exists = sub
    limit = int(opts.pop("subquery_limit", _SUBQUERY_LIMIT))
    kdf = _subquery_keys_df(spark, table, col, sub_sql, catalog, tables)
    rows = kdf.distinct().limit(limit + 1).collect()
    verb = "deleted" if kind == "delete" else "updated"
    zero = {"operation": kind, f"rows_{verb}": 0, "files_rewritten": 0,
            "files_written": 0, "predicate": pred}
    if len(rows) > limit:
        if kind == "delete" and not negated and residual is None:
            src = (kdf.select(F.col(kdf.columns[0]).alias(col))
                   .na.drop().distinct())
            have = {col}
            src = src.select(
                "*", *[F.lit(None).cast(f.dataType).alias(f.name)
                       for f in table.schema().fields if f.name not in have])
            mo = {k: v for k, v in opts.items()
                  if k in ("mode", "target_file_size", "rebase_retries")}
            out = merge_into(table, spark, src, key=[col],
                             when_matched="delete", when_not_matched=None,
                             extra_summary={"predicate": pred}, **mo)
            out["operation"] = "delete"
            out["planned_as"] = "semi-join-merge"
            return out
        raise LakehouseSqlError(
            f"IN (SELECT ...) returned more than {limit} distinct keys; "
            "raise OPTIONS(subquery_limit=N) or express the operation "
            "as MERGE (only a plain-IN DELETE auto-plans as a "
            "semi-join MERGE beyond the cap)")
    vals = [r[0] for r in rows]
    nn = [v for v in vals if v is not None]
    if from_exists:
        # equality correlation never matches NULL — the decorrelated
        # subquery filters inner NULLs, but keep the invariant local
        vals = nn
    if negated and len(nn) < len(vals):
        # ANSI: `x NOT IN (set containing NULL)` is never TRUE
        return {**zero, "short_circuit": "NOT IN set contains NULL"}
    if not vals:
        # IN () matches nothing; NOT IN () / NOT EXISTS (empty)
        # matches everything
        if not negated:
            return {**zero, "short_circuit": "empty IN subquery"}
        cond = F.lit(True)
    else:
        cond = F.col(col).isin(vals)
        if negated:
            # NOT EXISTS matches outer-NULL rows; NOT IN keeps them
            cond = (F.col(col).isNull() | ~cond) if from_exists else ~cond
    int_ranges, point_eq = ({}, {})
    if residual is not None:
        int_ranges, point_eq = derive_hints(table, residual)
        cond = cond & F.expr(residual)
    if not negated and nn and col not in point_eq:
        # the key list IS a point-equality hint: manifest blooms and
        # value ranges prune candidate files before any data is read
        point_eq = {**point_eq, col: nn}
    fn = delete_where if kind == "delete" else update_where
    kwargs = dict(int_ranges=int_ranges or None,
                  point_eq=point_eq or None, **opts)
    if kind == "update":
        out = fn(table, spark, cond, assignments, **kwargs)
    else:
        out = fn(table, spark, cond, **kwargs)
    out["operation"] = kind
    out["predicate"] = pred
    return out


def _stmt_delete(spark, sql, masked, catalog, tables):
    m = re.match(rf"(?is)\s*DELETE\s+FROM\s+({_IDENT})\s*", masked)
    if not m:
        raise LakehouseSqlError("expected DELETE FROM <table> [WHERE ...]")
    table = _resolve(m.group(1), catalog, tables)
    pred, opts, _ = _where_and_options(sql, masked, m.end(), "DELETE")
    _check_opts(opts, {"mode", "target_file_size", "chunk_files",
                       "rebase_retries", "subquery_limit"}, "DELETE")
    sub = _extract_in_subquery(pred, target=m.group(1))
    if sub is not None and opts.get("mode") != "eq":
        return _plan_subquery_dml(spark, table, sub, pred, opts,
                                  catalog, tables, "delete")
    if opts.get("mode") == "eq":
        if sub is not None:
            # blind-erasure list from a subquery: collect the keys
            # (capped) and flow into the normal eq-delete commit
            # (a decorrelated positive EXISTS is value-identical to IN)
            col, negated, sub_sql, residual, _from_exists = sub
            if negated or residual is not None:
                raise LakehouseSqlError(
                    "mode='eq' supports exactly `col IN (SELECT ...)` "
                    "with no other conjuncts")
            limit = int(opts.pop("subquery_limit", _SUBQUERY_LIMIT))
            kdf = _subquery_keys_df(spark, table, col, sub_sql,
                                    catalog, tables)
            f = next(x for x in table.schema().fields
                     if x.name.lower() == col.lower())
            if kdf.schema.fields[0].dataType != f.dataType:
                raise LakehouseSqlError(
                    f"mode='eq': subquery type "
                    f"{kdf.schema.fields[0].dataType.simpleString()} != "
                    f"column {f.name!r} type {f.dataType.simpleString()} "
                    "— an implicit cast could delete rows the predicate "
                    "does not match (CAST in the subquery)")
            krows = kdf.na.drop().distinct().limit(limit + 1).collect()
            if len(krows) > limit:
                raise LakehouseSqlError(
                    f"mode='eq' subquery returned more than {limit} "
                    "distinct keys; raise OPTIONS(subquery_limit=N)")
            ignored = sorted(set(opts) - {"mode"})
            if ignored:
                raise LakehouseSqlError(
                    f"OPTIONS {ignored} have no effect with mode='eq' "
                    "(no files are rewritten)")
            keys_df = table.conform(
                kdf.na.drop().distinct().select(
                    F.col(kdf.columns[0]).alias(f.name)),
                schema=StructType([f]))
            entries = table.write_equality_delete_files(keys_df, [f.name])
            snap = table.commit_equality_deletes(
                entries, [f.name], summary={"predicate": pred})
            return {"operation": "delete", "mode": "eq",
                    "delete_keys": len(krows), "cols": [f.name],
                    "snapshot": snap.snapshot_id}
        # blind equality delete: O(keys) write, ZERO table read — the
        # GDPR single-key erasure shape (Iceberg v2 equality deletes,
        # sequence-scoped so later re-inserts of the key survive)
        ignored = sorted(set(opts) - {"mode"})
        if ignored:
            raise LakehouseSqlError(
                f"OPTIONS {ignored} have no effect with mode='eq' "
                "(no files are rewritten)")
        cols, keys = _eq_delete_keys(table, pred)
        schema = table.schema()
        sub = StructType([schema[c] for c in cols])
        keys_df = table.conform(
            spark.createDataFrame(keys, schema=cols), schema=sub)
        entries = table.write_equality_delete_files(keys_df, cols)
        snap = table.commit_equality_deletes(
            entries, cols, summary={"predicate": pred})
        return {"operation": "delete", "mode": "eq",
                "delete_keys": len(keys), "cols": cols,
                "snapshot": snap.snapshot_id}
    int_ranges, point_eq = derive_hints(table, pred)
    out = delete_where(table, spark, pred,
                       int_ranges=int_ranges or None,
                       point_eq=point_eq or None, **opts)
    out["operation"] = "delete"
    return out


def _stmt_update(spark, sql, masked, catalog, tables):
    m = re.match(rf"(?is)\s*UPDATE\s+({_IDENT})\s+SET\b", masked)
    if not m:
        raise LakehouseSqlError("expected UPDATE <table> SET ...")
    table = _resolve(m.group(1), catalog, tables)
    pred, opts, set_end = _where_and_options(sql, masked, m.end(), "UPDATE")
    _check_opts(opts, {"mode", "target_file_size", "chunk_files",
                       "rebase_retries", "subquery_limit"}, "UPDATE")
    # UPDATE ... FROM (join update): a depth-0 FROM between SET and
    # WHERE/OPTIONS switches to the merge-backed plan
    for fm_ in re.finditer(r"(?is)\bFROM\b", masked[m.end():set_end]):
        p = m.end() + fm_.start()
        if masked.count("(", 0, p) == masked.count(")", 0, p):
            return _stmt_update_from(
                spark, sql, masked, catalog, tables, table, m.group(1),
                m.end(), p, set_end, pred, opts)
    assignments = {}
    for a, b in _split_top(masked, sql, ",", m.end(), set_end):
        part = sql[a:b]
        am = re.match(r"(?s)\s*([A-Za-z_]\w*)\s*=(.*)", part)
        if not am or not am.group(2).strip():
            raise LakehouseSqlError(f"bad SET assignment {part.strip()!r}")
        if am.group(1) in assignments:
            raise LakehouseSqlError(
                f"column {am.group(1)!r} assigned twice")
        assignments[am.group(1)] = am.group(2).strip()
    sub = _extract_in_subquery(pred, target=m.group(1))
    if sub is not None:
        return _plan_subquery_dml(spark, table, sub, pred, opts,
                                  catalog, tables, "update",
                                  assignments=assignments)
    int_ranges, point_eq = derive_hints(table, pred)
    out = update_where(table, spark, pred, assignments,
                       int_ranges=int_ranges or None,
                       point_eq=point_eq or None, **opts)
    out["operation"] = "update"
    return out


def _stmt_update_from(spark, sql, masked, catalog, tables, table, tname,
                      set_lo, from_pos, set_end, pred, opts):
    """``UPDATE t SET col = <expr over s>, ... FROM <src | (query)>
    [AS s] WHERE t.key = s.key [AND <source-side filter>]...`` — the
    Postgres join-update, planned as the equivalent MERGE: assignment
    expressions are computed INTO the USING query (one column-pruned
    pass over the source), key equalities become the MERGE ON keys,
    and matched rows update only the assigned columns.  Duplicate
    source matches dedupe per key last-writer-wins (merge_into's
    contract); unmatched target rows are untouched, unmatched source
    rows do nothing.

    Assignments and residual filters must be computable from the
    SOURCE alone; a target-referencing assignment or a target-side
    condition needs the full MERGE statement (reference analog:
    arbitrary ad-hoc SQL, /root/reference/dags/Queries_dag.py:54-95).
    """
    bad = sorted(set(opts) & {"chunk_files", "subquery_limit"})
    if bad:
        raise LakehouseSqlError(
            f"OPTIONS {bad} do not apply to UPDATE ... FROM "
            "(it plans as a MERGE, which bounds its own work)")
    if opts.get("mode") == "eq":
        raise LakehouseSqlError("UPDATE ... FROM does not take mode='eq'")
    assignments = {}
    for a, b in _split_top(masked, sql, ",", set_lo, from_pos):
        part = sql[a:b]
        am = re.match(r"(?s)\s*([A-Za-z_]\w*)\s*=(.*)", part)
        if not am or not am.group(2).strip():
            raise LakehouseSqlError(f"bad SET assignment {part.strip()!r}")
        if am.group(1) in assignments:
            raise LakehouseSqlError(f"column {am.group(1)!r} assigned twice")
        assignments[am.group(1)] = am.group(2).strip()
    _register_reads(spark, catalog, tables, masked)
    pos = from_pos + 4
    pos += re.match(r"\s*", masked[pos:]).end()
    default_alias = None
    if pos < len(masked) and masked[pos] == "(":
        close = _match_paren(masked, pos)
        src_rel = f"({sql[pos + 1:close - 1]})"
        pos = close
    else:
        sm = re.match(rf"(?is)({_IDENT})", masked[pos:])
        if not sm:
            raise LakehouseSqlError("UPDATE ... FROM: expected a source "
                                    "table or (query)")
        src_rel = sm.group(1)
        default_alias = sm.group(1).rsplit(".", 1)[-1]
        pos += sm.end()
        try:
            # a lakehouse table (dotted catalog name or tables= key):
            # expose its scan under a temp view the generated query can
            # reference; plain spark views pass through by name
            src_scan = _resolve(src_rel, catalog, tables).scan(spark)
            src_rel = "__lakehouse_update_src"
            src_scan.createOrReplaceTempView(src_rel)
        except (LakehouseSqlError, ValueError):
            pass
    am2 = re.match(r"(?is)\s*AS\s+([A-Za-z_]\w*)", masked[pos:])
    if am2 is None:
        am2 = re.match(r"(?is)\s*([A-Za-z_]\w*)", masked[pos:])
        if am2 is not None and am2.group(1).upper() in ("WHERE", "OPTIONS"):
            am2 = None
    alias = am2.group(1) if am2 else default_alias
    if alias is None:
        raise LakehouseSqlError("UPDATE ... FROM (query) needs an alias")

    if _mask(pred).strip().lower() == "true":
        raise LakehouseSqlError(
            "UPDATE ... FROM needs WHERE t.key = s.key (a key equality)")
    frags = _conjuncts(pred)
    if frags is None:
        raise LakehouseSqlError(
            "UPDATE ... FROM WHERE must be an AND of conjuncts "
            "(top-level OR cannot split into keys + source filters)")
    t_quals = {tname.lower(), tname.rsplit(".", 1)[-1].lower()}
    a_low = alias.lower()
    tcols_schema = {f.name for f in table.schema().fields}

    def _side(x: str):
        x = x.strip()
        if not re.fullmatch(r"[A-Za-z_][\w.]*", x):
            return None, None
        if "." in x:
            q, c = x.rsplit(".", 1)
            q = q.lower()
            if q == a_low:
                return "s", c
            if q in t_quals:
                return "t", c
            return None, None
        if x in tcols_schema:
            return "t", x
        return "s?", x  # unqualified, not a target column

    keys: dict[str, str] = {}
    src_filters: list[str] = []
    for frag in frags:
        fmask = _mask(frag)
        em = re.fullmatch(
            r"(?s)\s*([A-Za-z_][\w.]*)\s*=\s*([A-Za-z_][\w.]*)\s*", frag)
        pair = None
        if em:
            s1, c1 = _side(em.group(1))
            s2, c2 = _side(em.group(2))
            if s1 == "t" and s2 == "s":
                pair = (c1, c2)
            elif s1 == "s" and s2 == "t":
                pair = (c2, c1)
        if pair is not None:
            tcol, scol = pair
            if tcol in keys and keys[tcol] != scol:
                raise LakehouseSqlError(
                    f"target key {tcol!r} equated to two source columns")
            keys[tcol] = scol
            continue
        for q in t_quals:
            if re.search(rf"(?i)\b{re.escape(q)}\s*\.", fmask):
                raise LakehouseSqlError(
                    f"UPDATE ... FROM condition {frag.strip()!r} references "
                    "the target; only key equalities may (target-side "
                    "conditions need a MERGE)")
        src_filters.append(frag)
    if not keys:
        raise LakehouseSqlError(
            "UPDATE ... FROM needs at least one t.col = s.col key "
            "equality in WHERE")
    for col, rhs in assignments.items():
        if col in keys:
            raise LakehouseSqlError(
                f"column {col!r} is a join key and cannot be assigned")
        for q in t_quals:
            if re.search(rf"(?i)\b{re.escape(q)}\s*\.", _mask(rhs)):
                raise LakehouseSqlError(
                    f"assignment to {col!r} references the target; "
                    "UPDATE ... FROM assignments compute from the source "
                    "row only (target-referencing updates need a MERGE "
                    "with a precomputed USING query)")

    sel = [f"{alias}.{scol} AS {tcol}" for tcol, scol in keys.items()]
    sel += [f"({rhs}) AS {col}" for col, rhs in assignments.items()]
    q = f"SELECT {', '.join(sel)} FROM {src_rel} AS {alias}"
    if src_filters:
        q += " WHERE " + " AND ".join(f"({f})" for f in src_filters)
    source = spark.sql(q)
    # merge conforms the source to the full schema; fill the columns
    # the update never reads with typed NULLs (update_cols scopes the
    # actual writes, and there is no insert clause to land them)
    have = set(source.columns)
    source = source.select(
        "*", *[F.lit(None).cast(f.dataType).alias(f.name)
               for f in table.schema().fields if f.name not in have])
    out = merge_into(table, spark, source, key=list(keys),
                     when_matched="update", update_cols=list(assignments),
                     when_not_matched=None, **opts)
    out["operation"] = "update"
    return out


def _strip_alias(side: str) -> str:
    s = side.strip()
    if not re.fullmatch(_IDENT, s):
        raise LakehouseSqlError(
            f"MERGE ON must be equality of columns, got {s!r}")
    return s.rsplit(".", 1)[-1]


def _merge_alias(masked: str, pos: int) -> tuple[str | None, int]:
    m = re.match(r"(?is)\s*AS\s+([A-Za-z_]\w*)", masked[pos:])
    if m:
        return m.group(1), pos + m.end()
    m = re.match(r"(?is)\s*([A-Za-z_]\w*)", masked[pos:])
    if m and m.group(1).upper() not in ("USING", "ON", "WHEN", "OPTIONS"):
        return m.group(1), pos + m.end()
    return None, pos


def _stmt_merge(spark, sql, masked, catalog, tables):
    m = re.match(rf"(?is)\s*MERGE\s+INTO\s+({_IDENT})", masked)
    if not m:
        raise LakehouseSqlError("expected MERGE INTO <table> USING ...")
    table = _resolve(m.group(1), catalog, tables)
    _t_alias, pos = _merge_alias(masked, m.end())
    um = re.match(r"(?is)\s*USING\s*", masked[pos:])
    if not um:
        raise LakehouseSqlError("MERGE: expected USING after the target")
    pos += um.end()
    _register_reads(spark, catalog, tables, masked)
    if pos < len(masked) and masked[pos] == "(":
        close = _match_paren(masked, pos)
        source = spark.sql(sql[pos + 1:close - 1])
        pos = close
    else:
        sm = re.match(rf"(?is)({_IDENT})", masked[pos:])
        if not sm:
            raise LakehouseSqlError("MERGE: expected a source after USING")
        name = sm.group(1)
        pos += sm.end()
        try:
            source = _resolve(name, catalog, tables).scan(spark)
        except (LakehouseSqlError, ValueError):
            source = spark.table(name)
    _s_alias, pos = _merge_alias(masked, pos)
    om = re.match(r"(?is)\s*ON\b", masked[pos:])
    if not om:
        raise LakehouseSqlError("MERGE: expected ON <key equality>")
    on_lo = pos + om.end()
    opts, opt_start = _parse_options(masked, sql)
    first_when = _kw(masked, r"\bWHEN\b", on_lo, opt_start)
    on_hi = first_when.start() if first_when else opt_start
    keys = []
    frags = _conjuncts(sql[on_lo:on_hi])
    if frags is None:
        raise LakehouseSqlError("MERGE ON must be an AND of key equalities")
    for frag in frags:
        fm = re.fullmatch(r"(?s)\s*(.+?)\s*=\s*(.+?)\s*", frag)
        if not fm:
            raise LakehouseSqlError(f"MERGE ON conjunct {frag.strip()!r} "
                                    "is not an equality")
        a, b = _strip_alias(fm.group(1)), _strip_alias(fm.group(2))
        if a != b:
            raise LakehouseSqlError(
                f"MERGE keys must be the same column on both sides "
                f"(got {a!r} = {b!r}); alias the source query column")
        keys.append(a)

    when_matched = None
    when_not_matched = None
    by_source = None
    bs_assign = None
    update_cols = None
    clause_text = sql[on_hi:opt_start]
    clause_masked = masked[on_hi:opt_start]
    delete_cond = None
    whens = [w.start() for w in re.finditer(r"(?is)\bWHEN\b", clause_masked)
             if (clause_masked.count("(", 0, w.start())
                 - clause_masked.count(")", 0, w.start())) == 0]
    whens.append(len(clause_text))
    def once(current, kind):
        # SQL MERGE rejects duplicate unconditional clauses of one kind
        # — silent last-one-wins would invert UPDATE into DELETE
        if current is not None:
            raise LakehouseSqlError(
                f"duplicate WHEN {kind} clause")

    for i in range(len(whens) - 1):
        c = clause_text[whens[i]:whens[i + 1]]
        cm = clause_masked[whens[i]:whens[i + 1]]
        dm = re.match(r"(?is)\s*WHEN\s+MATCHED\s+AND\s", cm)
        dt = re.search(r"(?is)\sTHEN\s+DELETE\s*$", cm) if dm else None
        if dm and dt and dt.start() > dm.end():
            # the one supported conditional clause — the CDC apply
            # (engine: merge_into's source_delete_condition). The
            # condition is source-side only; spans come from masked
            # keyword positions, the text from the raw SQL (string
            # literals are blanked in the masked form).
            once(delete_cond, "MATCHED AND ... DELETE")
            cond = c[dm.end():dt.start()].strip()
            if _t_alias and re.search(
                    rf"\b{re.escape(_t_alias)}\.", cm[dm.end():dt.start()]):
                raise LakehouseSqlError(
                    "WHEN MATCHED AND ... THEN DELETE takes a SOURCE-side "
                    f"condition; {_t_alias!r} references the target")
            if _s_alias:
                cond = re.sub(rf"\b{re.escape(_s_alias)}\.", "", cond)
            delete_cond = cond
        elif re.match(r"(?is)\s*WHEN\s+MATCHED\s+THEN\s+DELETE\s*$", cm):
            once(when_matched, "MATCHED")
            when_matched = "delete"
        elif re.match(r"(?is)\s*WHEN\s+NOT\s+MATCHED\s+BY\s+SOURCE\s+THEN"
                      r"\s+DELETE\s*$", cm):
            once(by_source, "NOT MATCHED BY SOURCE")
            by_source = "delete"
        elif (bs := re.match(r"(?is)\s*WHEN\s+NOT\s+MATCHED\s+BY\s+SOURCE"
                             r"\s+THEN\s+UPDATE\s+SET\b", cm)):
            # Delta's third by-source action (mark-stale): assignments
            # are expressions over the TARGET row — source references
            # are meaningless (there is no source row) and rejected
            once(by_source, "NOT MATCHED BY SOURCE")
            by_source = "update"
            body = c[bs.end():].strip()
            bmm = _mask(body)
            bs_assign = {}
            for a, b in _split_top(bmm, body, ",", 0, len(body)):
                part = body[a:b]
                pm = re.fullmatch(r"(?s)\s*([A-Za-z_][\w.]*)\s*=\s*(.+?)\s*",
                                  part)
                if not pm:
                    raise LakehouseSqlError(
                        f"bad BY SOURCE UPDATE SET entry {part.strip()!r}")
                lhs = pm.group(1)
                if "." in lhs:
                    q, lhs = lhs.rsplit(".", 1)
                    if _t_alias and q != _t_alias:
                        raise LakehouseSqlError(
                            f"BY SOURCE UPDATE SET assigns target columns"
                            f" (got qualifier {q!r})")
                rhs = pm.group(2)
                if _s_alias and re.search(rf"\b{re.escape(_s_alias)}\.",
                                          _mask(rhs)):
                    raise LakehouseSqlError(
                        "BY SOURCE UPDATE SET expressions cannot reference "
                        f"the source ({_s_alias!r}): by-source rows have "
                        "no matching source row")
                if _t_alias:
                    rhs = re.sub(rf"\b{re.escape(_t_alias)}\.", "", rhs)
                if lhs in bs_assign:
                    raise LakehouseSqlError(
                        f"column {lhs!r} assigned twice in BY SOURCE "
                        "UPDATE SET")
                bs_assign[lhs] = rhs.strip()
        elif re.match(r"(?is)\s*WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s*"
                      r"\*\s*$", cm):
            once(when_not_matched, "NOT MATCHED")
            when_not_matched = "insert"
        else:
            um2 = re.match(r"(?is)\s*WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\b",
                           cm)
            if um2:
                once(when_matched, "MATCHED")
                when_matched = "update"
                body = c[um2.end():].strip()
                if body == "*":
                    update_cols = None
                    continue
                update_cols = []
                bm = _mask(body)
                for a, b in _split_top(bm, body, ",", 0, len(body)):
                    part = body[a:b]
                    pm = re.fullmatch(r"(?s)\s*(.+?)\s*=\s*(.+?)\s*", part)
                    if not pm:
                        raise LakehouseSqlError(
                            f"bad UPDATE SET entry {part.strip()!r}")
                    lhs, rhs = (_strip_alias(pm.group(1)),
                                _strip_alias(pm.group(2)))
                    if lhs != rhs:
                        raise LakehouseSqlError(
                            f"MERGE updates take the source row's value: "
                            f"{lhs!r} = {rhs!r} is not the identity form "
                            f"t.{lhs} = s.{lhs}; compute the expression in "
                            "the USING query")
                    update_cols.append(lhs)
                continue
            if cm.strip():
                raise LakehouseSqlError(
                    f"unsupported MERGE clause: {c.strip()!r} (the only "
                    "conditional clause is WHEN MATCHED AND <source cond> "
                    "THEN DELETE; otherwise filter the USING query)")
    if when_matched is None and when_not_matched is None \
            and by_source is None and delete_cond is None:
        raise LakehouseSqlError("MERGE needs at least one WHEN clause")
    if delete_cond is not None and when_matched != "update":
        raise LakehouseSqlError(
            "WHEN MATCHED AND ... THEN DELETE needs a WHEN MATCHED THEN "
            "UPDATE SET * clause alongside (the CDC apply shape)")
    _check_opts(opts, {"mode", "evolve_schema", "target_file_size",
                       "rebase_retries"}, "MERGE")
    if when_matched in (None, "delete") and when_not_matched is None:
        # delete-shaped merge (matched-delete and/or by-source-delete):
        # the engine conforms the source to the full schema but only
        # the keys matter — fill the rest with NULLs so
        # `USING (SELECT <key>) s` works, the natural delete-list shape
        have = set(source.columns)
        missing = [f for f in table.schema().fields if f.name not in have]
        source = source.select(
            "*", *[F.lit(None).cast(f.dataType).alias(f.name)
                   for f in missing])
    out = merge_into(
        table, spark, source, key=keys,
        when_matched=when_matched, update_cols=update_cols,
        when_not_matched=when_not_matched,
        when_not_matched_by_source=by_source,
        by_source_assignments=bs_assign,
        source_delete_condition=delete_cond, **opts)
    out["operation"] = "merge"
    return out


def _parse_mv_body(sql: str, masked: str, lo: int):
    """Parse the CREATE MATERIALIZED VIEW body — one
    ``SELECT <items> FROM <fact> [[LEFT] JOIN <dim> ON <a> = <b>]...
    [WHERE <pred>] GROUP BY <keys>`` block, the shapes incremental
    refresh is defined for (operators/matview.py: single-source and
    star-join). Returns (source, where, group_by, aggs, joins)."""
    hi = len(sql)
    sm = _kw(masked, r"\bSELECT\b", lo, hi)
    fm = _kw(masked, r"\bFROM\b", lo, hi)
    gm = _kw(masked, r"\bGROUP\s+BY\b", lo, hi)
    if not (sm and fm and gm) or sql[lo:sm.start()].strip():
        raise LakehouseSqlError(
            "CREATE MATERIALIZED VIEW body must be a single "
            "SELECT ... FROM <table> [WHERE ...] GROUP BY ... block")
    for pat, label in ((r"\bHAVING\b", "HAVING"),
                       (r"\bORDER\s+BY\b", "ORDER BY"),
                       (r"\bLIMIT\b", "LIMIT"),
                       (r"\b(?:RIGHT|FULL|CROSS)\s+(?:OUTER\s+)?JOIN\b",
                        "RIGHT/FULL/CROSS JOIN"),
                       (r"\bUNION\b", "UNION"),
                       (r"\bDISTINCT\b", "DISTINCT")):
        if _kw(masked, pat, lo, hi):
            raise LakehouseSqlError(
                f"{label} is not supported in a materialized view "
                "definition — define a plain VIEW over the MV for "
                "presentation logic")
    wm = _kw(masked, r"\bWHERE\b", fm.end(), gm.start())
    from_end = wm.start() if wm else gm.start()
    fseg = sql[fm.end():from_end]
    srcm = re.match(rf"(?is)\s*({_IDENT})\s*", fseg)
    if not srcm:
        raise LakehouseSqlError(
            f"materialized view FROM must start with ONE catalog "
            f"table, got {fseg.strip()!r}")
    source = srcm.group(1)
    joins = []
    jpat = re.compile(
        rf"(?is)(LEFT(?:\s+OUTER)?\s+|INNER\s+)?JOIN\s+({_IDENT})\s+"
        rf"ON\s+([A-Za-z_]\w*)\s*=\s*([A-Za-z_]\w*)\s*")
    pos = srcm.end()
    while pos < len(fseg):
        jm = jpat.match(fseg, pos)
        if not jm:
            raise LakehouseSqlError(
                "materialized view FROM clause must be <fact> "
                "([INNER|LEFT] JOIN <dim> ON <col> = <col>)* — "
                f"cannot parse at {fseg[pos:].strip()!r} (ON sides "
                "are bare column names; the engine resolves which "
                "side is the fact's)")
        how = "left" if (jm.group(1) or "").strip().lower().startswith(
            "left") else "inner"
        joins.append({"table": jm.group(2),
                      "on": [jm.group(3), jm.group(4)], "how": how})
        pos = jm.end()
    where = sql[wm.end():gm.start()].strip() if wm else None

    def norm(s: str) -> str:
        return re.sub(r"\s+", " ", s.strip()).lower()

    keys = [sql[a:b].strip()
            for a, b in _split_top(masked, sql, ",", gm.end(), hi)]
    if any(not k or k.isdigit() for k in keys):
        raise LakehouseSqlError(
            "GROUP BY needs column/expression keys (positional "
            "references are not supported)")
    key_norms = {norm(k) for k in keys}
    group_by: dict[str, str] = {}
    aggs: dict[str, str] = {}
    for a, b in _split_top(masked, sql, ",", sm.end(), fm.start()):
        item = sql[a:b].strip()
        am = re.fullmatch(r"(?is)(.*\S)\s+AS\s+([A-Za-z_]\w*)\s*",
                          masked[a:b])
        if am:
            expr = sql[a + am.start(1):a + am.end(1)].strip()
            alias = am.group(2)
        else:
            if not re.fullmatch(r"[A-Za-z_]\w*", item):
                raise LakehouseSqlError(
                    f"materialized view select item {item!r} needs an "
                    "AS alias (only plain columns may omit it)")
            expr = alias = item
        if norm(expr) in key_norms or norm(alias) in key_norms:
            group_by[alias] = expr
        else:
            aggs[alias] = expr
    covered = {norm(e) for e in group_by.values()} | {
        norm(a) for a in group_by}
    missing = [k for k in keys if norm(k) not in covered]
    if missing:
        raise LakehouseSqlError(
            f"every GROUP BY key must appear in the select list "
            f"(missing: {missing})")
    return source, where, group_by, aggs, joins


def _stmt_refresh(spark, sql, masked, catalog, tables):
    m = re.fullmatch(
        rf"(?is)\s*REFRESH\s+MATERIALIZED\s+VIEW\s+({_IDENT})"
        r"(?:\s+(FULL|INCREMENTAL))?\s*", masked)
    if not m:
        raise LakehouseSqlError(
            "expected REFRESH MATERIALIZED VIEW <name> "
            "[FULL|INCREMENTAL]")
    if catalog is None:
        raise LakehouseSqlError("REFRESH MATERIALIZED VIEW needs a catalog")
    from .operators.matview import refresh_materialized_view

    return refresh_materialized_view(
        spark, catalog, m.group(1),
        mode=(m.group(2) or "auto").lower())


def _stmt_create(spark, sql, masked, catalog, tables):
    mv = re.match(
        rf"(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?MATERIALIZED\s+VIEW\s+"
        rf"({_IDENT})\s+AS\b", masked)
    if mv:
        if catalog is None:
            raise LakehouseSqlError(
                "CREATE MATERIALIZED VIEW needs a catalog")
        from .operators.matview import create_materialized_view

        source, where, group_by, aggs, joins = _parse_mv_body(
            sql, masked, mv.end())
        return create_materialized_view(
            spark, catalog, mv.group(2), source, group_by=group_by,
            aggs=aggs, where=where, joins=joins,
            replace=bool(mv.group(1)))
    vm = re.match(
        rf"(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+({_IDENT})\s+AS\b",
        masked)
    if vm:
        if catalog is None:
            raise LakehouseSqlError("CREATE VIEW needs a catalog")
        name, body = vm.group(2), sql[vm.end():].strip()
        if not body:
            raise LakehouseSqlError("CREATE VIEW needs a body query")
        # the body must ANALYZE against current catalog state before
        # it is stored — a typo'd column fails at definition time,
        # like every SQL engine's CREATE VIEW
        _register_reads(spark, catalog, tables, _mask(body))
        try:
            spark.sql(body).schema
        except Exception as e:
            raise LakehouseSqlError(
                f"CREATE VIEW body does not analyze: {e}") from None
        catalog.create_view(name, body, replace=bool(vm.group(1)))
        return {"operation": "create_view", "view": name}
    m = re.match(
        rf"(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+"
        rf"(IF\s+NOT\s+EXISTS\s+)?({_IDENT})\s*",
        masked)
    if not m:
        raise LakehouseSqlError("expected CREATE [OR REPLACE] TABLE "
                                "[IF NOT EXISTS] <table> ... or CREATE "
                                "[OR REPLACE] VIEW <view> AS <query>")
    if catalog is None:
        raise LakehouseSqlError("CREATE TABLE needs a catalog")
    or_replace = bool(m.group(1))
    if or_replace and m.group(2):
        raise LakehouseSqlError(
            "OR REPLACE and IF NOT EXISTS are mutually exclusive")
    name, pos = m.group(3), m.end()
    schema = None
    if pos < len(masked) and masked[pos] == "(":
        close = _match_paren(masked, pos)
        inner = sql[pos + 1:close - 1]
        head = re.match(r"\s*(\w+)", _mask(inner))
        if head and head.group(1).upper() not in (
                "SELECT", "WITH", "VALUES", "TABLE"):
            from pyspark.sql.types import _parse_datatype_string

            try:
                schema = _parse_datatype_string(inner)
            except Exception as e:
                raise LakehouseSqlError(
                    f"bad CREATE TABLE column list: {e}") from None
            pos = close + (len(masked[close:])
                           - len(masked[close:].lstrip()))
    partition_col = None
    pm = re.match(r"(?is)PARTITIONED\s+BY\s*\(", masked[pos:])
    if pm:
        close = _match_paren(masked, pos + pm.end() - 1)
        partition_col = sql[pos + pm.end():close - 1].strip()
        if not re.fullmatch(r"[A-Za-z_]\w*", partition_col):
            raise LakehouseSqlError(
                f"PARTITIONED BY takes one plain column, got "
                f"{partition_col!r}; pass partition_transform via OPTIONS")
        pos = close
    # OPTIONS here sits between the head and AS, not at the tail
    opts: dict = {}
    om = re.match(r"(?is)\s*OPTIONS\s*\(", masked[pos:])
    if om:
        close = _match_paren(masked, pos + om.end() - 1)
        # dotted/dashed keys are table properties; bare keys are knobs
        opts = _parse_kv_pairs(
            masked, sql, pos + om.end(), close - 1, "OPTIONS",
            key_re=r"[\w.-]+")
        pos = close
    am = re.match(r"(?is)\s*AS\b", masked[pos:])
    if not am and schema is None:
        raise LakehouseSqlError(
            "CREATE TABLE requires (col type, ...) or AS <query>")
    if am and schema is not None:
        raise LakehouseSqlError(
            "CREATE TABLE takes a column list OR AS <query>, not both")
    # validate the statement BEFORE the exists short-circuit — whether
    # a malformed statement errors must not depend on catalog state
    _check_opts(opts, {"n_files", "partition_transform"} | {
        k for k in opts if "." in k}, "CREATE TABLE")
    if schema is not None and masked[pos:].strip():
        raise LakehouseSqlError(
            f"trailing text after CREATE TABLE: "
            f"{sql[pos:].strip()[:60]!r}")
    if m.group(2) and catalog.table_exists(name):
        return {"operation": "create_table", "table": name, "skipped": True}
    props = {k: str(v) for k, v in opts.items() if "." in k}
    if or_replace and catalog.table_exists(name):
        # replace-in-place (the reference's per-run CREATE OR REPLACE
        # gold rebuild): ONE metadata-only replace commit, snapshot
        # history preserved — never drop+create, which would erase
        # time travel. Schema/layout stay declared: conform casts the
        # query result, a different shape needs explicit DROP TABLE.
        if schema is not None:
            raise LakehouseSqlError(
                "CREATE OR REPLACE TABLE of an existing table takes "
                "AS <query> (content replace); to change the column "
                "list, DROP TABLE first")
        t = catalog.load_table(name)
        if partition_col and partition_col != t._partition_col():
            raise LakehouseSqlError(
                f"OR REPLACE cannot change PARTITIONED BY (table has "
                f"{t._partition_col()!r}); DROP TABLE first")
        query = sql[pos + am.end():].strip()
        _register_reads(spark, catalog, tables, masked)
        df = spark.sql(query)
        try:
            df = t.conform(df)  # column-set/type check, fails fast
        except Exception as e:
            raise LakehouseSqlError(
                f"OR REPLACE content does not conform to the table "
                f"schema: {e}") from None
        snap = t.overwrite(df, n_files=opts.get("n_files"))
        if props:
            t.update_properties(props)
        return {"operation": "replace_table", "table": name,
                "snapshot_id": snap.snapshot_id, "rows":
                snap.summary["added-records"]}
    if schema is not None:
        t = catalog.create_table(
            name, schema, partition_col=partition_col,
            partition_transform=opts.get("partition_transform"),
            properties=props or None)
        return {"operation": "create_table", "table": name,
                "location": t.location}
    query = sql[pos + am.end():].strip()
    _register_reads(spark, catalog, tables, masked)
    df = spark.sql(query)
    t = catalog.create_table_as(
        name, df, n_files=opts.get("n_files"),
        partition_col=partition_col,
        partition_transform=opts.get("partition_transform"),
        properties=props or None)
    return {"operation": "create_table", "table": name,
            "location": t.location}


def _stmt_drop(spark, sql, masked, catalog, tables):
    mv = re.fullmatch(
        rf"(?is)\s*DROP\s+MATERIALIZED\s+VIEW\s+(IF\s+EXISTS\s+)?"
        rf"({_IDENT})\s*", masked)
    if mv:
        if catalog is None:
            raise LakehouseSqlError("DROP MATERIALIZED VIEW needs a catalog")
        from .operators.matview import PROP_SOURCE

        name = mv.group(2)
        if not catalog.table_exists(name):
            if mv.group(1):
                return {"operation": "drop_materialized_view",
                        "view": name, "skipped": True}
            raise LakehouseSqlError(f"no materialized view {name!r}")
        if PROP_SOURCE not in catalog.load_table(name).properties():
            raise LakehouseSqlError(
                f"{name!r} is a plain table, not a materialized view — "
                "use DROP TABLE")
        catalog.drop_table(name, purge=True)
        return {"operation": "drop_materialized_view", "view": name}
    vm = re.fullmatch(
        rf"(?is)\s*DROP\s+VIEW\s+(IF\s+EXISTS\s+)?({_IDENT})\s*", masked)
    if vm:
        if catalog is None:
            raise LakehouseSqlError("DROP VIEW needs a catalog")
        name = vm.group(2)
        if vm.group(1) and not catalog.view_exists(name):
            return {"operation": "drop_view", "view": name, "skipped": True}
        catalog.drop_view(name)
        return {"operation": "drop_view", "view": name}
    m = re.fullmatch(
        rf"(?is)\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?({_IDENT})"
        r"\s*(PURGE)?\s*", masked)
    if not m:
        raise LakehouseSqlError("expected DROP TABLE [IF EXISTS] <table> "
                                "[PURGE] or DROP VIEW [IF EXISTS] <view>")
    if catalog is None:
        raise LakehouseSqlError("DROP TABLE needs a catalog")
    name = m.group(2)
    if m.group(1) and not catalog.table_exists(name):
        return {"operation": "drop_table", "table": name, "skipped": True}
    catalog.drop_table(name, purge=bool(m.group(3)))
    return {"operation": "drop_table", "table": name}


def _stmt_truncate(spark, sql, masked, catalog, tables):
    m = re.fullmatch(rf"(?is)\s*TRUNCATE\s+TABLE\s+({_IDENT})\s*", masked)
    if not m:
        raise LakehouseSqlError("expected TRUNCATE TABLE <table>")
    table = _resolve(m.group(1), catalog, tables)
    out = truncate(table, spark)
    out["operation"] = "truncate"
    return out


def _optimize_scope(spark, table, pred: str) -> set[str]:
    """Resolve an ``OPTIMIZE ... WHERE`` predicate to the partition set
    whose files can match (Delta's partition-scoped OPTIMIZE, widened
    to any stats-derivable conjunction): derive file-skipping hints
    from the predicate, prune the manifest DataFrame, and collect the
    DISTINCT partition ids — a metadata-sized driver list bounded by
    the partition count, never the file count. Maintenance then
    rewrites only those partitions; whole-partition rewrites preserve
    rows, so scoping is always semantics-safe."""
    int_ranges, point_eq = derive_hints(table, pred)
    if not int_ranges and not point_eq:
        raise LakehouseSqlError(
            f"OPTIMIZE WHERE predicate {pred!r} has no derivable "
            "column range/equality — scope by partition/stat columns")
    return {
        r["partition_id"]
        for r in table.plan_files(
            spark, int_ranges=int_ranges or None, point_eq=point_eq or None
        ).select("partition_id").distinct().collect()
    }


def _stmt_optimize(spark, sql, masked, catalog, tables):
    m = re.match(rf"(?is)\s*OPTIMIZE\s+({_IDENT})\s*", masked)
    if not m:
        raise LakehouseSqlError("expected OPTIMIZE <table> [ZORDER BY (...)]")
    table = _resolve(m.group(1), catalog, tables)
    opts, opt_start = _parse_options(masked, sql)
    only_partitions = None
    wm = re.search(r"(?is)\bWHERE\b", masked[:opt_start])
    if wm:
        pred = sql[wm.end():opt_start].strip()
        if not pred:
            raise LakehouseSqlError("empty OPTIMIZE WHERE predicate")
        only_partitions = _optimize_scope(spark, table, pred)
        if not only_partitions:
            return {"operation": "optimize_noop", "files_in": 0,
                    "files_out": 0, "partitions": []}
        opt_start = wm.start()
    zm = re.match(r"(?is)ZORDER\s+BY\s*\(", masked[m.end():opt_start])
    if zm:
        close = _match_paren(masked, m.end() + zm.end() - 1)
        if masked[close:opt_start].strip():
            raise LakehouseSqlError(
                f"trailing text after ZORDER BY (...): "
                f"{sql[close:opt_start].strip()!r}")
        cols = tuple(
            c.strip() for c in sql[m.end() + zm.end():close - 1].split(","))
        if not all(re.fullmatch(r"[A-Za-z_]\w*", c) for c in cols):
            raise LakehouseSqlError(f"bad ZORDER BY column list {cols!r}")
        _check_opts(opts, {"curve", "target_file_size", "n_chunks",
                           "recompress_level"}, "OPTIMIZE ZORDER")
        curve = opts.pop("curve", "zorder")
        out = cluster(table, spark, curve=curve, cols=cols,
                      only_partitions=only_partitions, **opts)
        out["operation"] = "optimize_cluster"
        if only_partitions is not None:
            out["partitions"] = sorted(only_partitions)
        return out
    if masked[m.end():opt_start].strip():
        raise LakehouseSqlError(
            f"unsupported OPTIMIZE clause "
            f"{sql[m.end():opt_start].strip()!r}")
    _check_opts(opts, {"target_file_size", "n_chunks", "sort_col",
                       "key_col", "recompress_level"}, "OPTIMIZE")
    out = compact(table, spark, only_partitions=only_partitions, **opts)
    out["operation"] = "optimize_compact"
    if only_partitions is not None:
        out["partitions"] = sorted(only_partitions)
    return out


def _stmt_vacuum(spark, sql, masked, catalog, tables):
    m = re.fullmatch(
        rf"(?is)\s*VACUUM\s+({_IDENT})"
        r"(?:\s+RETAIN\s+(\d+)\s+HOURS)?(\s+DRY\s+RUN)?\s*", masked)
    if not m:
        raise LakehouseSqlError(
            "expected VACUUM <table> [RETAIN n HOURS] [DRY RUN]")
    table = _resolve(m.group(1), catalog, tables)
    grace = float(m.group(2)) * 3600.0 if m.group(2) else 3 * 86400.0
    out = table.remove_orphan_files(older_than_s=grace, spark=spark,
                                    dry_run=bool(m.group(3)))
    out["operation"] = "vacuum"
    return out


def _stmt_alter(spark, sql, masked, catalog, tables):
    m = re.match(rf"(?is)\s*ALTER\s+TABLE\s+({_IDENT})\s+", masked)
    if not m:
        raise LakehouseSqlError("expected ALTER TABLE <table> ...")
    table = _resolve(m.group(1), catalog, tables)
    rest, mrest = sql[m.end():], masked[m.end():]
    pm = re.match(r"(?is)SET\s+TBLPROPERTIES\s*\(", mrest)
    if pm:
        close = _match_paren(mrest, pm.end() - 1)
        if mrest[close:].strip():
            raise LakehouseSqlError("trailing text after TBLPROPERTIES")
        kv = _parse_kv_pairs(mrest, rest, pm.end(), close - 1,
                             "TBLPROPERTIES", string_keys=True)
        updates = {k: (None if v is None else str(v)) for k, v in kv.items()}
        v = table.update_properties(updates)
        return {"operation": "set_tblproperties", "version": v}
    am = re.match(r"(?is)ADD\s+COLUMNS?\s*\(", mrest)
    if am:
        close = _match_paren(mrest, am.end() - 1)
        if mrest[close:].strip():
            raise LakehouseSqlError("trailing text after ADD COLUMNS (...)")
        cols = {}
        for a, b in _split_top(mrest, rest, ",", am.end(), close - 1):
            cm = re.fullmatch(r"(?s)\s*([A-Za-z_]\w*)\s+(.+?)\s*", rest[a:b])
            if not cm:
                raise LakehouseSqlError(
                    f"bad column spec {rest[a:b].strip()!r}")
            cols[cm.group(1)] = cm.group(2)
        v = table.add_columns(cols)
        return {"operation": "add_columns", "version": v}
    dm = re.fullmatch(r"(?is)DROP\s+COLUMN\s+([A-Za-z_]\w*)\s*", mrest)
    if dm:
        v = table.drop_column(dm.group(1))
        return {"operation": "drop_column", "version": v}
    rm = re.fullmatch(
        r"(?is)RENAME\s+COLUMN\s+([A-Za-z_]\w*)\s+TO\s+([A-Za-z_]\w*)\s*",
        mrest)
    if rm:
        v = table.rename_column(rm.group(1), rm.group(2))
        return {"operation": "rename_column", "version": v}
    tm = re.fullmatch(
        r"(?is)ALTER\s+COLUMN\s+([A-Za-z_]\w*)\s+TYPE\s+(.+?)\s*", mrest)
    if tm:
        v = table.widen_column(tm.group(1), rest[tm.start(2):tm.end(2)])
        return {"operation": "widen_column", "version": v}
    am = re.match(
        r"(?is)ADD\s+CONSTRAINT\s+([A-Za-z_]\w*)\s+CHECK\s*\(", mrest)
    if am:
        close = _match_paren(mrest, am.end() - 1)
        if mrest[close:].strip():
            raise LakehouseSqlError("trailing text after CHECK (...)")
        expr = rest[am.end():close - 1].strip()
        if not expr:
            raise LakehouseSqlError("empty CHECK expression")
        try:
            v = table.add_constraint(am.group(1), expr, spark)
        except ValueError as e:
            raise LakehouseSqlError(str(e)) from None
        return {"operation": "add_constraint", "name": am.group(1),
                "version": v}
    dm = re.fullmatch(r"(?is)DROP\s+CONSTRAINT\s+([A-Za-z_]\w*)\s*", mrest)
    if dm:
        try:
            v = table.drop_constraint(dm.group(1))
        except ValueError as e:
            raise LakehouseSqlError(str(e)) from None
        return {"operation": "drop_constraint", "name": dm.group(1),
                "version": v}
    raise LakehouseSqlError(
        f"unsupported ALTER TABLE clause {rest.strip()[:60]!r}")


def _stmt_show(spark, sql, masked, catalog, tables):
    cm = re.fullmatch(rf"(?is)\s*SHOW\s+CREATE\s+TABLE\s+({_IDENT})\s*",
                      masked)
    if cm:
        # reconstructed DDL ROUND-TRIPS: running the emitted statement
        # against a fresh catalog reproduces schema/partitioning/
        # properties (pinned by test_sql)
        name = cm.group(1)
        t = _resolve(name, catalog, tables)
        meta = t.load_metadata()
        cols = ",\n  ".join(f"{f.name} {f.dataType.simpleString()}"
                            for f in t.schema().fields)
        stmt = f"CREATE TABLE {name} (\n  {cols}\n)"
        pcol = meta.get("partition_col")
        if pcol:
            stmt += f"\nPARTITIONED BY ({pcol})"
        opts = {k: v for k, v in sorted(t.properties().items())}
        tr = t.partition_transform(meta)
        if tr != "identity":
            opts = {"partition_transform": tr, **opts}
        if opts:
            kv = ", ".join(f"{k}='{v}'" for k, v in opts.items())
            stmt += f"\nOPTIONS({kv})"
        return spark.createDataFrame([(stmt,)], "createtab_stmt string")
    tm = re.fullmatch(
        r"(?is)\s*SHOW\s+TABLES(?:\s+(?:IN|FROM)\s+([A-Za-z_]\w*))?\s*",
        masked)
    if tm:
        if catalog is None:
            raise LakehouseSqlError("SHOW TABLES needs a catalog")
        rows = [tuple(n.split(".", 1))
                for n in catalog.list_tables(tm.group(1))]
        return spark.createDataFrame(
            rows, "namespace string, tableName string")
    vm = re.fullmatch(
        r"(?is)\s*SHOW\s+VIEWS(?:\s+(?:IN|FROM)\s+([A-Za-z_]\w*))?\s*",
        masked)
    if vm:
        if catalog is None:
            raise LakehouseSqlError("SHOW VIEWS needs a catalog")
        rows = [tuple(n.split(".", 1))
                for n in catalog.list_views(vm.group(1))]
        return spark.createDataFrame(
            rows, "namespace string, viewName string")
    pm = re.fullmatch(rf"(?is)\s*SHOW\s+TBLPROPERTIES\s+({_IDENT})\s*",
                      masked)
    if pm:
        t = _resolve(pm.group(1), catalog, tables)
        props = [(k, str(v)) for k, v in sorted(t.properties().items())]
        return spark.createDataFrame(props, "key string, value string")
    qm = re.fullmatch(rf"(?is)\s*SHOW\s+PARTITIONS\s+({_IDENT})\s*", masked)
    if qm:
        return _resolve(qm.group(1), catalog, tables).partitions_df(spark)
    raise LakehouseSqlError(
        "expected SHOW TABLES [IN ns] | SHOW VIEWS [IN ns] | "
        "SHOW TBLPROPERTIES t | SHOW PARTITIONS t | SHOW CREATE TABLE t")


def _stmt_describe(spark, sql, masked, catalog, tables):
    m = re.fullmatch(
        rf"(?is)\s*DESC(?:RIBE)?\s+(?:TABLE\s+)?(EXTENDED\s+)?({_IDENT})\s*",
        masked)
    if not m:
        raise LakehouseSqlError("expected DESCRIBE [TABLE] [EXTENDED] <t>")
    t = _resolve(m.group(2), catalog, tables)
    meta = t.load_metadata()
    rows = [(f.name, f.dataType.simpleString(), "") for f in
            t.schema().fields]
    pcol = meta.get("partition_col")
    if pcol:
        tf = meta.get("partition_transform")
        rows.append(("# partition", pcol, tf or "identity"))
    if m.group(1):
        cur = t.current_snapshot(meta)
        rows += [("# location", t.location, ""),
                 ("# current-snapshot",
                  str(cur.snapshot_id) if cur else "", "")]
        rows += [(f"# property:{k}", v, "")
                 for k, v in sorted(t.properties(meta).items())]
    return spark.createDataFrame(
        rows, "col_name string, data_type string, comment string")


def _call_scan_report(t, s, **kw):
    from .operators.analyze import scan_report  # lazy (module cycle)

    return scan_report(t, s, **kw)


def _call_changelog_view(t, s, name=None, from_snapshot_id=None,
                         to_snapshot_id=None):
    """Iceberg ``create_changelog_view``: register the row-level
    changelog (table columns + ``_change_type``/``_snapshot_id``,
    streaming/changelog.py contract incl. its content-rewrite
    refusal) as a temp view for ad-hoc CDC SQL. Lazy — the view
    re-reads the PINNED snapshot range on each query, so it stays
    stable while the table advances; re-CALL to follow the head."""
    from .streaming.changelog import changelog_df  # lazy (module cycle)

    df = changelog_df(t, s, from_snapshot_id=from_snapshot_id,
                      to_snapshot_id=to_snapshot_id)
    if name is None:
        base = re.sub(r"\W+", "_", t.location.rstrip("/").rsplit("/", 1)[-1])
        name = f"{base}_changes"
    if not re.fullmatch(r"[A-Za-z_]\w*", name):
        raise LakehouseSqlError(f"bad changelog view name {name!r}")
    df.createOrReplaceTempView(name)
    return {"view": name}


PROCEDURES = {
    "scan_report": _call_scan_report,
    "create_changelog_view": _call_changelog_view,
    "expire_snapshots": lambda t, s, **kw: t.expire_snapshots(spark=s, **kw),
    "remove_orphan_files": lambda t, s, **kw: t.remove_orphan_files(spark=s, **kw),
    "rewrite_manifests": lambda t, s, **kw: {
        "snapshot_id": t.rewrite_manifests(s).snapshot_id},
    "rewrite_position_deletes":
        lambda t, s, **kw: rewrite_position_deletes(t, s, **kw),
    "compact_deletion_vectors":
        lambda t, s, **kw: compact_deletion_vectors(t, s, **kw),
    "compact": lambda t, s, **kw: compact(t, s, **kw),
    "split_oversized": lambda t, s, **kw: split_oversized(t, s, **kw),
    "cluster": lambda t, s, **kw: cluster(
        t, s, **({**kw, "cols": tuple(kw["cols"])} if "cols" in kw else kw)),
    "rollback_to": lambda t, s, **kw: {"version": t.rollback_to(**kw)},
    "create_tag": lambda t, s, **kw: {"version": t.create_tag(**kw)},
    "drop_tag": lambda t, s, **kw: {"version": t.drop_tag(**kw)},
    "create_branch": lambda t, s, **kw: {"version": t.create_branch(**kw)},
    "drop_branch": lambda t, s, **kw: {"version": t.drop_branch(**kw)},
    "fast_forward": lambda t, s, **kw: {"version": t.fast_forward(**kw)},
    "cherrypick_snapshot": lambda t, s, **kw: {
        "snapshot_id": t.cherrypick_snapshot(**kw).snapshot_id},
    "set_ref_retention":
        lambda t, s, **kw: {"version": t.set_ref_retention(**kw)},
    "add_files": lambda t, s, **kw: t.add_files(s, **kw),
    "drop_partitions": lambda t, s, **kw: drop_partitions(t, s, **kw),
    "truncate": lambda t, s, **kw: truncate(t, s, **kw),
    "evolve_partition": lambda t, s, **kw: {
        "version": t.evolve_partition(kw.pop("new_col", None), **kw)},
    "clone": None,  # needs catalog context (destination name/path)
    "analyze": None,  # lazy (operators.analyze)
    "compute_partition_stats": None,  # lazy (operators.analyze)
    "migrate_partitions": None,  # lazy (operators.compaction)
    "run_maintenance": None,  # resolved lazily (import cycle)
}


def _stmt_call(spark, sql, masked, catalog, tables):
    m = re.match(r"(?is)\s*CALL\s+([A-Za-z_]\w*)\s*\(", masked)
    if not m:
        raise LakehouseSqlError("expected CALL <procedure>(...)")
    proc = m.group(1).lower()
    if proc not in PROCEDURES:
        raise LakehouseSqlError(
            f"unknown procedure {proc!r} (available: "
            f"{sorted(PROCEDURES)})")
    close = _match_paren(masked, m.end() - 1)
    if masked[close:].strip():
        raise LakehouseSqlError("trailing text after CALL(...)")
    lo, hi = m.end(), close - 1
    if not sql[lo:hi].strip():
        raise LakehouseSqlError("CALL needs the table name as its first "
                                "argument: CALL proc('ns.table', ...)")
    spans = _split_top(masked, sql, ",", lo, hi)
    first = sql[spans[0][0]:spans[0][1]]
    tname = _parse_scalar(first)
    if not isinstance(tname, str):
        raise LakehouseSqlError(
            "CALL's first argument must be the 'table name' string")
    table = _resolve(tname, catalog, tables)
    kwargs = {}
    for a, b in spans[1:]:
        part = sql[a:b]
        km = re.match(r"(?s)\s*([A-Za-z_]\w*)\s*=>\s*(.+?)\s*$", part)
        if not km:
            raise LakehouseSqlError(
                f"CALL arguments after the table are named: key => value "
                f"(got {part.strip()!r})")
        kwargs[km.group(1)] = _parse_value(km.group(2))
    fn = PROCEDURES[proc]
    if fn is not None:
        out = fn(table, spark, **kwargs)
    elif proc == "clone":
        dstv = kwargs.pop("dst", None)
        if not isinstance(dstv, str) or not dstv:
            raise LakehouseSqlError(
                "CALL clone needs dst => 'ns.table' (or a path)")
        snapid = kwargs.pop("snapshot_id", None)
        if kwargs:
            raise LakehouseSqlError(
                f"unknown clone arguments {sorted(kwargs)}")
        if catalog is not None and "/" not in dstv:
            cloned = catalog.clone_table(spark, tname, dstv,
                                         snapshot_id=snapid)
        else:
            cloned = table.clone_to(spark, dstv, snapshot_id=snapid)
        out = {"location": cloned.location,
               **cloned.current_snapshot().summary}
    elif proc == "analyze":
        from .operators.analyze import analyze_table

        out = analyze_table(table, spark, **kwargs)
    elif proc == "compute_partition_stats":
        from .operators.analyze import compute_partition_stats

        out = compute_partition_stats(table, spark, **kwargs)
    elif proc == "migrate_partitions":
        from .operators.compaction import migrate_partitions

        out = migrate_partitions(table, spark, **kwargs)
    else:  # run_maintenance: lazy import (cycle via plans)
        from .plans.maintenance import run_maintenance
        if "cluster_cols" in kwargs:
            kwargs["cluster_cols"] = tuple(kwargs["cluster_cols"])
        out = run_maintenance(table, spark, **kwargs)
    if not isinstance(out, dict):
        out = {"result": out}
    out["operation"] = f"call:{proc}"
    return out


def _stmt_copy(spark, sql, masked, catalog, tables):
    """``COPY INTO <table> FROM '<glob>' [FORMAT <fmt>]
    [OPTIONS(...)]`` — idempotent exactly-once file ingest from a
    landing zone (operators/copy_into.py; Delta's COPY INTO).
    ``n_files`` / ``max_files_per_batch`` OPTIONS are engine knobs;
    every other option passes to the Spark reader (e.g. header for
    csv)."""
    m = re.match(rf"(?is)\s*COPY\s+INTO\s+({_IDENT})\s+FROM\b", masked)
    if not m:
        raise LakehouseSqlError(
            "expected COPY INTO <table> FROM '<glob>' [FORMAT <fmt>] "
            "[OPTIONS(...)]")
    table = _resolve(m.group(1), catalog, tables)
    sm = re.match(r"\s*'([^']+)'", sql[m.end():])
    if not sm:
        raise LakehouseSqlError(
            "COPY INTO FROM takes one quoted landing glob")
    source = sm.group(1)
    pos = m.end() + sm.end()
    fmt = "parquet"
    fm = re.match(r"(?is)\s*FORMAT\s+(\w+)", masked[pos:])
    if fm:
        fmt = fm.group(1).lower()
        pos += fm.end()
    opts: dict = {}
    om = re.match(r"(?is)\s*OPTIONS\s*\(", masked[pos:])
    if om:
        close = _match_paren(masked, pos + om.end() - 1)
        opts = _parse_kv_pairs(masked, sql, pos + om.end(), close - 1,
                               "OPTIONS")
        pos = close
    if masked[pos:].strip():
        raise LakehouseSqlError(
            f"trailing text after COPY INTO: {sql[pos:].strip()!r}")
    from .operators.copy_into import copy_into

    knobs = {}
    for k in ("n_files", "max_files_per_batch"):
        if k in opts:
            knobs[k] = int(opts.pop(k))
    return copy_into(
        table, spark, source, format=fmt,
        options={k: str(v) for k, v in opts.items()}, **knobs)


_DISPATCH = {
    "INSERT": _stmt_insert,
    "COPY": _stmt_copy,
    "DELETE": _stmt_delete,
    "UPDATE": _stmt_update,
    "MERGE": _stmt_merge,
    "CREATE": _stmt_create,
    "DROP": _stmt_drop,
    "TRUNCATE": _stmt_truncate,
    "OPTIMIZE": _stmt_optimize,
    "VACUUM": _stmt_vacuum,
    "ALTER": _stmt_alter,
    "CALL": _stmt_call,
    "REFRESH": _stmt_refresh,
    "SHOW": _stmt_show,
    "DESCRIBE": _stmt_describe,
    "DESC": _stmt_describe,
}


def execute_sql(
    spark: SparkSession,
    sql: str,
    catalog: Catalog | None = None,
    tables: dict[str, LakehouseTable] | None = None,
    args: dict | None = None,
    txn=None,
):
    """Run one SQL statement against the lakehouse.

    Reads (SELECT/WITH/VALUES/TABLE) return a DataFrame computed by
    ``spark.sql`` after registering every catalog table (views named
    ``<ns>_<table>``) and every entry of ``tables`` (view name = dict
    key). Writes, DDL, and maintenance statements dispatch to the
    native operators and return their metrics dict with an added
    ``operation`` key. ``args`` binds ``:name`` placeholders as SQL
    literals (str/int/float/bool/None/list).
    """
    sql = _bind(sql, args or {})
    masked = _mask(sql)
    hm = re.match(r"\s*(\w+)", masked)
    if not hm:
        raise LakehouseSqlError("empty SQL statement")
    head = hm.group(1).upper()
    if re.search(r"\bAS\s+OF\b", masked, re.I):
        # VERSION/TIMESTAMP AS OF works anywhere a query fragment does
        # (bare reads, CTAS, INSERT ... SELECT, MERGE USING)
        sql = _rewrite_time_travel(spark, sql, catalog, tables)
        masked = _mask(sql)
    if re.search(r"\bUPDATED\s+SINCE\b", masked, re.I):
        sql = _rewrite_updated_since(spark, sql, catalog, tables)
        masked = _mask(sql)
    if head in ("SELECT", "WITH", "VALUES", "TABLE"):
        fast = _try_stats_read(spark, sql, masked, catalog, tables)
        if fast is not None:
            return fast
        _register_reads(spark, catalog, tables, masked)
        return spark.sql(sql)
    if head in ("BEGIN", "START", "COMMIT", "ROLLBACK", "ABORT"):
        raise LakehouseSqlError(
            f"{head} is a script-level statement — run it through "
            "execute_sql_script, which scopes the transaction across "
            "the statements between BEGIN and COMMIT")
    fn = _DISPATCH.get(head)
    if fn is None:
        raise LakehouseSqlError(
            f"unsupported statement head {head!r} (reads: SELECT/WITH/"
            f"VALUES/TABLE; writes: {sorted(_DISPATCH)})")
    if txn is not None:
        if head != "INSERT":
            raise LakehouseSqlError(
                f"only INSERT INTO appends (and reads) may run inside "
                f"BEGIN TRANSACTION — got {head}")
        return fn(spark, sql, masked, catalog, tables, txn=txn)
    return fn(spark, sql, masked, catalog, tables)


def execute_sql_script(
    spark: SparkSession,
    script: str,
    catalog: Catalog | None = None,
    tables: dict[str, LakehouseTable] | None = None,
    args: dict | None = None,
) -> list:
    """Run a ;-separated script (the reference's per-task SQL files,
    src/sql/*.sql run statement-by-statement); returns one result per
    non-empty statement, in order.

    ``BEGIN TRANSACTION; INSERT INTO a ...; INSERT INTO b ...;
    COMMIT;`` stages the enclosed appends on ONE
    :class:`~..tableformat.catalog.CatalogTransaction` and publishes
    them atomically at COMMIT (all tables or none — the write-ahead
    intent journal + pinned-parent CAS documented on the class).
    ``ROLLBACK``/``ABORT`` discards the staged files. Reads inside the
    transaction see the pre-transaction snapshots (staged files are
    uncommitted). Any statement failure inside the transaction aborts
    it before the error propagates; a script that ends without
    COMMIT/ROLLBACK is aborted and rejected."""
    masked = _mask(script)
    results = []
    txn = None
    try:
        for a, b in _split_top(masked, script, ";", 0, len(script)):
            stmt = script[a:b]
            if not stmt.strip():
                continue
            head_m = re.match(r"\s*(\w+)", masked[a:b])
            head = head_m.group(1).upper() if head_m else ""
            if head in ("BEGIN", "START"):
                if not re.fullmatch(
                        r"(?is)\s*(BEGIN|START)(\s+(TRANSACTION|WORK))?\s*",
                        masked[a:b]):
                    raise LakehouseSqlError(
                        f"bad transaction statement {stmt.strip()!r}")
                if txn is not None:
                    raise LakehouseSqlError(
                        "nested BEGIN TRANSACTION is not supported")
                if catalog is None:
                    raise LakehouseSqlError(
                        "BEGIN TRANSACTION needs catalog= (transactions "
                        "publish through the catalog's intent journal)")
                txn = catalog.transaction()
                results.append({"operation": "begin", "txn_id": txn.txn_id})
                continue
            if head in ("COMMIT", "ROLLBACK", "ABORT"):
                if txn is None:
                    raise LakehouseSqlError(
                        f"{head} outside BEGIN TRANSACTION")
                if head == "COMMIT":
                    sids = txn.commit()
                    results.append({"operation": "commit",
                                    "txn_id": txn.txn_id,
                                    "snapshot_ids": sids})
                else:
                    txn.abort()
                    results.append({"operation": "rollback",
                                    "txn_id": txn.txn_id})
                txn = None
                continue
            results.append(execute_sql(spark, stmt, catalog=catalog,
                                       tables=tables, args=args, txn=txn))
        if txn is not None:
            raise LakehouseSqlError(
                "script ended inside BEGIN TRANSACTION with no "
                "COMMIT/ROLLBACK — staged appends were discarded")
    finally:
        if txn is not None:
            txn.abort()
    return results
