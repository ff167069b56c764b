"""Materialized views with incremental (affected-group) refresh.

A materialized view (MV) is a regular lakehouse table whose content
equals a single-source GROUP BY aggregate::

    SELECT <group keys...>, <agg exprs...>
    FROM <source table> [WHERE <pred>]
    GROUP BY <group keys...>

plus table properties recording the definition and the SOURCE SNAPSHOT
the content reflects.  The reference rebuilds its gold tables from
scratch on every DAG run (/root/reference/dags/Queries_dag.py,
src/sql/gold.sql CREATE OR REPLACE) — this operator keeps the same
gold-table semantics while making refresh cost proportional to the
CHANGE volume, not the source size.

Star-join views (``joins=``) extend the shape to the reference's
actual gold-table form — a FACT aggregated by DIMENSION attributes
(src/sql/gold.sql joins trips×zones before every GROUP BY)::

    SELECT <keys from fact and/or dims...>, <aggs...>
    FROM <fact> [INNER|LEFT] JOIN <dim> ON <fact col> = <dim col> ...
    [WHERE <pred>] GROUP BY <keys...>

Dims are broadcast (small by star-schema assumption; opt out per
join), and the MV records each dim's snapshot alongside the fact's.
A refresh with UNCHANGED dims runs the same change-proportional
affected-group path driven by the FACT changelog (changed fact rows
are joined to the dims to derive the affected group keys); when a
group key is a plain dim attribute, the affected dim rows' join-key
min/max is translated into a fact-scan range hint — the dynamic-
file-pruning idiom, effective when the fact is clustered on its join
key.  A dim change falls back to a full rebuild (dims are aggregate-
sized; the fact is the 10^12-row side that must never be rescanned).

Refresh strategy — affected-group recompute
-------------------------------------------
The row-level changelog between the MV's recorded snapshot and the
source's current snapshot (streaming/changelog.py) yields the DISTINCT
group keys touched by any insert, update, or delete.  Only those groups
are recomputed, from the current source restricted by a semi-join on
the affected keys, and merged into the MV; affected groups that no
longer produce rows are deleted.  Because each affected group is
recomputed FROM SCRATCH, any aggregate expression is supported —
distributive (count/sum) and holistic (count(distinct), percentile)
alike; there is no delta arithmetic to get subtly wrong.

Scale: on a 10^12-row source, a refresh after an ingest touching 0.1 %
of groups reads the changelog (∝ change volume), the affected slice of
the source (semi-join, file-skipped via a min/max hint over the
affected key range when the key is a plain column — effective when the
table is Z-ordered/clustered on it), and rewrites only the MV files
holding affected groups (MERGE copy-on-write).  Nothing is O(source).

Refresh modes actually taken (reported in the result dict):

* ``noop``               — source snapshot unchanged.
* ``noop-advance``       — commits exist but produced zero net changes.
* ``incremental-merge``  — affected groups upserted via MERGE, vanished
  groups deleted via a delete-shaped MERGE (the common path; 1–2 MV
  commits).
* ``incremental-rewrite``— some affected group key is NULL (MERGE joins
  keys by equality, which can never match a NULL); the MV content is
  rebuilt as (unaffected rows) ∪ (recomputed groups) in one replace
  commit.  Source-side work is still change-proportional; only the MV
  itself (already aggregate-sized) rewrites.
* ``full``               — a content rewrite (CoW MERGE/DELETE/UPDATE)
  sits in the changelog range, the recorded snapshot has been expired,
  or the caller forced ``mode="full"``: recompute everything, replace.

Concurrency: refresh commits optimistically like every other writer.
Two concurrent refreshes converge (the second upsert re-writes the same
values; the property bump is idempotent); a source commit racing the
refresh is simply picked up by the NEXT refresh, because the refresh
pins the source snapshot it computes against and records exactly that.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tableformat.catalog import Catalog
from ..tableformat.table import LakehouseTable
from ..streaming.changelog import changelog_df
from .merge import merge_into

# properties carrying the MV definition on the MV table itself
PROP_SOURCE = "mv.source"
PROP_WHERE = "mv.where"
PROP_GROUP_BY = "mv.group-by"   # json [[alias, expr], ...]
PROP_AGGS = "mv.aggs"           # json [[alias, expr], ...]
PROP_SNAPSHOT = "mv.snapshot-id"
# star-join MVs: json [[dim table, fact col, dim col, how, broadcast]]
PROP_JOINS = "mv.joins"
# json {dim table: snapshot id} the MV content reflects
PROP_DIM_SNAPS = "mv.dim-snapshots"

# below this many affected groups the semi-join side is broadcast
_BROADCAST_KEYS = 1_000_000


class NotMaterializedView(ValueError):
    pass


def _norm_group_by(group_by) -> list[tuple[str, str]]:
    if isinstance(group_by, dict):
        out = [(a, e) for a, e in group_by.items()]
    else:
        out = [(c, c) for c in group_by]
    if not out:
        raise ValueError("materialized view needs >= 1 group key")
    return out


def _norm_joins(joins) -> list[dict]:
    """Normalize ``joins`` input: a list of dicts
    ``{"table": name, "on": [col_a, col_b], "how": "inner"|"left",
    "broadcast": bool}`` (``on`` sides in either order — resolved
    against the schemas by :func:`_resolve_joins`)."""
    out = []
    for j in joins or []:
        if not isinstance(j, dict):
            raise ValueError(f"join spec must be a dict, got {j!r}")
        how = str(j.get("how", "inner")).lower()
        if how not in ("inner", "left"):
            raise ValueError(
                f"join how={how!r} (star MVs support inner|left)")
        on = list(j["on"])
        if len(on) != 2:
            raise ValueError(f"join on must be [col_a, col_b], got {on!r}")
        out.append({"table": j["table"], "on": on, "how": how,
                    "broadcast": bool(j.get("broadcast", True))})
    return out


def _resolve_joins(catalog: Catalog, src_schema, joins: list[dict]):
    """Resolve each join's ON sides to (fact side, dim side) against
    the actual schemas — 'fact side' meaning the accumulated relation
    (fact plus previously joined dims, so a chain of star joins works)
    — and reject column-name collisions that would make downstream
    group/agg expressions ambiguous.  Returns resolved join dicts with
    ``fact_col``/``dim_col`` and the full set of available columns."""
    avail = {f.name for f in src_schema.fields}
    resolved = []
    for j in joins:
        dim_cols = {f.name
                    for f in catalog.load_table(j["table"]).schema().fields}
        a, b = j["on"]
        if a in avail and b in dim_cols:
            fact_col, dim_col = a, b
        elif b in avail and a in dim_cols:
            fact_col, dim_col = b, a
        else:
            raise ValueError(
                f"join ON {a} = {b}: one side must be a column of the "
                f"accumulated relation and the other of {j['table']!r}")
        # name-equal keys merge into one output column (join on=[name]);
        # everything else the dim brings must be a NEW name
        dup = (dim_cols - ({dim_col} if fact_col == dim_col else set())) \
            & avail
        if dup:
            raise ValueError(
                f"join with {j['table']!r} would duplicate column(s) "
                f"{sorted(dup)} — rename them in the dim table")
        avail |= dim_cols
        resolved.append({"table": j["table"], "fact_col": fact_col,
                         "dim_col": dim_col, "how": j["how"],
                         "broadcast": j["broadcast"]})
    return resolved, avail


def _joined(spark: SparkSession, catalog: Catalog, base: DataFrame,
            d: dict, dim_snaps: dict | None) -> DataFrame:
    """Apply the star-join chain to ``base`` (the fact scan or the
    fact changelog), each dim read at its pinned snapshot."""
    for j in d.get("joins") or []:
        t = catalog.load_table(j["table"])
        sid = (dim_snaps or {}).get(j["table"])
        dim = t.scan(spark, snapshot_id=sid)
        if j["broadcast"]:
            dim = F.broadcast(dim)
        if j["fact_col"] == j["dim_col"]:
            base = base.join(dim, [j["fact_col"]], j["how"])
        else:
            base = base.join(
                dim, base[j["fact_col"]] == dim[j["dim_col"]], j["how"])
    return base


def _dim_snapshots(catalog: Catalog, joins: list[dict]) -> dict:
    out = {}
    for j in joins:
        s = catalog.load_table(j["table"]).current_snapshot()
        out[j["table"]] = s.snapshot_id if s else None
    return out


def _definition(table: LakehouseTable) -> dict:
    props = table.properties()
    if PROP_SOURCE not in props:
        raise NotMaterializedView(
            f"{table.location} has no {PROP_SOURCE} property — not a "
            "materialized view")
    return {
        "source": props[PROP_SOURCE],
        "where": props.get(PROP_WHERE) or None,
        "group_by": [tuple(p) for p in json.loads(props[PROP_GROUP_BY])],
        "aggs": [tuple(p) for p in json.loads(props[PROP_AGGS])],
        "snapshot_id": (int(props[PROP_SNAPSHOT])
                        if props.get(PROP_SNAPSHOT) not in (None, "")
                        else None),
        "joins": [
            {"table": t, "fact_col": fc, "dim_col": dc, "how": how,
             "broadcast": bc}
            for t, fc, dc, how, bc
            in json.loads(props.get(PROP_JOINS) or "[]")
        ],
        "dim_snapshots": json.loads(props.get(PROP_DIM_SNAPS) or "{}"),
    }


def materialized_view_sql(catalog: Catalog, name: str) -> str:
    """The plain-SQL equivalent of the stored definition (what a full
    rebuild computes) — for documentation, EXPLAIN, and oracles."""
    d = _definition(catalog.load_table(name))
    sel = [f"{e} AS {a}" if e != a else a for a, e in d["group_by"]]
    sel += [f"{e} AS {a}" for a, e in d["aggs"]]
    src = d["source"].replace(".", "_")
    q = f"SELECT {', '.join(sel)} FROM {src}"
    for j in d["joins"]:
        kw = "JOIN" if j["how"] == "inner" else "LEFT JOIN"
        q += (f" {kw} {j['table'].replace('.', '_')}"
              f" ON {j['fact_col']} = {j['dim_col']}")
    if d["where"]:
        q += f" WHERE {d['where']}"
    q += f" GROUP BY {', '.join(e for _a, e in d['group_by'])}"
    return q


def _compute(
    spark: SparkSession,
    src: LakehouseTable,
    d: dict,
    snapshot_id: int | None,
    affected: DataFrame | None = None,
    n_affected: int | None = None,
    int_ranges: dict | None = None,
    catalog: Catalog | None = None,
    dim_snaps: dict | None = None,
) -> DataFrame:
    """The view aggregate, optionally restricted to the affected group
    keys (null-safe semi-join on the computed key columns).  Star
    joins apply BEFORE the WHERE (the predicate may reference dim
    columns); ``int_ranges`` prunes the FACT scan only."""
    base = src.scan(spark, snapshot_id=snapshot_id, int_ranges=int_ranges)
    if d.get("joins"):
        base = _joined(spark, catalog, base, d, dim_snaps)
    if d["where"]:
        base = base.filter(F.expr(d["where"]))
    keyed = base.select(
        "*", *[F.expr(e).alias(f"__k_{a}") for a, e in d["group_by"]])
    if affected is not None:
        aff = affected.select(
            *[F.col(a).alias(f"__a_{a}") for a, _e in d["group_by"]])
        if n_affected is not None and n_affected <= _BROADCAST_KEYS:
            aff = F.broadcast(aff)
        cond = None
        for a, _e in d["group_by"]:
            c = keyed[f"__k_{a}"].eqNullSafe(aff[f"__a_{a}"])
            cond = c if cond is None else cond & c
        keyed = keyed.join(aff, cond, "left_semi")
    return keyed.groupBy(
        *[F.col(f"__k_{a}").alias(a) for a, _e in d["group_by"]]
    ).agg(*[F.expr(e).alias(a) for a, e in d["aggs"]])


def _validate_defn(src_cols: set, group_by, aggs, where) -> None:
    seen: set[str] = set()
    for a, e in list(group_by) + list(aggs):
        if a in seen:
            raise ValueError(f"duplicate output column {a!r}")
        seen.add(a)
        if a in src_cols and e != a:
            # an alias shadowing a DIFFERENT source column would
            # corrupt agg expressions referring to that column
            raise ValueError(
                f"output alias {a!r} shadows source column {a!r} "
                f"(expr {e!r}) — pick a different alias")


def create_materialized_view(
    spark: SparkSession,
    catalog: Catalog,
    name: str,
    source: str,
    group_by,
    aggs: dict[str, str],
    where: str | None = None,
    joins=None,
    replace: bool = False,
    n_files: int | None = None,
) -> dict:
    """Create (and fully populate) a materialized view.

    ``group_by``: list of plain source columns, or {alias: expr} for
    derived keys (e.g. ``{"day": "date_trunc('DAY', ts)"}``).
    ``aggs``: {output column: aggregate SQL expr} — any aggregate
    (recompute-based refresh never needs it decomposable).
    ``joins``: optional star-join chain, a list of
    ``{"table": dim, "on": [col_a, col_b], "how": "inner"|"left",
    "broadcast": True}`` — group keys and aggregates may then
    reference dim columns.
    """
    gb = _norm_group_by(group_by)
    ag = [(a, e) for a, e in aggs.items()]
    if not ag:
        raise ValueError("materialized view needs >= 1 aggregate")
    src = catalog.load_table(source)
    jn, avail = _resolve_joins(catalog, src.schema(), _norm_joins(joins))
    _validate_defn(avail, gb, ag, where)
    if catalog.table_exists(name):
        if not replace:
            raise ValueError(f"table {name!r} exists (replace=False)")
        catalog.drop_table(name, purge=True)
    cur = src.current_snapshot()
    dim_snaps = _dim_snapshots(catalog, jn)
    t0 = time.time()
    df = _compute(spark, src,
                  {"where": where, "group_by": gb, "aggs": ag, "joins": jn},
                  snapshot_id=cur.snapshot_id if cur else None,
                  catalog=catalog, dim_snaps=dim_snaps)
    props = {
        PROP_SOURCE: source,
        PROP_WHERE: where or "",
        PROP_GROUP_BY: json.dumps([list(p) for p in gb]),
        PROP_AGGS: json.dumps([list(p) for p in ag]),
        PROP_SNAPSHOT: str(cur.snapshot_id) if cur else "",
        PROP_JOINS: json.dumps(
            [[j["table"], j["fact_col"], j["dim_col"], j["how"],
              j["broadcast"]] for j in jn]),
        PROP_DIM_SNAPS: json.dumps(dim_snaps),
    }
    t = catalog.create_table_as(name, df, n_files=n_files, properties=props)
    rows = t.size_stats(spark)["rows"]
    return {"operation": "create_materialized_view", "view": name,
            "rows": rows, "source_snapshot": cur.snapshot_id if cur else None,
            "wall_ms": int((time.time() - t0) * 1000)}


def _replace_content(t: LakehouseTable, df: DataFrame, summary: dict,
                     n_files: int | None = None):
    # one-commit full replace: the new snapshot simply carries no prior
    # manifests, so no old-file listing exists anywhere (MVs are
    # aggregate-sized, but O(new data) metadata is free to have) and a
    # concurrent commit retries onto the advanced head
    return t.overwrite(df, n_files=n_files, summary=summary)


def refresh_materialized_view(
    spark: SparkSession,
    catalog: Catalog,
    name: str,
    mode: str = "auto",
) -> dict:
    """Refresh ``name`` to the source's current snapshot.

    ``mode="auto"`` refreshes incrementally when the changelog allows
    it and falls back to a full rebuild otherwise; ``"full"`` forces
    the rebuild; ``"incremental"`` raises instead of falling back
    (for tests and cost-guarded schedulers).
    """
    if mode not in ("auto", "incremental", "full"):
        raise ValueError(f"mode={mode!r} (auto|incremental|full)")
    t0 = time.time()
    t = catalog.load_table(name)
    d = _definition(t)
    src = catalog.load_table(d["source"])
    cur = src.current_snapshot()
    cur_id = cur.snapshot_id if cur else None
    dim_cur = _dim_snapshots(catalog, d["joins"])
    dims_changed = dim_cur != d["dim_snapshots"]
    out = {"operation": "refresh_materialized_view", "view": name,
           "from_snapshot": d["snapshot_id"], "to_snapshot": cur_id}
    if cur_id == d["snapshot_id"] and not dims_changed:
        out.update(mode="noop", wall_ms=int((time.time() - t0) * 1000))
        return out

    changes = None
    fallback_reason = None
    if dims_changed:
        # a dim change can move ANY group's key — change-proportional
        # tracking is defined on the fact; rebuild (the dims and the
        # MV are both aggregate-sized, the fact is never rescanned
        # beyond what the rebuild's own scan needs)
        fallback_reason = "dimension table changed since last refresh"
    elif mode != "full" and d["snapshot_id"] is not None:
        try:
            changes = changelog_df(src, spark,
                                   from_snapshot_id=d["snapshot_id"],
                                   to_snapshot_id=cur_id)
        except ValueError as e:
            # ChangelogUnsupportedError (a CoW content rewrite in the
            # range) or an expired from-snapshot — both mean the
            # change set cannot be derived; rebuild instead
            fallback_reason = str(e)
    if changes is None and mode == "incremental":
        raise ValueError(
            f"incremental refresh unavailable: "
            f"{fallback_reason or 'no recorded source snapshot'}")

    if changes is not None:
        res = _refresh_incremental(spark, t, src, d, cur_id, changes, out,
                                   catalog=catalog, dim_snaps=dim_cur)
    else:
        df = _compute(spark, src, d, snapshot_id=cur_id,
                      catalog=catalog, dim_snaps=dim_cur)
        snap = _replace_content(
            t, df, {"op": "mv-refresh-full", "mv.source": d["source"]})
        res = dict(out, mode="full", reason=fallback_reason,
                   rows=snap.summary.get("added-records"))
    t.update_properties({PROP_SNAPSHOT: str(cur_id) if cur_id else "",
                         PROP_DIM_SNAPS: json.dumps(dim_cur)})
    res["wall_ms"] = int((time.time() - t0) * 1000)
    return res


def _key_range_hint(affected: DataFrame, d: dict, src: LakehouseTable):
    """File-skipping hint for the recompute scan: when a group key is a
    PLAIN integer/date/string source column, the affected keys' min/max
    bound the source rows any affected group can draw from — exactly
    the int_ranges manifest-stats contract.  On a source clustered
    (Z-order/Hilbert) on that column this turns the recompute scan into
    a small-file-set read; on an unclustered source it is a no-op-safe
    over-approximation."""
    import pyspark.sql.types as T

    plain = [
        (a, f.dataType) for a, e in d["group_by"]
        for f in src.schema().fields if e == a == f.name
    ]
    ok = (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.StringType)
    cols = [a for a, dt in plain if isinstance(dt, ok)]
    if not cols:
        return None
    row = affected.agg(*[x for a in cols
                         for x in (F.min(a).alias(f"lo_{a}"),
                                   F.max(a).alias(f"hi_{a}"))]).collect()[0]
    hints = {}
    for a in cols:
        lo, hi = row[f"lo_{a}"], row[f"hi_{a}"]
        if lo is None:
            continue  # all-NULL key: no range to prune on
        hints[a] = (lo, hi)
    return hints or None


def _dim_range_hints(spark, catalog, affected, d, dim_snaps, src):
    """Dim→fact dynamic file pruning: when a group key is a PLAIN
    column of a joined dim, the affected dim rows' join-key min/max
    bound the fact rows any affected group can draw from (inner-join
    rows only — so skipped whenever an affected key from that dim is
    NULL, which a LEFT join's unmatched fact rows produce).  Returns
    {fact col: (lo, hi)} to intersect into the fact-scan hint."""
    import pyspark.sql.types as T

    ok = (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.StringType)
    src_types = {f.name: f.dataType for f in src.schema().fields}
    hints = {}
    for j in d.get("joins") or []:
        if not isinstance(src_types.get(j["fact_col"]), ok):
            continue
        dim_t = catalog.load_table(j["table"])
        dcols = {f.name for f in dim_t.schema().fields}
        keys = [a for a, e in d["group_by"] if e == a and a in dcols]
        if not keys:
            continue
        if affected.where(" OR ".join(
                f"{a} IS NULL" for a in keys)).limit(1).count():
            continue
        matched = dim_t.scan(
            spark, snapshot_id=(dim_snaps or {}).get(j["table"])
        ).join(F.broadcast(affected.select(*keys).distinct()),
               keys, "left_semi")
        row = matched.agg(F.min(j["dim_col"]).alias("lo"),
                          F.max(j["dim_col"]).alias("hi")).collect()[0]
        if row["lo"] is not None:
            hints[j["fact_col"]] = (row["lo"], row["hi"])
    return hints


def _refresh_incremental(spark, t, src, d, cur_id, changes, out,
                         catalog=None, dim_snaps=None) -> dict:
    keys = [a for a, _e in d["group_by"]]
    if d.get("joins"):
        # group keys may be dim attributes: derive affected keys from
        # the changed FACT rows joined to the (unchanged) dims
        changes = _joined(spark, catalog, changes, d, dim_snaps)
    affected = changes.select(
        *[F.expr(e).alias(a) for a, e in d["group_by"]]).distinct().persist()
    try:
        n_aff = affected.count()
        if n_aff == 0:
            return dict(out, mode="noop-advance", affected_groups=0)
        hints = _key_range_hint(affected, d, src)
        for col, (lo, hi) in _dim_range_hints(
                spark, catalog, affected, d, dim_snaps, src).items():
            if col in (hints or {}):  # both bounds correct: intersect
                plo, phi = hints[col]
                lo, hi = max(lo, plo), min(hi, phi)
            hints = dict(hints or {})
            hints[col] = (lo, hi)
        hints = hints or None
        recompute = _compute(spark, src, d, snapshot_id=cur_id,
                             affected=affected, n_affected=n_aff,
                             int_ranges=hints, catalog=catalog,
                             dim_snaps=dim_snaps).persist()
        try:
            has_null = bool(
                affected.where(" OR ".join(
                    f"{a} IS NULL" for a in keys)).limit(1).count())
            if has_null:
                # MERGE joins keys by equality — a NULL key never
                # matches.  Rebuild MV content as one replace commit:
                # unaffected rows carried, affected groups recomputed.
                cond = None
                aff2 = affected.select(
                    *[F.col(a).alias(f"__a_{a}") for a in keys])
                mv_rows = t.scan(spark)
                for a in keys:
                    c = mv_rows[a].eqNullSafe(aff2[f"__a_{a}"])
                    cond = c if cond is None else cond & c
                keep = mv_rows.join(aff2, cond, "left_anti")
                snap = _replace_content(
                    t, keep.unionByName(recompute),
                    {"op": "mv-refresh-rewrite", "mv.source": d["source"]})
                return dict(out, mode="incremental-rewrite",
                            affected_groups=n_aff,
                            rows=snap.summary.get("added-records"),
                            key_range_hint=hints)
            m = merge_into(
                t, spark, recompute, key=keys,
                when_matched="update", when_not_matched="insert",
                extra_summary={"op2": "mv-refresh"})
            vanished = affected.join(
                recompute.select(*keys), keys, "left_anti")
            n_van = vanished.count()
            if n_van:
                # delete-shaped merge: keys + NULL aggregate columns
                dv = vanished.select(
                    "*", *[F.lit(None).cast(
                        t.schema()[a].dataType).alias(a)
                        for a, _e in d["aggs"]])
                merge_into(t, spark, dv, key=keys,
                           when_matched="delete", when_not_matched=None,
                           extra_summary={"op2": "mv-refresh-vanish"})
            return dict(out, mode="incremental-merge",
                        affected_groups=n_aff, vanished_groups=n_van,
                        rows_upserted=m.get("rows_out"),
                        key_range_hint=hints)
        finally:
            recompute.unpersist()
    finally:
        affected.unpersist()
