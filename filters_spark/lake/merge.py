"""Declarative MERGE INTO over a :class:`LakeTable` — the ANSI/Iceberg
``MERGE INTO target USING source ON keys WHEN MATCHED ... WHEN NOT
MATCHED ...`` statement, for merges the CDC engine's fixed LWW policy
doesn't cover (conditional updates, computed columns, upsert feeds that
carry no (commit, event_seq) ordering of their own).

Clause model (ANSI evaluation order, fixed):

1. ``WHEN MATCHED AND <delete_when> THEN DELETE``
2. ``WHEN MATCHED AND <update_when> THEN UPDATE SET <update>``
3. matched rows hitting neither clause keep the target row unchanged
4. ``WHEN NOT MATCHED AND <insert_when> THEN INSERT <insert>``
5. ``WHEN NOT MATCHED BY SOURCE AND <delete_by_source_when> THEN
   DELETE`` / ``... THEN UPDATE SET <update_by_source>`` (Delta's
   extension; opt-in) — target rows the feed did not mention. These
   clauses make the merge a FULL-TABLE operation by construction:
   unmatched target rows live in every bucket, so every data-carrying
   bucket is read and rewritten (the same cost Delta pays; the cost is
   explicit in the clause, not a merge default — leave them None and
   the merge stays O(touched buckets)). The classic use is snapshot
   sync: source = the full new state, ``update="*"``, ``insert="*"``,
   ``delete_by_source_when="true"`` — rows absent from the feed are
   deleted. ``update_by_source`` SET expressions see only ``t``
   (``s`` is the NULL struct there, per ANSI scope).

Conditions and set-expressions are SQL strings over two row structs:
``t.<col>`` (the current target row; NULL struct for inserts) and
``s.<col>`` (the source row; NULL struct for unmatched target rows) —
e.g. ``update={"content": "'M:' || s.content", "lang":
"coalesce(s.lang, t.lang)"}``, ``delete_when="s.op = 'D'"``.

Scale shape: the source is bucketed by the table's key hash first, the
target read prunes to exactly the touched buckets (untouched buckets
carry over by manifest reference, zero IO), and the merge is ONE
full-outer sort-merge join on the key columns followed by the bucketed
write — the same copy-on-write cost class as the engine's merge-apply.
ANSI cardinality is enforced distributed-side: a source with two rows
for one key raises at write time (``raise_error``), exactly like
Delta/Iceberg runtime merge-cardinality errors.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from filters_spark.lake.table import LakeTable, bucket_expr


def _clause_map(clause, cols: list[str], side: str) -> dict[str, str] | None:
    """Normalize a clause: "*" -> column-wise copy from ``side``,
    dict -> validated as-is, None -> clause disabled."""
    if clause is None:
        return None
    if clause == "*":
        return {c: f"{side}.`{c}`" for c in cols}
    unknown = set(clause) - set(cols)
    if unknown:
        raise ValueError(
            f"merge clause sets unknown column(s) {sorted(unknown)}; "
            f"table columns are {cols}"
        )
    return dict(clause)


def merge_into(
    t: LakeTable,
    source: DataFrame,
    update="*",
    update_when: str | None = None,
    delete_when: str | None = None,
    insert="*",
    insert_when: str | None = None,
    update_by_source: dict | None = None,
    update_by_source_when: str | None = None,
    delete_by_source_when: str | None = None,
    new_watermarks: dict[int, str] | None = None,
) -> dict | None:
    """Run the merge and commit it as one copy-on-write snapshot
    (``operation='merge'``). Returns the new snapshot, or None when the
    source is empty (nothing touched, no commit).

    ``update`` / ``insert``: ``"*"`` (default) copies every table
    column from ``s`` (the source must then carry them all), a dict
    sets listed columns (updates: unlisted columns keep the target
    value; inserts: unlisted columns are NULL), ``None`` disables the
    clause. ``content_sha`` is always recomputed from the final
    ``content`` — it is derived state, never directly assignable.

    Rows with a NULL key never match (SQL join semantics): a single
    NULL-key row inserts when the insert clause admits it. Source
    key uniqueness is enforced for EVERY key, matched or not and NULL
    included — stricter than ANSI (which only polices multiple matches
    of one target row) because this table's read surface assumes
    key-unique state: admitting two same-key inserts would plant a
    duplicate that every downstream LWW fold then resolves
    arbitrarily. Source watermarks are
    not consulted — this is the one-shot relational merge; replayed
    feeds with exactly-once needs go through ``CDCEngine``.
    ``new_watermarks`` (bucket -> "commit:seq") is offered for callers
    that coordinate both surfaces against one stream."""
    snap = t.current()
    on = snap["key_cols"]
    payload = t.payload_cols(snap)
    tcols = [*on, "commit", "event_seq", *payload]
    upd = _clause_map(update, tcols, "s")
    ins = _clause_map(insert, tcols, "s")
    if update_by_source is not None:
        unknown = set(update_by_source) - set(tcols)
        if unknown:
            raise ValueError(
                f"update_by_source sets unknown column(s) {sorted(unknown)}"
            )
    by_source = (
        update_by_source is not None or delete_by_source_when is not None
    )
    if upd is None and ins is None and delete_when is None and not by_source:
        raise ValueError("merge with no clauses would be a no-op")

    src = source.withColumn(
        "_sb",
        bucket_expr(
            F.col(on[0]), F.col(on[1]), snap["num_buckets"], snap["path_salt"]
        ),
    )
    touched = sorted(r[0] for r in src.select("_sb").distinct().collect())
    if update_by_source is None and update_by_source_when is not None:
        raise ValueError(
            "update_by_source_when given without update_by_source — the "
            "condition would be silently ignored"
        )
    if by_source:
        # unmatched target rows live in EVERY data-carrying bucket —
        # the full-table cost the docstring warns about, made explicit.
        # Delta-only buckets included: a MoR bucket can hold rows purely
        # in delta files with no base commit yet
        touched = sorted(
            set(touched)
            | {int(b) for b in snap["buckets"]}
            | {int(b) for b in snap.get("deltas", {})}
        )
    if not touched:
        return None

    # Source-key uniqueness guard (see docstring: stricter than ANSI
    # by design). Rides the window over the key columns (the same
    # partitioning the join shuffles to); trips executor-side at write
    # time.
    wkey = Window.partitionBy(*[F.col(c) for c in on])
    src = src.withColumn("_src_n", F.count(F.lit(1)).over(wkey))
    src2 = src.select(
        F.struct(*[F.col(c) for c in source.columns]).alias("s"),
        *[F.col(c).alias(f"_sk_{c}") for c in on],
        F.col("_sb"),
        "_src_n",
    )

    tgt = t.read(buckets=touched)
    t_ddl = ", ".join(
        f"`{c}`: {'bigint' if c == 'event_seq' else 'string'}" for c in tcols
    )
    if tgt is not None:
        tgt2 = tgt.select(
            F.struct(*[F.col(c) for c in tcols]).alias("t"),
            *[F.col(c).alias(f"_tk_{c}") for c in on],
            F.col("_bucket").alias("_tb"),
        )
        cond = [src2[f"_sk_{c}"] == tgt2[f"_tk_{c}"] for c in on]
        joined = tgt2.join(src2, cond, "full_outer")
    else:
        # empty table: every source row is a not-matched candidate;
        # give expressions a typed NULL t struct so "t.col" resolves
        joined = src2.withColumn("t", F.lit(None).cast(f"struct<{t_ddl}>")) \
            .withColumn("_tb", F.lit(None).cast("int"))

    tp = F.col("t").isNotNull()
    sp = F.col("s").isNotNull()
    matched = tp & sp

    def cl(expr: str | None):
        # ANSI: a clause whose condition is UNKNOWN does not apply —
        # coalesce to false, or a NULL delete_when on a matched row
        # would null the keep predicate and silently delete it
        if expr is None:
            return F.lit(True)
        return F.coalesce(F.expr(expr), F.lit(False))

    is_del = matched & cl(delete_when) if delete_when is not None else F.lit(False)
    is_upd = (
        matched & ~is_del & cl(update_when) if upd is not None else F.lit(False)
    )
    is_ins = (
        ~tp & sp & cl(insert_when) if ins is not None else F.lit(False)
    )
    unmatched_t = tp & ~sp
    is_del_bs = (
        unmatched_t & cl(delete_by_source_when)
        if delete_by_source_when is not None else F.lit(False)
    )
    is_upd_bs = (
        unmatched_t & ~is_del_bs & cl(update_by_source_when)
        if update_by_source is not None else F.lit(False)
    )
    keep = (tp & ~is_del & ~is_del_bs) | is_ins

    def out_col(c: str):
        tv = F.col("t")[c]
        u = F.expr(upd[c]) if upd is not None and c in upd else tv
        i = F.expr(ins[c]) if ins is not None and c in ins else F.lit(None)
        col = F.when(is_upd, u).when(is_ins, i)
        if update_by_source is not None:
            ubs = F.expr(update_by_source[c]) if c in update_by_source else tv
            col = col.when(is_upd_bs, ubs)
        col = col.otherwise(tv)
        return col.cast("bigint" if c == "event_seq" else "string").alias(c)

    # the cardinality guard lives INSIDE the row filter so Catalyst
    # cannot prune it as an unused column: any surviving-or-not row
    # whose key matched >1 source rows trips raise_error executor-side
    keep_guarded = F.when(
        sp & (F.col("_src_n") > 1),
        F.raise_error(F.lit(
            "MERGE cardinality violation: duplicate source rows for one "
            "merge key"
        )).cast("boolean"),
    ).otherwise(keep)
    out = (
        joined.filter(keep_guarded)
        .select(
            *[out_col(c) for c in tcols],
            F.coalesce(F.col("_tb"), F.col("_sb")).cast("int").alias("_bucket"),
        )
        .withColumn(
            "content_sha",
            F.sha2(F.coalesce(F.col("content"), F.lit("")), 256),
        )
        .repartition("_bucket")
    )
    return t.commit_buckets(
        out, touched, new_watermarks or {}, operation="merge"
    )
