"""Referential-integrity gate (engine/cdc.py RefCheck): cross-table
validation of change payloads against broadcast dimension sets, with
violations routed through the NORMAL dead-letter machinery.

Reference parity tier: the reference's filter chains validate one
field at a time (choice = a static set literal); a reference set that
lives in another TABLE is engine-layer surface the north rule's
"validate and normalize each change payload before apply, routing
failures to a dead-letter table" implies at deployment scale (does
this event's repo exist in the registry dimension?).
"""

import os

import pyspark.sql.functions as F
import pytest

from filters_spark.engine.cdc import CDCEngine, RefCheck
from filters_spark.engine.defaults import default_registry
from filters_spark.lake.table import LakeTable

from tests.test_cdc_engine import events_df, final_state, make_engine

ALLOWED = [f"r{i}" for i in range(15)]  # datagen uses r0..r19


def _checked_engine(spark, tmp, ref_checks, **kw):
    table = LakeTable.create(
        spark, os.path.join(tmp, "lake"), key_cols=["repo", "path"],
        num_buckets=8, path_salt=4,
    )
    return CDCEngine(spark, table, default_registry(), ref_checks=ref_checks, **kw)


def test_ref_violations_dead_letter_and_never_apply(spark, tmp_path):
    ev = events_df(spark, n_events=4000, dirty_frac=0.0, seed=31)
    dim = spark.createDataFrame([(r,) for r in ALLOWED], "repo_id string")

    base = make_engine(spark, str(tmp_path / "base"))
    base.apply_batch(ev)

    eng = _checked_engine(
        spark, str(tmp_path / "chk"),
        [RefCheck("repo", dim, "repo_id", name="repos")],
    )
    m = eng.apply_batch(ev)

    banned_nondel = ev.filter(
        ~F.col("repo").isin(ALLOWED) & (F.col("op") != "D")
    ).count()
    assert banned_nondel > 0, "fixture must exercise the gate"
    assert m["dead_lettered"] == banned_nondel

    dead = eng.dead_letters()
    got_codes = {r.first_code for r in dead.collect()}
    assert got_codes == {"ref_violation:repos"}
    assert dead.count() == banned_nondel

    # final state == unchecked final state restricted to allowed repos
    want = {k: v for k, v in final_state(base).items() if k[0] in ALLOWED}
    assert final_state(eng) == want
    # and NO banned repo leaked into the table
    assert all(k[0] in ALLOWED for k in final_state(eng))


def test_deletes_exempt_and_replay_idempotent(spark, tmp_path):
    ev = events_df(spark, n_events=3000, dirty_frac=0.0, seed=32)
    dim = spark.createDataFrame([(r,) for r in ALLOWED], "repo_id string")
    eng = _checked_engine(
        spark, str(tmp_path / "chk"),
        [RefCheck("repo", dim, "repo_id", name="repos")],
    )
    m1 = eng.apply_batch(ev)
    banned_deletes = ev.filter(
        ~F.col("repo").isin(ALLOWED) & (F.col("op") == "D")
    ).count()
    assert banned_deletes > 0
    # deletes were NOT dead-lettered (exempt) and NOT applied as rows
    assert m1["dead_lettered"] == ev.filter(
        ~F.col("repo").isin(ALLOWED) & (F.col("op") != "D")
    ).count()
    state1 = final_state(eng)
    dead1 = eng.dead_letters().count()  # distinct=True, the read contract
    # exactly-once: the whole WAL re-delivered is all replays — the
    # gate must not disturb the watermark dedupe. (Dead rows above
    # their bucket's clean watermark re-dead-letter, same as ordinary
    # validation errors; dead_letters() dedupes at read — the pinned
    # contract is table state + distinct dead set, both unchanged.)
    m2 = eng.apply_batch(ev)
    assert m2["applied"] == 0
    assert final_state(eng) == state1
    assert eng.dead_letters().count() == dead1


def test_allow_null_false_rejects_null_field(spark, tmp_path):
    # schema_version=0 events lack a choice gate on lang but CAN carry
    # NULL lang; a strict lang gate must dead-letter those rows
    rows = [
        ("c%06d" % i, i, "U", 0, f"r{i % 3}", f"p{i}.py", None if i % 2 else "py",
         f"body {i}")
        for i in range(40)
    ]
    ev = spark.createDataFrame(
        rows,
        "commit string, event_seq long, op string, schema_version int, "
        "repo string, path string, lang string, content string",
    )
    dim = spark.createDataFrame([("py",), ("rs",)], "l string")
    strict = _checked_engine(
        spark, str(tmp_path / "strict"),
        [RefCheck("lang", dim, "l", name="langs", allow_null=False)],
    )
    m = strict.apply_batch(ev)
    assert m["dead_lettered"] == 20
    lax = _checked_engine(
        spark, str(tmp_path / "lax"),
        [RefCheck("lang", dim, "l", name="langs")],
    )
    m2 = lax.apply_batch(ev)
    assert m2["dead_lettered"] == 0


def test_callable_ref_and_field_validation(spark, tmp_path):
    dim_rows = [("py",)]

    def live_dim(s):
        return s.createDataFrame(dim_rows, "l string")

    eng = _checked_engine(
        spark, str(tmp_path / "call"),
        [RefCheck("lang", live_dim, "l", name="langs")],
    )
    ev = spark.createDataFrame(
        [("c1", 1, "U", 1, "r0", "p.py", "py", "a"),
         ("c1", 2, "U", 1, "r0", "q.py", "go", "b")],
        "commit string, event_seq long, op string, schema_version int, "
        "repo string, path string, lang string, content string",
    )
    m = eng.apply_batch(ev)
    assert m["dead_lettered"] == 1 and m["applied"] == 1

    with pytest.raises(ValueError, match="canonical"):
        _checked_engine(
            spark, str(tmp_path / "bad"),
            [RefCheck("nope", live_dim, "l")],
        )


def test_check_constraints_gate_rows(spark, tmp_path):
    """CheckConstraint (Delta CHECK / DLT expectation): a SQL predicate
    over the validated row dead-letters definitively-FALSE events; NULL
    (unknown) passes per SQL semantics; deletes are exempt; constraints
    compose with each other and with ref checks."""
    from filters_spark.engine.cdc import CheckConstraint

    eng = _checked_engine(
        spark, str(tmp_path / "chk"), None,
        check_constraints=[
            CheckConstraint("content_cap", "length(content) <= 10"),
            CheckConstraint("seq_positive", "event_seq >= 0"),
        ],
    )
    ev = spark.createDataFrame(
        [
            ("c1", 1, "U", 1, "r0", "a.py", "py", "short"),        # passes
            ("c1", 2, "U", 1, "r0", "b.py", "py", "x" * 50),       # content_cap
            ("c1", -3, "U", 1, "r0", "c.py", "py", "ok"),          # seq_positive
            ("c1", -4, "U", 1, "r0", "d.py", "py", "y" * 50),      # BOTH
            ("c1", 5, "D", 1, "r0", "e.py", None, "z" * 50),       # delete: exempt
            ("c1", 6, "U", 0, "r0", "f.py", None, "ok2"),          # NULL lang: fine
        ],
        "commit string, event_seq long, op string, schema_version int, "
        "repo string, path string, lang string, content string",
    )
    m = eng.apply_batch(ev)
    assert m["dead_lettered"] == 3
    dead = eng.dead_letters()
    codes = sorted(r.first_code for r in dead.collect())
    assert codes == [
        "check_violation:content_cap",
        "check_violation:content_cap",
        "check_violation:seq_positive",
    ]
    # the both-violations row carries BOTH error structs
    both = dead.filter(F.col("path") == "d.py").select("errors_json").first()[0]
    assert "content_cap" in both and "seq_positive" in both
    state_paths = {r.path for r in eng.table.read().select("path").collect()}
    assert state_paths == {"a.py", "f.py"}


def test_check_constraint_null_predicate_passes(spark, tmp_path):
    """A predicate that evaluates to NULL (unknown) must PASS — the SQL
    CHECK contract; rejecting NULLs is spelled explicitly."""
    from filters_spark.engine.cdc import CheckConstraint

    ev = spark.createDataFrame(
        [("c1", 1, "U", 1, "r0", "a.py", None, "ok")],
        "commit string, event_seq long, op string, schema_version int, "
        "repo string, path string, lang string, content string",
    )
    lax = _checked_engine(
        spark, str(tmp_path / "lax"), None,
        check_constraints=[CheckConstraint("lang_py", "lang = 'py'")],
    )
    assert lax.apply_batch(ev)["dead_lettered"] == 0  # NULL = 'py' -> NULL -> pass
    strict = _checked_engine(
        spark, str(tmp_path / "strict"), None,
        check_constraints=[
            CheckConstraint("lang_py", "lang IS NOT NULL AND lang = 'py'")
        ],
    )
    assert strict.apply_batch(ev)["dead_lettered"] == 1
