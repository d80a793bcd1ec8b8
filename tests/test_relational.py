"""Parity tests for the relational probe/merge/diff operators
(reference src/storage.cpp:97-114, src/merge.cpp:46-78,
src/diff.cpp:44-80)."""

from __future__ import annotations

import pytest

from acxspark.operators import relational as R


@pytest.fixture(scope="module")
def contacts(spark):
    existing = spark.createDataFrame(
        [
            ("a@x.com", "2025-01-02 00:00:00", "old-a"),
            ("b@x.com", "2025-01-05 00:00:00", "old-b"),
            ("c@x.com", "2025-01-01 00:00:00", ""),
        ],
        "email string, created_at string, note string",
    )
    incoming = spark.createDataFrame(
        [
            ("a@x.com", "2025-01-03 00:00:00", "new-a"),   # newer → replaces
            ("b@x.com", "2025-01-04 00:00:00", "new-b"),   # older → skipped
            ("c@x.com", "2025-01-01 00:00:00", "enrich"),  # tie → existing
            ("d@x.com", "2025-01-06 00:00:00", "new-d"),   # unmatched → added
        ],
        "email string, created_at string, note string",
    )
    return existing, incoming


def test_merge_prefer_newer(contacts):
    existing, incoming = contacts
    out = {
        r["email"]: (r["note"], r["src"])
        for r in R.merge_prefer_newer(existing, incoming, "email", "created_at").collect()
    }
    assert out == {
        "a@x.com": ("new-a", "incoming"),
        "b@x.com": ("old-b", "existing"),
        "c@x.com": ("", "existing"),  # equal ts → existing wins (merge.cpp:42-44 strict >)
        "d@x.com": ("new-d", "incoming"),
    }


def test_merge_prefer_existing_enriches_empty_note(contacts):
    existing, incoming = contacts
    out = {
        r["email"]: r["note"]
        for r in R.merge_prefer_existing(existing, incoming, "email", "note").collect()
    }
    # existing rows win; only c's empty note is enriched; d appended
    assert out == {
        "a@x.com": "old-a",
        "b@x.com": "old-b",
        "c@x.com": "enrich",
        "d@x.com": "new-d",
    }


def test_anti_probe_or_keys(spark):
    existing = spark.createDataFrame(
        [("a@x.com", "+111"), ("b@x.com", "+222")], "email string, phone string"
    )
    incoming = spark.createDataFrame(
        [
            ("a@x.com", "+999"),  # email dup → skipped
            ("n@x.com", "+222"),  # phone dup → skipped
            ("n2@x.com", "+333"),  # fresh → kept
        ],
        "email string, phone string",
    )
    kept = R.anti_probe(incoming, existing, ["email", "phone"]).collect()
    assert [(r["email"], r["phone"]) for r in kept] == [("n2@x.com", "+333")]


def test_diff_by_key_classes(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "k int, v string")
    b = spark.createDataFrame([(2, "y"), (3, "zz"), (4, "w")], "k int, v string")
    out = {r["k"]: r["diff_class"] for r in R.diff_by_key(a, b, "k", ["v"]).collect()}
    assert out == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_set_difference(spark):
    a = spark.createDataFrame([(1,), (2,), (2,), (3,)], "k int")
    b = spark.createDataFrame([(3,), (4,)], "k int")
    assert sorted(r["k"] for r in R.set_difference(a, b).collect()) == [1, 2]


def test_merge_edit_history_appends_and_unions_tags(spark):
    """Nested audit trail (reference src/model.hpp:8-27,
    src/storage.cpp:139,187): edit appends an 'edited' entry to the
    EXISTING history, new keys get 'created', untouched keys keep
    their history; tags union sorted on edit."""
    from acxspark.operators.relational import merge_edit_history

    hist_t = "array<struct<timestamp:string,user:string,action:string>>"
    existing = spark.createDataFrame(
        [
            ("a", "2025-01-01", ["crm"],
             [("2025-01-01", "import", "created")]),
            ("b", "2025-01-01", ["old"],
             [("2025-01-01", "import", "created")]),
        ],
        f"id string, updated_at string, tags array<string>, history {hist_t}",
    )
    incoming = spark.createDataFrame(
        [
            ("a", "2025-06-01", ["delta"], []),   # newer -> edited
            ("b", "2024-06-01", ["x"], []),       # older -> existing wins
            ("c", "2025-06-01", ["fresh"], []),   # new -> created
        ],
        f"id string, updated_at string, tags array<string>, history {hist_t}",
    )
    out = {r["id"]: r for r in
           merge_edit_history(existing, incoming, "id", "updated_at").collect()}
    a = out["a"]
    assert a["src"] == "incoming"
    assert [h["action"] for h in a["history"]] == ["created", "edited"]
    assert a["history"][1]["timestamp"] == "2025-06-01"
    assert a["tags"] == ["crm", "delta"]
    b = out["b"]
    assert b["src"] == "existing"
    assert [h["action"] for h in b["history"]] == ["created"]
    assert b["tags"] == ["old"]
    c = out["c"]
    assert c["src"] == "incoming"
    assert [h["action"] for h in c["history"]] == ["created"]
    assert c["tags"] == ["fresh"]


def test_merge_edit_history_preserves_null_key_existing_rows(spark):
    """A present existing row whose key is NULL must pass through
    unchanged (presence markers, not key-null tests — the full-outer
    'new row' branch used to wipe it to NULL columns)."""
    from acxspark.io_paths import CONTACT_FULL_SCHEMA
    from acxspark.operators.relational import merge_edit_history

    cols = [f.name for f in CONTACT_FULL_SCHEMA.fields]
    mk = lambda **kw: tuple(kw.get(c) for c in cols)  # noqa: E731
    existing = spark.createDataFrame(
        [mk(id=None, name="NoId", email="n@x.com", created_at="2026-01-01"),
         mk(id="1", name="Ada", email="a@x.com", created_at="2026-01-01")],
        CONTACT_FULL_SCHEMA,
    )
    incoming = spark.createDataFrame(
        [mk(id="1", name="Ada II", email="a@x.com", created_at="2027-01-01")],
        CONTACT_FULL_SCHEMA,
    )
    out = {r["name"]: r for r in
           merge_edit_history(existing, incoming, "id", "created_at").collect()}
    assert set(out) == {"NoId", "Ada II"}
    assert out["NoId"]["email"] == "n@x.com"      # data intact
    assert out["NoId"]["src"] == "existing"


def test_merge_dedupes_duplicate_incoming_keys(spark):
    """Duplicated keys in one incoming batch must not fan the matched
    existing row out through the join — newest ts wins among dups
    (the reference's sequential loop applies each in turn)."""
    from acxspark.operators.relational import merge_prefer_newer

    existing = spark.createDataFrame(
        [("1", "Old", "2026-01-01")], ["id", "name", "created_at"]
    )
    incoming = spark.createDataFrame(
        [("1", "Mid", "2026-06-01"), ("1", "New", "2027-01-01")],
        ["id", "name", "created_at"],
    )
    rows = merge_prefer_newer(existing, incoming, "id", "created_at").collect()
    assert len(rows) == 1
    assert rows[0]["name"] == "New"
