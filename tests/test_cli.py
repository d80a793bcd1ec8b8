"""``python -m acxspark`` CLI parity tests.

The dedupe test is a golden twin: the reference's acx_dedupe_cmd loop
(src/cli.cpp:289-308) re-implemented verbatim in pure Python runs over
the same fixture, and the CLI's output lines must match it exactly
(same surviving lines, same order).
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

import pytest

from acxspark.__main__ import main


def run_cli(spark, capsys, *argv) -> tuple[int, list[dict]]:
    rc = main(list(argv), spark=spark)
    out = capsys.readouterr().out.strip().splitlines()
    return rc, [json.loads(l) for l in out if l.startswith("{")]


CONTACTS = [
    {"id": "3", "name": "  Ada  ", "email": "Ada@Example.COM",
     "phone": "+1 (555) 010-0001", "note": "reach me at ada@example.com",
     "created_at": "2026-01-03T00:00:00Z"},
    {"id": "1", "name": "Bob", "email": "bob@example.com",
     "phone": "555-0002", "note": "", "created_at": "2026-01-01T00:00:00Z"},
    {"id": "2", "name": "Ada Clone", "email": "Ada@Example.COM",
     "phone": "", "note": "dup of 3 by email",
     "created_at": "2026-01-02T00:00:00Z"},
    {"id": "4", "name": "", "email": None, "phone": "555-0004",
     "note": "no email", "created_at": "2026-01-04T00:00:00Z"},
]


@pytest.fixture()
def contacts_jsonl(tmp_path: Path) -> Path:
    p = tmp_path / "contacts.jsonl"
    lines = [json.dumps(c) for c in CONTACTS]
    lines.insert(2, "{this is not json")     # unparseable — always kept
    lines.insert(3, "")                      # empty — skipped entirely
    lines.append("{this is not json")        # identical corrupt — kept too
    lines.append(json.dumps(CONTACTS[1]))    # exact dup line (email key)
    p.write_text("\n".join(lines) + "\n")
    return p


def reference_dedupe(lines: list[str], key: str = "email") -> list[str]:
    """Pure-python twin of src/cli.cpp:289-308."""
    seen: set[str] = set()
    out = []
    for line in lines:
        if not line:
            continue
        try:
            j = json.loads(line)
            v = j.get(key) if isinstance(j, dict) else None
            k = v if isinstance(v, str) else line
            if k not in seen:
                seen.add(k)
                out.append(line)
        except ValueError:
            out.append(line)
    return out


def _read_text_dir(d: str) -> list[str]:
    parts = sorted(Path(d).glob("part-*"))
    lines: list[str] = []
    for p in parts:
        lines += p.read_text().splitlines()
    return lines


def test_dedupe_matches_reference_loop(spark, capsys, contacts_jsonl, tmp_path):
    out = str(tmp_path / "deduped")
    rc, msgs = run_cli(spark, capsys, "dedupe", str(contacts_jsonl),
                       "--out", out)
    assert rc == 0
    want = reference_dedupe(contacts_jsonl.read_text().splitlines())
    got = _read_text_dir(out)
    assert got == want
    assert msgs[-1]["kept"] == len(want)
    assert msgs[-1]["dropped"] == 2  # email dup of Ada + exact dup line


def test_validate_counts(spark, capsys, contacts_jsonl):
    rc, msgs = run_cli(spark, capsys, "validate", str(contacts_jsonl))
    assert rc == 0
    m = msgs[-1]
    # 6 parsed + 2 corrupt = 8 records (empty line skipped by the scan)
    assert m["total"] == m["valid"] + m["invalid"]
    assert m["valid"] >= 3  # ada, bob, ada-clone have name+email


def test_normalize(spark, capsys, contacts_jsonl, tmp_path):
    out = str(tmp_path / "norm.jsonl")
    rc, msgs = run_cli(spark, capsys, "normalize", str(contacts_jsonl),
                       "--out", out)
    assert rc == 0
    rows = [json.loads(l) for l in _read_text_dir(out) if l]
    by_id = {r["id"]: r for r in rows if "id" in r}
    assert by_id["3"]["name"] == "Ada"
    assert by_id["3"]["email"] == "ada@example.com"
    assert by_id["3"]["phone"] == "+15550100001"


def test_phone_digits_keep_plus_reference_twin(spark):
    """Golden twin of the cli.cpp:374 char loop."""
    from pyspark.sql import functions as F

    from acxspark.functions.normalize import phone_digits_keep_plus

    def ref(s: str) -> str:
        o = ""
        for c in s:
            if c.isdigit() or (c == "+" and not o):
                o += c
        return o

    vecs = ["+1 (555) 010-0001", "555-0002", " +44 20 7946 0958", "++1",
            "1+2", "+", "", "ext. 42", "+-+7(8)9"]
    df = spark.createDataFrame([(v,) for v in vecs], ["p"])
    got = [r["o"] for r in
           df.select(phone_digits_keep_plus(F.col("p")).alias("o")).collect()]
    assert got == [ref(v) for v in vecs]


def test_report_and_diff(spark, capsys, contacts_jsonl, tmp_path):
    rc, msgs = run_cli(spark, capsys, "report", str(contacts_jsonl))
    assert rc == 0
    assert msgs[-1]["distinct_emails"] == 2  # Ada@Example.COM, bob@

    b = tmp_path / "b.jsonl"
    b.write_text(json.dumps({"id": "9", "email": "new@example.com"}) + "\n"
                 + json.dumps(CONTACTS[1]) + "\n")
    rc, msgs = run_cli(spark, capsys, "diff", str(contacts_jsonl), str(b))
    assert rc == 0
    assert msgs[-1] == {"added": 1, "removed": 1}  # +new@, -Ada@


def test_redact_and_scrub(spark, capsys, contacts_jsonl, tmp_path):
    out = str(tmp_path / "red.jsonl")
    rc, _ = run_cli(spark, capsys, "redact", str(contacts_jsonl),
                    "--out", out)
    assert rc == 0
    text = "\n".join(_read_text_dir(out))
    assert "bob@example.com" not in text

    out2 = str(tmp_path / "scrub.jsonl")
    rc, _ = run_cli(spark, capsys, "scrub", str(contacts_jsonl),
                    "--out", out2)
    assert rc == 0
    rows = [json.loads(l) for l in _read_text_dir(out2) if l]
    notes = {r.get("id"): r.get("note") for r in rows}
    assert "[EMAIL]" in notes["3"]


def test_sample_deterministic(spark, capsys, contacts_jsonl, tmp_path):
    outs = []
    for d in ("s1", "s2"):
        out = str(tmp_path / d)
        rc, _ = run_cli(spark, capsys, "sample", str(contacts_jsonl), "3",
                        "--out", out)
        assert rc == 0
        outs.append(sorted(_read_text_dir(out)))
    assert outs[0] == outs[1]
    assert len(outs[0]) == 3


def test_grep(spark, capsys, contacts_jsonl):
    rc, msgs = run_cli(spark, capsys, "grep", str(contacts_jsonl),
                       "Ada", "--fields", "name")
    assert rc == 0
    assert msgs[-1]["matches"] == 2


def test_merge_prefer_newer(spark, capsys, contacts_jsonl, tmp_path):
    newer = dict(CONTACTS[1], name="Bob II",
                 created_at="2027-01-01T00:00:00Z")
    b = tmp_path / "delta.jsonl"
    b.write_text(json.dumps(newer) + "\n")
    out = str(tmp_path / "merged")
    rc, msgs = run_cli(spark, capsys, "merge", str(contacts_jsonl), str(b),
                       "--out", out)
    assert rc == 0
    rows = [json.loads(l) for l in _read_text_dir(out) if l]
    names = {r.get("id"): r.get("name") for r in rows}
    assert names["1"] == "Bob II"


def test_export_csv_sorted(spark, capsys, contacts_jsonl, tmp_path):
    out = str(tmp_path / "export.csv")
    rc, msgs = run_cli(spark, capsys, "export", str(contacts_jsonl), out)
    assert rc == 0
    lines = [l for l in _read_text_dir(out) if l]
    ids = [l.split(",")[0] for l in lines if not l.startswith("id")]
    assert ids == sorted(ids)


def test_checksum_sign_verify(capsys, tmp_path, monkeypatch):
    f = tmp_path / "blob.bin"
    f.write_bytes(b"acx cli surface\n")
    monkeypatch.setenv("ACX_HMAC_KEY", "test-key")

    rc, msgs = run_cli(None, capsys, "checksum", str(f))
    assert rc == 0
    assert msgs[-1]["sha256"] == hashlib.sha256(f.read_bytes()).hexdigest()

    rc, msgs = run_cli(None, capsys, "sign", str(f))
    assert rc == 0
    sig = msgs[-1]["hmac_sha256"]

    rc, msgs = run_cli(None, capsys, "verify-file", str(f), sig)
    assert rc == 0 and msgs[-1]["ok"] is True

    rc, msgs = run_cli(None, capsys, "verify-file", str(f), "00" * 32)
    assert rc == 1 and msgs[-1]["ok"] is False


def test_add_edit_delete_lifecycle(spark, capsys, tmp_path):
    base = tmp_path / "book.jsonl"
    base.write_text(json.dumps(CONTACTS[1]) + "\n")
    audit = str(tmp_path / "audit.log")

    out1 = str(tmp_path / "v1")
    rc, msgs = run_cli(spark, capsys, "add", str(base), "--out", out1,
                       "--name", "Carol Jones",
                       "--email", "Carol@Example.com",
                       "--phone", "+1 555 010 0042", "--audit", audit)
    assert rc == 0
    new_id = msgs[-1]["created"]
    rows = [json.loads(l) for l in _read_text_dir(out1) if l]
    carol = next(r for r in rows if r["id"] == new_id)
    assert carol["email"] == "carol@example.com"        # lowercased
    assert carol["phone"].startswith("+")               # normalized
    assert carol["history"][0]["action"] == "created"

    # duplicate normalized email rejected (reference email_exists)
    rc, _ = run_cli(spark, capsys, "add", out1, "--out", str(tmp_path / "x"),
                    "--name", "Carol Two", "--email", "CAROL@example.com",
                    "--phone", "+1 555 010 0099", "--audit", audit)
    assert rc == 1

    # invalid name rejected
    rc, _ = run_cli(spark, capsys, "add", out1, "--out", str(tmp_path / "x"),
                    "--name", "X", "--email", "x@example.com",
                    "--phone", "+1 555 010 0098", "--audit", audit)
    assert rc == 1

    out2 = str(tmp_path / "v2")
    rc, _ = run_cli(spark, capsys, "edit", out1, "--out", out2,
                    "--id", new_id, "--name", "Carol J Smith",
                    "--audit", audit)
    assert rc == 0
    rows = [json.loads(l) for l in _read_text_dir(out2) if l]
    carol = next(r for r in rows if r["id"] == new_id)
    assert carol["name"] == "Carol J Smith"
    assert [h["action"] for h in carol["history"]] == ["created", "updated"]

    out3 = str(tmp_path / "v3")
    rc, _ = run_cli(spark, capsys, "delete", out2, "--out", out3,
                    "--id", new_id, "--audit", audit)
    assert rc == 1  # no --yes
    rc, _ = run_cli(spark, capsys, "delete", out2, "--out", out3,
                    "--id", new_id, "--yes", "--audit", audit)
    assert rc == 0
    rows = [json.loads(l) for l in _read_text_dir(out3) if l]
    assert all(r["id"] != new_id for r in rows)

    actions = [l.split(",")[1] for l in
               Path(audit).read_text().splitlines()]
    assert actions == ["CREATE", "UPDATE", "DELETE"]


def test_search_conjunctive(spark, capsys, contacts_jsonl):
    rc, msgs = run_cli(spark, capsys, "search", str(contacts_jsonl),
                       "--name", "ada", "--email", "ADA@")
    assert rc == 0
    assert msgs[-1]["matches"] == 2  # Ada + Ada Clone (ci substrings AND)
    rc, msgs = run_cli(spark, capsys, "search", str(contacts_jsonl),
                       "--name", "ada", "--id", "3")
    assert msgs[-1]["matches"] == 1


def test_prune_before(spark, capsys, contacts_jsonl, tmp_path):
    rc, msgs = run_cli(spark, capsys, "prune", str(contacts_jsonl),
                       "--before", "2026-01-03", "--dry-run")
    assert rc == 0
    # removed: bob (01-01), ada-clone (01-02), bob dup line, and the
    # two corrupt rows (created_at "" < cut, reference model semantics)
    assert msgs[-1]["would_remove"] == 5
    out = str(tmp_path / "pruned")
    rc, msgs = run_cli(spark, capsys, "prune", str(contacts_jsonl),
                       "--before", "2026-01-03", "--out", out)
    assert rc == 0 and msgs[-1]["removed"] == 5


def test_keygen_encrypt_decrypt_roundtrip(capsys, tmp_path):
    rc, msgs = run_cli(None, capsys, "keygen")
    assert rc == 0
    key = msgs[-1]["key_hex"]
    assert len(key) == 64

    src = tmp_path / "plain.jsonl"
    src.write_bytes(b'{"id":"1"}\n' * 10)
    enc, dec = str(tmp_path / "c.acxeg"), str(tmp_path / "plain2.jsonl")
    rc, _ = run_cli(None, capsys, "encrypt", str(src), enc, "--key", key)
    assert rc == 0
    assert Path(enc).read_bytes()[:6] != src.read_bytes()[:6]
    rc, _ = run_cli(None, capsys, "decrypt", enc, dec, "--key", key)
    assert rc == 0
    assert Path(dec).read_bytes() == src.read_bytes()


def test_schema_and_list(spark, capsys, contacts_jsonl):
    rc, msgs = run_cli(None, capsys, "schema")
    assert rc == 0 and "email" in json.dumps(msgs[-1])
    rc, _ = run_cli(spark, capsys, "list", str(contacts_jsonl),
                    "--limit", "2")
    assert rc == 0


def test_determinism_check(spark, capsys, contacts_jsonl):
    rc, msgs = run_cli(spark, capsys, "determinism-check",
                       str(contacts_jsonl))
    assert rc == 0 and msgs[-1]["deterministic"] is True


def test_selftest(spark, capsys):
    rc, msgs = run_cli(spark, capsys, "selftest", "--docs", "200")
    assert rc == 0
    v = msgs[-1]
    assert v["ok"] is True and v["deterministic"] is True
    assert v["recall"] >= 0.99


def test_dedupe_docs_pipeline(spark, capsys, tmp_path):
    docs = [{"url": f"http://ex.com/{i}", "text": f"unique page {i} " * 30}
            for i in range(8)]
    docs.append({"url": "http://ex.com/dup", "text": docs[0]["text"]})
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(json.dumps(d) for d in docs) + "\n")
    out = str(tmp_path / "survivors")
    rc, msgs = run_cli(spark, capsys, "dedupe-docs", str(p), "--out", out)
    assert rc == 0
    m = msgs[-1]
    assert m["docs"] == 9 and m["survivors"] == 8 and m["dropped"] == 1
