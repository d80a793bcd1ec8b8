"""Redact-stage tests: both reference mask families applied to typed
fields, plus free-text scrubbing."""

from __future__ import annotations

from acxspark.plans.redact import redact_fields, scrub_text


def test_redact_fields_policy_vs_redact_variants(spark):
    df = spark.createDataFrame(
        [("Jo Ann", "joann@x.com", "+1 415 555 0199")],
        "name string, email string, phone string",
    )
    kinds = {"name": "name", "email": "email", "phone": "phone"}
    pol = redact_fields(df, kinds, "policy").collect()[0]
    red = redact_fields(df, kinds, "redact").collect()[0]
    # policy email mask: first char + stars + @domain (policy.cpp:36-44)
    assert pol["email"] == "j****@x.com"
    # redact email mask: first + stars + last of local (cli.cpp:236-244)
    assert red["email"] == "j***n@x.com"
    # policy phone: keep +/digits, x all but last 4 (policy.cpp:45-59)
    assert pol["phone"] == "+xxxxxxx0199"
    # redact phone: star digits, keep punctuation (cli.cpp:245-252)
    assert red["phone"] == "+* *** *** ****"
    # name mask: ONLY the first alpha of the whole string is kept —
    # the reference's `first` flag never resets (policy.cpp:22-35)
    assert pol["name"] == "J* ***"


def test_scrub_text_placeholders(spark):
    df = spark.createDataFrame(
        [
            ("write to bob.smith@corp.example.com today",),
            ("call +1 (415) 555-0199 now",),
            ("no pii here",),
        ],
        "text string",
    )
    out = [r["text"] for r in scrub_text(df).collect()]
    assert out[0] == "write to [EMAIL] today"
    assert out[1] == "call [PHONE] now"
    assert out[2] == "no pii here"
