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


def test_scrub_text_does_not_mask_dates_or_ids(spark):
    """Negative cases for the phone detector: timestamps, ISO dates,
    invoice ids, versions, IPs, and long digit runs must survive
    (the old any-10+-digit-run pattern rewrote '2020-01-01 10:00:00'
    to '[PHONE]:00:00')."""
    cases = [
        "meeting on 2020-01-01 10:00:00 sharp",
        "shipped 2021-12-31, invoice INV-2024-00123",
        "release v1.2.3 on host 10.0.0.1",
        "order id 123456789012 confirmed",
        "range 1998-09-02 to 1998-12-01",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "text string")
    out = [r["text"] for r in scrub_text(df).collect()]
    assert out == cases


def test_scrub_text_phone_shapes(spark):
    """Positive cases: the three structural families all mask."""
    df = spark.createDataFrame(
        [
            ("intl +52 55 1234 5678 ok",),
            ("area (415) 555-0042 ok",),
            ("local 555-123456 ok",),
            ("nanp 555-867-5309 ok",),
            ("space 415 555 0199 ok",),
            ("e164 +15551234567 ok",),
        ],
        "text string",
    )
    out = [r["text"] for r in scrub_text(df).collect()]
    assert out == [f"{k} [PHONE] ok"
                   for k in ("intl", "area", "local", "nanp", "space", "e164")]


def test_mask_name_unicode(spark):
    """mask_name stars UNICODE letters (\\p{L}) — an ASCII-only class
    would pass non-Latin names through the redact stage unmasked."""
    from acxspark.functions.mask import mask_name
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("Ольга",), ("Éric",), ("  Ana",), ("1234",)], "name string"
    )
    out = [r["m"] for r in df.select(mask_name(F.col("name")).alias("m")).collect()]
    assert out == ["О****", "É***", "  A**", "1234"]
