"""Golden-vector parity tests for the scalar layer.

Vectors derived by executing the reference semantics by hand
(reference src/validation.cpp, src/policy.cpp:22-59,
src/cli.cpp:232-252) — the analog of the reference's micro unit tests
(reference tests/test_validation.cpp:1-10, tests/test_phone.cpp:1-13).
"""

import pyspark.sql.functions as F
import pytest

from acxspark.functions import mask, normalize, validate


def _run(spark, col_fn, values):
    df = spark.createDataFrame([(v,) for v in values], ["x"])
    return [r[0] for r in df.select(col_fn(F.col("x"))).collect()]


# ---- normalize -------------------------------------------------------

def test_norm_email(spark):
    assert _run(spark, normalize.norm_email, ["  John.Doe@EXAMPLE.com "]) == [
        "john.doe@example.com"
    ]


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("+52 555 000 0000", "+525550000000"),   # already international
        ("5551234567", "+15551234567"),          # >=10 digits → US default
        ("(415) 000 0000", "+14150000000"),
        ("12345", "12345"),                      # too short → digits only
        ("", ""),
        ("abc", ""),                             # no digits
    ],
)
def test_normalize_phone(spark, raw, expected):
    # reference src/validation.cpp:71-89
    assert _run(spark, normalize.normalize_phone, [raw]) == [expected]


def test_normalize_phone_mx(spark):
    got = _run(spark, lambda c: normalize.normalize_phone(c, "MX"), ["5512345678"])
    assert got == ["+525512345678"]


def test_canonical_text(spark):
    assert _run(spark, normalize.canonical_text, ["  Foo\t\tBAR  baz\n"]) == [
        "foo bar baz"
    ]


# ---- validate --------------------------------------------------------

@pytest.mark.parametrize(
    "name,ok",
    [
        ("Jo", True),
        ("J", False),
        ("Mary-Ann O'Neil", True),
        ("R2D2", False),          # digits disallowed
        ("a ", False),            # only 1 letter
        ("--", False),            # 0 letters
    ],
)
def test_is_valid_name(spark, name, ok):
    # reference src/validation.cpp:19-28
    assert _run(spark, validate.is_valid_name, [name]) == [ok]


@pytest.mark.parametrize(
    "email,ok",
    [
        ("a@b.co", True),
        ("a.b+c_d%e@x-y.z.org", True),
        ("bad@@co", False),
        ("no-at.example.com", False),
        ("a@b.c", False),  # TLD must be >=2
    ],
)
def test_is_valid_email(spark, email, ok):
    assert _run(spark, validate.is_valid_email, [email]) == [ok]


def test_email_like_is_search_not_match(spark):
    # reference src/cli.cpp:232-235 uses regex_search
    assert _run(spark, validate.is_email_like, ["contact me at a@b.co please"]) == [True]
    assert _run(spark, validate.is_valid_email, ["contact me at a@b.co please"]) == [False]


def test_is_valid_phone(spark):
    assert _run(spark, validate.is_valid_phone, ["415-000-0000"]) == [True]
    assert _run(spark, validate.is_valid_phone, ["12345"]) == [False]


def test_record_valid(spark):
    df = spark.createDataFrame(
        [("Ann", "a@b.co"), ("Ann", None), ("", "a@b.co"), ("Bob", "nope")],
        ["name", "email"],
    )
    got = [r[0] for r in df.select(validate.record_valid("name", "email")).collect()]
    assert got == [True, True, False, False]


# ---- mask ------------------------------------------------------------

def test_mask_email_policy(spark):
    # reference src/policy.cpp:36-44
    vals = ["john.doe@example.com", "x@y.z", "noat", "@lead.com"]
    assert _run(spark, mask.mask_email_policy, vals) == [
        "j*******@example.com",
        "x@y.z",
        "noat",
        "@lead.com",
    ]


def test_mask_email_redact(spark):
    # reference src/cli.cpp:236-244
    vals = ["john.doe@example.com", "ab@x.co", "a@x.co", "noat"]
    assert _run(spark, mask.mask_email_redact, vals) == [
        "j******e@example.com",
        "**@x.co",
        "*@x.co",
        "****",
    ]


def test_mask_phone_policy(spark):
    # reference src/policy.cpp:45-59
    vals = ["+1 (415) 555-0133", "123", "5551234"]
    assert _run(spark, mask.mask_phone_policy, vals) == [
        "+xxxxxxx0133",
        "123",
        "xxx1234",
    ]


def test_mask_phone_redact(spark):
    # reference src/cli.cpp:245-252
    assert _run(spark, mask.mask_phone_redact, ["+1 (415) 555-0133"]) == [
        "+* (***) ***-****"
    ]


def test_mask_name(spark):
    # reference src/policy.cpp:22-35 — only the FIRST alpha overall kept
    assert _run(spark, mask.mask_name, ["John Doe", "x", "2fast"]) == [
        "J*** ***",
        "x",
        "2f***",
    ]


def test_word_count_adjacent_repeats(spark):
    """Token-equality counting: adjacent repeated stopwords must each
    count (the padded-replace trick consumed the shared delimiter and
    undercounted 'the the the' as 2)."""
    from acxspark.functions.text import _word_count

    df = spark.createDataFrame(
        [("the the the",), ("the cat the",), ("",), ("theater the",)],
        ["t"],
    )
    got = [r["c"] for r in df.select(_word_count(F.col("t"), "the")
                                     .alias("c")).collect()]
    assert got == [3.0, 2.0, 0.0, 1.0]
