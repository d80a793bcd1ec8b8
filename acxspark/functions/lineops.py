"""Line-faithful JSONL record transforms (the reference's text-loop
commands).

The reference's ``normalize`` and ``redact`` commands are LINE loops
over the jsonl file (src/cli.cpp:377-396 normalize, :329-352 redact):
a line that fails to parse — or parses to a non-object — passes
through VERBATIM; ``redact`` skips empty lines while ``normalize``
preserves them; a field is rewritten only when it exists AND is a
JSON string. The schema-projecting DataFrame path cannot express
"verbatim passthrough of unknown shapes" (a corrupt row forced
through the contact schema re-serializes as ``{}``), so these two
commands run on the raw text lines with an Arrow-batched pandas UDF —
this is the CLI's import/export parity surface, not the analytics hot
path (the distributed redact stage stays ``plans/redact.py``, pure
column expressions).

Serialization: the reference's ``J`` stores objects in a
``std::map`` (src/jsonl.hpp:11) so ``dump()`` emits keys SORTED,
compact (src/jsonl.cpp:29-63); :func:`dump_sorted_compact` mirrors
that (known divergences, both strict improvements: python ints keep
full precision where ``J`` goes through double; ``\\b``/``\\f`` use
the two-char escapes instead of ``\\u00XX``).

Field semantics mirror the reference helpers byte-for-byte on ASCII
(src/cli.cpp:370-374: C-locale ``isspace``/``tolower``; ``+`` kept
only as the first emitted char of a phone) — property-tested against
the column-expression implementations in functions/normalize.py.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_C_WHITESPACE = " \t\n\r\v\f"  # C isspace, default locale


def trim_ascii(s: str) -> str:
    """C-locale trim (src/cli.cpp:370-372)."""
    return s.strip(_C_WHITESPACE)


def lower_ascii(s: str) -> str:
    """Per-byte ASCII tolower (src/cli.cpp:373) — python's .lower()
    would also fold non-ASCII, which the reference never does."""
    return "".join(chr(ord(c) + 32) if "A" <= c <= "Z" else c for c in s)


def phone_digits_keep_plus_py(s: str) -> str:
    """src/cli.cpp:374: keep digits; keep ``+`` only when the OUTPUT
    is still empty (so any digit before it forfeits the plus)."""
    out: list[str] = []
    for c in s:
        if c.isdigit() and c.isascii():
            out.append(c)
        elif c == "+" and not out:
            out.append(c)
    return "".join(out)


def mask_email_redact_py(s: str) -> str:
    """src/cli.cpp:236-244 (twin of functions/mask.mask_email_redact)."""
    at = s.find("@")
    if at < 0:
        return "*" * len(s)
    local, dom = s[:at], s[at + 1:]
    n = len(local)
    masked = local[0] + "*" * (n - 2) + local[-1] if n > 2 else "*" * n
    return masked + "@" + dom


def mask_phone_redact_py(s: str) -> str:
    """src/cli.cpp:245-252: ``*`` every ASCII digit, keep the rest."""
    return "".join("*" if c.isdigit() and c.isascii() else c for c in s)


def dump_sorted_compact(obj) -> str:
    """The reference ``J::dump(0)``: sorted keys, no whitespace."""
    return json.dumps(obj, sort_keys=True, separators=(",", ":"),
                      ensure_ascii=False)


def _reject_constant(s: str):
    # python's json accepts the non-JSON extensions NaN/Infinity; the
    # reference's J::parse does not — such lines must take the
    # verbatim-passthrough branch, not be rewritten into invalid JSON
    raise ValueError(f"non-JSON constant {s}")


def strict_json_loads(line: str):
    """json.loads restricted to actual JSON (NaN/Infinity rejected),
    matching the reference parser's acceptance set."""
    return json.loads(line, parse_constant=_reject_constant)


def normalize_line(line: str) -> str:
    """One line of the reference normalize loop (src/cli.cpp:377-396).

    Empty lines and unparseable / non-object lines return verbatim;
    objects get name→trim, email→lower(trim), phone→digits(+) applied
    to STRING fields only, then re-dump sorted-compact.
    """
    if line == "":
        return line
    try:
        j = strict_json_loads(line)
    except ValueError:
        return line
    if not isinstance(j, dict):
        return line
    v = j.get("name")
    if isinstance(v, str):
        j["name"] = trim_ascii(v)
    v = j.get("email")
    if isinstance(v, str):
        j["email"] = lower_ascii(trim_ascii(v))
    v = j.get("phone")
    if isinstance(v, str):
        j["phone"] = phone_digits_keep_plus_py(v)
    return dump_sorted_compact(j)


def redact_line(line: str) -> str:
    """One line of the reference redact loop (src/cli.cpp:329-352):
    mask ``email``/``phone`` STRING fields, dump sorted-compact;
    anything else verbatim. (Empty-line SKIPPING is the caller's job —
    the reference ``continue``s before this point.)"""
    try:
        j = strict_json_loads(line)
    except ValueError:
        return line
    if not isinstance(j, dict):
        return line
    v = j.get("email")
    if isinstance(v, str):
        j["email"] = mask_email_redact_py(v)
    v = j.get("phone")
    if isinstance(v, str):
        j["phone"] = mask_phone_redact_py(v)
    return dump_sorted_compact(j)


@pandas_udf(T.StringType())
def normalize_lines(lines: pd.Series) -> pd.Series:
    return lines.map(normalize_line)


@pandas_udf(T.StringType())
def redact_lines(lines: pd.Series) -> pd.Series:
    return lines.map(redact_line)
