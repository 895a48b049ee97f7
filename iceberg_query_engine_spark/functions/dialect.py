"""Trino→Spark SQL dialect shim.

The reference speaks Trino-flavored SQL (sqlparser GenericDialect —
/root/reference/src/parser/mod.rs:14-29; Trino function surface per
/root/reference/README.md:234-267). Spark SQL overlaps heavily; this
shim is a small, documented set of textual rewrites for the remaining
spelling differences — not a parser fork. Functions with no Spark
builtin are provided by functions/compat.register_all, so translated
SQL resolves verbatim.
"""

from __future__ import annotations

import re

# (pattern, replacement) — applied in order, case-insensitive on the
# function name, outside of string literals kept simple: the corpus
# queries don't hide function names inside strings.
_RULES: list[tuple[re.Pattern, str]] = [
    # Trino DATE_ADD('unit', n, ts) → Spark timestampadd(unit, n, ts)
    (re.compile(r"\bDATE_ADD\s*\(\s*'(\w+)'\s*,", re.I), r"timestampadd(\1,"),
    # Trino DATE_DIFF('unit', a, b) → Spark timestampdiff(unit, a, b)
    (re.compile(r"\bDATE_DIFF\s*\(\s*'(\w+)'\s*,", re.I), r"timestampdiff(\1,"),
    (re.compile(r"\bAPPROX_DISTINCT\s*\(", re.I), "approx_count_distinct("),
    (re.compile(r"\bAPPROX_PERCENTILE\s*\(", re.I), "percentile_approx("),
    (re.compile(r"\bARBITRARY\s*\(", re.I), "any_value("),
    (re.compile(r"\bSTRPOS\s*\(", re.I), "instr("),
    (re.compile(r"\bCODEPOINT\s*\(", re.I), "ascii("),
    (re.compile(r"\bJSON_EXTRACT_SCALAR\s*\(", re.I), "get_json_object("),
    (re.compile(r"\bJSON_EXTRACT\s*\(", re.I), "get_json_object("),
    (re.compile(r"\bTO_UNIXTIME\s*\(", re.I), "unix_timestamp("),
    (re.compile(r"\bCARDINALITY\s*\(", re.I), "size("),
    # TRUNCATE / IS_FINITE / IS_INFINITE need no rewrite: compat.register_all
    # installs Catalyst-inlined SQL UDFs under those exact names (Spark's
    # trunc() is date truncation, not the reference's numeric x.trunc() —
    # /root/reference/src/physical/operators/filter.rs:1122, 2965, 2997).
    (re.compile(r"\bLEVENSHTEIN_DISTANCE\s*\(", re.I), "levenshtein("),
    (re.compile(r"\bTO_HEX\s*\(", re.I), "hex("),
    (re.compile(r"\bFROM_HEX\s*\(", re.I), "unhex("),
    (re.compile(r"\bTO_BASE64\s*\(", re.I), "base64("),
    (re.compile(r"\bFROM_BASE64\s*\(", re.I), "unbase64("),
    (re.compile(r"\bLAST_DAY_OF_MONTH\s*\(", re.I), "last_day("),
    (re.compile(r"\bFROM_ISO8601_DATE\s*\(", re.I), "to_date("),
    (re.compile(r"\bFROM_ISO8601_TIMESTAMP\s*\(", re.I), "to_timestamp("),
    (re.compile(r"\bIS_NAN\s*\(", re.I), "isnan("),
    (re.compile(r"\bBITWISE_AND\s*\(", re.I), "bitand("),
    (re.compile(r"\bBITWISE_OR\s*\(", re.I), "bitor("),
    (re.compile(r"\bBITWISE_XOR\s*\(", re.I), "bitxor("),
]


def translate(sql: str) -> str:
    """Apply the Trino→Spark rewrites."""
    out = sql
    for pat, repl in _RULES:
        out = pat.sub(repl, out)
    return out
