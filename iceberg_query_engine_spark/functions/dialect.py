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
    # BITWISE_AND/OR/XOR/NOT/shifts resolve via compat SQL UDFs under
    # their exact Trino names (Spark has only the &/|/^/~ operators).
    (re.compile(r"\bBITWISE_AND_AGG\s*\(", re.I), "bit_and("),
    (re.compile(r"\bBITWISE_OR_AGG\s*\(", re.I), "bit_or("),
    (re.compile(r"\bBITWISE_XOR_AGG\s*\(", re.I), "bit_xor("),
    (re.compile(r"\bJSON_KEYS\s*\(", re.I), "json_object_keys("),
    # Trino 2-arg REGEXP_EXTRACT[_ALL] returns the WHOLE match (group
    # 0); Spark defaults idx to 1 and errors when the pattern has no
    # group — add the explicit 0 for the simple two-literal-arg form
    (re.compile(
        r"\bREGEXP_EXTRACT(_ALL)?\s*\(\s*([^,()]+?)\s*,\s*('(?:[^'])*')\s*\)",
        re.I),
     r"regexp_extract\1(\2, \3, 0)"),
    # Trino FORMAT is printf-style = Spark format_string; \b cannot
    # match inside DATE_FORMAT/FORMAT_NUMBER (underscore is a word char)
    (re.compile(r"\bFORMAT\s*\(", re.I), "format_string("),
]

# aggregate composites (no Spark UDAF needed). Rewritten with a
# balanced-paren scan so nested calls (GEOMETRIC_MEAN(abs(x))) work.
# Reference CHECKSUM XORs the RAW integer values (hash_agg.rs:1630,
# 2184), not hashes of them.
_CALL_TEMPLATES: list[tuple[re.Pattern, str]] = [
    (re.compile(r"\bGEOMETRIC_MEAN\s*\(", re.I), "exp(avg(ln({0})))"),
    (re.compile(r"\bCHECKSUM\s*\(", re.I), "bit_xor(CAST({0} AS BIGINT))"),
]


def _balanced_arg(sql: str, open_idx: int) -> int | None:
    """Index of the ')' matching the '(' at open_idx, skipping nested
    parens and single-quoted string literals; None if unbalanced."""
    depth, i, n = 0, open_idx, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":  # skip string literal ('' = escaped quote)
            i += 1
            while i < n:
                if sql[i] == "'":
                    if i + 1 < n and sql[i + 1] == "'":
                        i += 2
                        continue
                    break
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    return None


def _rewrite_calls(sql: str) -> str:
    for pat, template in _CALL_TEMPLATES:
        pos = 0
        while True:
            m = pat.search(sql, pos)
            if not m:
                break
            # inside a string literal iff an odd number of quotes precede
            # ('' escapes add two, preserving parity)
            if sql.count("'", 0, m.start()) % 2 == 1:
                pos = m.end()
                continue
            close = _balanced_arg(sql, m.end() - 1)
            if close is None:
                break
            arg = sql[m.end() : close].strip()
            sql = sql[: m.start()] + template.format(arg) + sql[close + 1 :]
    return sql

# Trino/MySQL DATE_FORMAT %-codes → Spark (Java) datetime patterns;
# applied only when the literal format contains '%' so Spark-style
# patterns pass through untouched (reference DATE_FORMAT is the MySQL
# dialect — filter.rs DateFormat; Spark's is Java SimpleDateFormat).
_PCT_TO_JAVA = {"%Y": "yyyy", "%y": "yy", "%m": "MM", "%c": "M",
                "%d": "dd", "%e": "d", "%H": "HH", "%k": "H",
                "%h": "hh", "%I": "hh", "%i": "mm", "%s": "ss",
                "%S": "ss", "%f": "SSSSSS", "%T": "HH:mm:ss",
                "%p": "a", "%W": "EEEE", "%a": "EEE", "%b": "MMM",
                "%M": "MMMM", "%j": "DDD", "%%": "%"}
_DATE_FORMAT_RE = re.compile(r"\b(DATE_FORMAT\s*\(.*?,\s*)'([^']*%[^']*)'", re.I)


def _convert_date_format(m: re.Match) -> str:
    """MySQL %-format → Java pattern, single-quoting literal text so
    letters outside %-codes (e.g. the ISO-8601 'T') stay literal
    instead of being read as Java pattern letters."""
    fmt, out, lit = m.group(2), [], []

    def flush():
        if lit:
            run = "".join(lit)
            if any(c.isalpha() or c == "'" for c in run):
                run = "'" + run.replace("'", "''") + "'"
            out.append(run)
            lit.clear()

    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt) and fmt[i : i + 2] in _PCT_TO_JAVA:
            flush()
            out.append(_PCT_TO_JAVA[fmt[i : i + 2]])
            i += 2
        else:
            lit.append(fmt[i])
            i += 1
    flush()
    # the Java pattern may itself contain single quotes (literal-text
    # quoting); double them for embedding in the SQL string literal
    pattern = "".join(out).replace("'", "''")
    return f"{m.group(1)}'{pattern}'"


def translate(sql: str) -> str:
    """Apply the Trino→Spark rewrites."""
    out = sql
    for pat, repl in _RULES:
        out = pat.sub(repl, out)
    out = _rewrite_calls(out)
    return _DATE_FORMAT_RE.sub(_convert_date_format, out)
