"""Compat pack: reference functions with no Spark builtin (SURVEY §2.7).

The reference implements these natively (statistical distributions via
statrs — /root/reference/src/planner/logical_expr.rs:317-326; WORD_STEM,
HMAC_*, base32, IEEE754, PARSE_DATA_SIZE —
/root/reference/src/planner/logical_expr.rs:329-505). Spark has no
builtins, so each is a vectorized pandas UDF over Arrow batches (the
fast Python path — never row-at-a-time). All math is from public
algorithms: erf-based normal CDF, Acklam's inverse-normal rational
approximation, Lentz continued-fraction incomplete beta, Porter
stemming, RFC 4648 base32, RFC 2104 HMAC.

`register_all(spark)` exposes every function to SQL under its
reference name, so Trino-flavored SQL text resolves verbatim.
"""

from __future__ import annotations

import base64 as _b64
import hmac as _hmac
import math
import re
import struct
import unicodedata
from datetime import datetime

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


# --------------------------------------------------------------------------
# pure-python math (shared by the UDFs and the oracle literal generator)
def normal_cdf(mean: float, sd: float, x: float) -> float:
    return 0.5 * (1.0 + math.erf((x - mean) / (sd * math.sqrt(2.0))))


def inverse_normal_cdf(mean: float, sd: float, p: float) -> float:
    """Acklam's rational approximation + one Halley refinement step."""
    if not 0.0 < p < 1.0:
        return float("nan")
    a = [-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00]
    b = [-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00]
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = math.sqrt(-2 * math.log(p))
        z = (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
        )
    elif p <= phigh:
        q = p - 0.5
        r = q * q
        z = (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / (
            ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1
        )
    else:
        q = math.sqrt(-2 * math.log(1 - p))
        z = -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
        )
    # Halley refinement against erf-based CDF
    e = 0.5 * math.erfc(-z / math.sqrt(2)) - p
    u = e * math.sqrt(2 * math.pi) * math.exp(z * z / 2)
    z = z - u / (1 + z * u / 2)
    return mean + sd * z


def _betacf(a: float, b: float, x: float) -> float:
    """Lentz continued fraction for the incomplete beta function."""
    MAXIT, EPS, FPMIN = 200, 3.0e-16, 1.0e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < EPS:
            break
    return h


def beta_cdf(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log(1.0 - x)
    )
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def inverse_beta_cdf(a: float, b: float, p: float) -> float:
    """Bisection + Newton on beta_cdf."""
    if p <= 0.0:
        return 0.0
    if p >= 1.0:
        return 1.0
    lo, hi = 0.0, 1.0
    x = 0.5
    for _ in range(100):
        fx = beta_cdf(a, b, x) - p
        if abs(fx) < 1e-14:
            break
        if fx > 0:
            hi = x
        else:
            lo = x
        x = (lo + hi) / 2
    return x


def t_cdf(df: float, x: float) -> float:
    """Student-t CDF via the incomplete beta relation."""
    if df <= 0:
        return float("nan")
    ib = beta_cdf(df / 2.0, 0.5, df / (df + x * x))
    return 1.0 - 0.5 * ib if x > 0 else 0.5 * ib


def t_pdf(df: float, x: float) -> float:
    if df <= 0:
        return float("nan")
    return math.exp(
        math.lgamma((df + 1) / 2.0)
        - math.lgamma(df / 2.0)
        - 0.5 * math.log(df * math.pi)
        - ((df + 1) / 2.0) * math.log(1.0 + x * x / df)
    )


def wilson_interval_lower(successes: int, trials: int, z: float) -> float:
    if trials == 0:
        return None  # reference returns NULL rather than dividing by zero
    p = successes / trials
    denom = 1 + z * z / trials
    center = p + z * z / (2 * trials)
    margin = z * math.sqrt(p * (1 - p) / trials + z * z / (4 * trials * trials))
    return (center - margin) / denom


def wilson_interval_upper(successes: int, trials: int, z: float) -> float:
    if trials == 0:
        return None
    p = successes / trials
    denom = 1 + z * z / trials
    center = p + z * z / (2 * trials)
    margin = z * math.sqrt(p * (1 - p) / trials + z * z / (4 * trials * trials))
    return (center + margin) / denom


# --------------------------------------------------------------------------
_VOWELS = "aeiou"


def _porter_light(word: str) -> str:
    """Compact Porter-style suffix stripper (step-1 rules), matching the
    common stemmer behavior on regular English inflections."""
    w = word.lower()
    if len(w) <= 3:
        return w
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s") and any(ch in _VOWELS for ch in w[:-1]):
        w = w[:-1]
    if w.endswith("eed"):
        if len(w) > 4:
            w = w[:-1]
    elif w.endswith("ed") and any(ch in _VOWELS for ch in w[:-2]):
        w = w[:-2]
        if w.endswith(("at", "bl", "iz")):
            w += "e"
    elif w.endswith("ing") and any(ch in _VOWELS for ch in w[:-3]):
        w = w[:-3]
        if w.endswith(("at", "bl", "iz")):
            w += "e"
    if w.endswith("y") and any(ch in _VOWELS for ch in w[:-1]):
        w = w[:-1] + "i"
    return w


_SIZE_RE = re.compile(r"^\s*([0-9.]+)\s*([kKmMgGtTpP]?)[bB]?\s*$")
_SIZE_MULT = {"": 1, "k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4, "p": 1024**5}


def parse_data_size(s: str) -> int | None:
    m = _SIZE_RE.match(s or "")
    if not m:
        return None
    return int(float(m.group(1)) * _SIZE_MULT[m.group(2).lower()])


def hmac_sha256(key: str, msg: str) -> str:
    return _hmac.new(key.encode(), msg.encode(), "sha256").hexdigest()


def hmac_md5(key: str, msg: str) -> str:
    return _hmac.new(key.encode(), msg.encode(), "md5").hexdigest()


def hmac_sha1(key: str, msg: str) -> str:
    return _hmac.new(key.encode(), msg.encode(), "sha1").hexdigest()


def hmac_sha512(key: str, msg: str) -> str:
    return _hmac.new(key.encode(), msg.encode(), "sha512").hexdigest()


def hamming_distance(a: str, b: str) -> int | None:
    """Count of differing positions; NULL on length mismatch (the
    reference returns None rather than erroring — filter.rs:3383-3394)."""
    if len(a) != len(b):
        return None
    return sum(1 for x, y in zip(a, b) if x != y)


def normalize_nfc(s: str) -> str:
    """Trino NORMALIZE(s) — reference always uses NFC (filter.rs:3507)."""
    return unicodedata.normalize("NFC", s)


# DATE_PARSE: MySQL-style %-patterns → Python strptime (same conversion
# table as the reference, filter.rs:3895-3913). %% placeholder keeps a
# literal percent from being rewritten by later rules.
_MYSQL_TO_PY = [("%c", "%m"), ("%e", "%d"), ("%h", "%I"), ("%k", "%H"),
                ("%l", "%I"), ("%i", "%M"), ("%s", "%S")]
# PARSE_DATETIME: Joda-style patterns incl. the single-letter forms
# the reference supports (filter.rs:3958-3976: M d H h). Converted in
# ONE regex pass (longest alternative first) so produced %-directives
# are never re-scanned — the reference's sequential .replace chain
# corrupts 'dd' ("%d" → "%%-d"); we keep the intended semantics.
_JODA_MAP = {"yyyy": "%Y", "yy": "%y", "MM": "%m", "M": "%m",
             "dd": "%d", "d": "%d", "HH": "%H", "H": "%H",
             "hh": "%I", "h": "%I", "mm": "%M", "SSS": "%f",
             "ss": "%S", "a": "%p"}
_JODA_RE = re.compile("|".join(["yyyy", "yy", "MM", "M", "dd", "d", "HH",
                                "hh", "H", "h", "mm", "SSS", "ss", "a"]))


def _convert_fmt(fmt: str, table: list[tuple[str, str]]) -> str:
    for src, dst in table:
        fmt = fmt.replace(src, dst)
    return fmt


def _strptime_or_none(s: str, fmt: str):
    try:
        return datetime.strptime(s, fmt)
    except (ValueError, TypeError):
        return None  # reference yields NULL on parse failure


def date_parse(s: str, fmt: str):
    return _strptime_or_none(s, _convert_fmt(fmt, _MYSQL_TO_PY))


def parse_datetime(s: str, fmt: str):
    return _strptime_or_none(s, _JODA_RE.sub(lambda m: _JODA_MAP[m.group()], fmt))


def json_parse_fn(s: str) -> str | None:
    """Validate; return the ORIGINAL string, NULL on invalid JSON
    (filter.rs JsonParse: serde validate then s.to_string())."""
    import json as _json

    try:
        _json.loads(s)
        return s
    except (ValueError, TypeError):
        return None


def json_format_fn(s: str) -> str | None:
    """Pretty-print with 2-space indent, NULL on invalid JSON
    (filter.rs JsonFormat: serde to_string_pretty)."""
    import json as _json

    try:
        return _json.dumps(_json.loads(s), indent=2, ensure_ascii=False)
    except (ValueError, TypeError):
        return None


def is_json_scalar_fn(s: str) -> bool | None:
    """False for unparseable input; scalar = not array/object
    (filter.rs IsJsonScalar)."""
    import json as _json

    try:
        v = _json.loads(s)
    except (ValueError, TypeError):
        return False
    return not isinstance(v, (dict, list))


def to_big_endian_64(x: int) -> bytes:
    return struct.pack(">q", x)


def from_big_endian_64(b: bytes) -> int:
    return struct.unpack(">q", b)[0]


def to_base32(s: str) -> str:
    return _b64.b32encode(s.encode()).decode()


def from_base32(s: str) -> str:
    return _b64.b32decode(s).decode()


def to_ieee754_64(x: float) -> int:
    """Big-endian IEEE-754 bit pattern of a double, as int64."""
    return struct.unpack(">q", struct.pack(">d", x))[0]


def from_ieee754_64(bits: int) -> float:
    return struct.unpack(">d", struct.pack(">q", bits))[0]


# --------------------------------------------------------------------------
# vectorized pandas UDF wrappers
def _wrap1(fn, out="double"):
    @pandas_udf(out)
    def udf(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else fn(v))

    return udf


def _null_in(*vals) -> bool:
    return any(v is None or (isinstance(v, float) and math.isnan(v)) for v in vals)


def _wrap3(fn):
    # float() coercion: Spark numeric literals can arrive as Decimal.
    # NULL/NaN args yield NULL (object dtype so Arrow emits null, not NaN),
    # matching the reference's nullable semantics.
    @pandas_udf("double")
    def udf(a: pd.Series, b: pd.Series, c: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if _null_in(x, y, z) else fn(float(x), float(y), float(z))
                for x, y, z in zip(a, b, c)
            ],
            dtype="object",
        )

    return udf


def _wrap2_str(fn, out="string"):
    @pandas_udf(out)
    def udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [None if x is None or y is None else fn(x, y) for x, y in zip(a, b)],
            dtype="object",
        )

    return udf


def _wrap2_num(fn):
    @pandas_udf("double")
    def udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if _null_in(x, y) else fn(float(x), float(y))
                for x, y in zip(a, b)
            ],
            dtype="object",
        )

    return udf


REGISTRY: dict[str, tuple] = {}


def register_all(spark: SparkSession) -> None:
    """Register every compat function for SQL + DataFrame use."""
    reg = spark.udf.register
    reg("normal_cdf", _wrap3(normal_cdf))
    reg("inverse_normal_cdf", _wrap3(inverse_normal_cdf))
    reg("beta_cdf", _wrap3(beta_cdf))
    reg("inverse_beta_cdf", _wrap3(inverse_beta_cdf))
    reg("t_cdf", _wrap2_num(t_cdf))
    reg("t_pdf", _wrap2_num(t_pdf))
    reg("wilson_interval_lower", _wrap3(wilson_interval_lower))
    reg("wilson_interval_upper", _wrap3(wilson_interval_upper))
    reg("word_stem", _wrap1(_porter_light, "string"))
    reg("parse_data_size", _wrap1(parse_data_size, "long"))
    reg("hmac_sha256", _wrap2_str(hmac_sha256))
    reg("hmac_md5", _wrap2_str(hmac_md5))
    reg("hmac_sha1", _wrap2_str(hmac_sha1))
    reg("hmac_sha512", _wrap2_str(hmac_sha512))
    reg("hamming_distance", _wrap2_str(hamming_distance, "long"))
    reg("normalize", _wrap1(normalize_nfc, "string"))
    reg("date_parse", _wrap2_str(date_parse, "timestamp"))
    reg("parse_datetime", _wrap2_str(parse_datetime, "timestamp"))
    reg("to_big_endian_64", _wrap1(to_big_endian_64, "binary"))
    reg("from_big_endian_64", _wrap1(from_big_endian_64, "long"))
    reg("json_parse", _wrap1(json_parse_fn, "string"))
    reg("json_format", _wrap1(json_format_fn, "string"))
    reg("is_json_scalar", _wrap1(is_json_scalar_fn, "boolean"))
    reg("to_base32", _wrap1(to_base32, "string"))
    reg("from_base32", _wrap1(from_base32, "string"))
    reg("to_ieee754_64", _wrap1(to_ieee754_64, "long"))
    reg("from_ieee754_64", _wrap1(from_ieee754_64, "double"))

    # SQL UDFs (Spark 4): Catalyst inlines the RETURN expression, so these
    # stay JVM-side/codegen — no Python round-trip. Semantics mirror the
    # reference exactly (NULL→NULL; IS_FINITE false on ±inf/NaN; TRUNCATE is
    # numeric toward-zero with ±inf/NaN passthrough —
    # /root/reference/src/physical/operators/filter.rs:1122, 2965, 2997).
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION is_finite(x DOUBLE) RETURNS BOOLEAN "
        "RETURN CASE WHEN x IS NULL THEN NULL "
        "ELSE NOT isnan(x) AND abs(x) <> double('Infinity') END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION is_infinite(x DOUBLE) RETURNS BOOLEAN "
        "RETURN CASE WHEN x IS NULL THEN NULL ELSE abs(x) = double('Infinity') END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION truncate(x DOUBLE) RETURNS DOUBLE "
        "RETURN CASE WHEN x IS NULL THEN NULL "
        "WHEN isnan(x) OR abs(x) = double('Infinity') THEN x "
        "ELSE x - x % 1.0D END"
    )
    # Trino date/time spellings. Reference DAY_OF_WEEK is Sunday=1
    # (num_days_from_sunday + 1, filter.rs:1799-1815) — identical to
    # Spark's dayofweek; YEAR_OF_WEEK is the ISO week-year
    # (filter.rs:3582); MILLISECOND is the 0-999 component
    # (filter.rs:3566); TIMEZONE_HOUR/MINUTE are constant 0 in the
    # reference (filter.rs:3605-3609).
    for name, expr in [
        ("day_of_week(x DATE) RETURNS INT", "CAST(dayofweek(x) AS INT)"),
        ("dow(x DATE) RETURNS INT", "CAST(dayofweek(x) AS INT)"),
        ("day_of_year(x DATE) RETURNS INT", "CAST(dayofyear(x) AS INT)"),
        ("doy(x DATE) RETURNS INT", "CAST(dayofyear(x) AS INT)"),
        ("week(x DATE) RETURNS INT", "CAST(weekofyear(x) AS INT)"),
        ("week_of_year(x DATE) RETURNS INT", "CAST(weekofyear(x) AS INT)"),
        ("year_of_week(x DATE) RETURNS INT", "CAST(extract(YEAROFWEEK FROM x) AS INT)"),
        (
            "millisecond(x TIMESTAMP) RETURNS INT",
            "CAST((unix_micros(x) % 1000000) DIV 1000 AS INT)",
        ),
        ("timezone_hour(x TIMESTAMP) RETURNS INT", "0"),
        ("timezone_minute(x TIMESTAMP) RETURNS INT", "0"),
        # AT_TIMEZONE converts a zone-local reading to UTC (micros -
        # offset, filter.rs:4055-4070) = convert_timezone(tz→UTC);
        # Spark's convert_timezone additionally handles IANA names the
        # reference passes through unchanged. WITH_TIMEZONE is a no-op
        # in the reference (returns the instant unchanged,
        # filter.rs:4077-4095) — mirrored.
        (
            "at_timezone(x TIMESTAMP, tz STRING) RETURNS TIMESTAMP",
            "convert_timezone(tz, 'UTC', x)",
        ),
        ("with_timezone(x TIMESTAMP, tz STRING) RETURNS TIMESTAMP", "x"),
        ("to_utf8(s STRING) RETURNS BINARY", "encode(s, 'UTF-8')"),
        ("from_utf8(b BINARY) RETURNS STRING", "decode(b, 'UTF-8')"),
        (
            # reference's own human-readable format (filter.rs:4003-4027)
            "human_readable_seconds(x DOUBLE) RETURNS STRING",
            "CASE WHEN x IS NULL THEN NULL "
            "WHEN x < 60 THEN format_string('%.2f seconds', x) "
            "WHEN x < 3600 THEN format_string('%.2f minutes', x / 60) "
            "WHEN x < 86400 THEN format_string('%.2f hours', x / 3600) "
            "ELSE format_string('%.2f days', x / 86400) END",
        ),
        # math constants / base conversion (logical_expr.rs:272-328)
        ("infinity() RETURNS DOUBLE", "double('Infinity')"),
        ("nan() RETURNS DOUBLE", "double('NaN')"),
        (
            "from_base(s STRING, r INT) RETURNS BIGINT",
            "CAST(conv(s, r, 10) AS BIGINT)",
        ),
        (
            "to_base(x BIGINT, r INT) RETURNS STRING",
            "lower(conv(CAST(x AS STRING), 10, r))",
        ),
        # bitwise scalar family (logical_expr.rs:468-477); Spark only has
        # operators (&, |, ^, ~) and shiftleft/shiftright builtins
        ("bitwise_and(a BIGINT, b BIGINT) RETURNS BIGINT", "a & b"),
        ("bitwise_or(a BIGINT, b BIGINT) RETURNS BIGINT", "a | b"),
        ("bitwise_xor(a BIGINT, b BIGINT) RETURNS BIGINT", "a ^ b"),
        ("bitwise_not(a BIGINT) RETURNS BIGINT", "~a"),
        (
            "bitwise_left_shift(a BIGINT, n INT) RETURNS BIGINT",
            "shiftleft(a, n)",
        ),
        (
            # reference BITWISE_RIGHT_SHIFT is LOGICAL (zero-fill):
            # `(lv as u64 >> rv) as i64` (filter.rs:4811)
            "bitwise_right_shift(a BIGINT, n INT) RETURNS BIGINT",
            "shiftrightunsigned(a, n)",
        ),
        (
            "bitwise_right_shift_arithmetic(a BIGINT, n INT) RETURNS BIGINT",
            "shiftright(a, n)",
        ),
        # Trino string spellings
        ("starts_with(s STRING, p STRING) RETURNS BOOLEAN", "startswith(s, p)"),
        ("ends_with(s STRING, p STRING) RETURNS BOOLEAN", "endswith(s, p)"),
        ("sha256(s STRING) RETURNS STRING", "sha2(s, 256)"),
        ("sha512(s STRING) RETURNS STRING", "sha2(s, 512)"),
        ("regexp_split(s STRING, p STRING) RETURNS ARRAY<STRING>", "split(s, p)"),
        # URL family (logical_expr.rs:478-486) over parse_url
        ("url_extract_host(u STRING) RETURNS STRING", "parse_url(u, 'HOST')"),
        ("url_extract_path(u STRING) RETURNS STRING", "parse_url(u, 'PATH')"),
        (
            "url_extract_protocol(u STRING) RETURNS STRING",
            "parse_url(u, 'PROTOCOL')",
        ),
        (
            # parse_url has no PORT key — take it from AUTHORITY
            "url_extract_port(u STRING) RETURNS BIGINT",
            "CAST(nullif(regexp_extract(parse_url(u, 'AUTHORITY'), "
            "':([0-9]+)$', 1), '') AS BIGINT)",
        ),
        ("url_extract_query(u STRING) RETURNS STRING", "parse_url(u, 'QUERY')"),
        ("url_extract_fragment(u STRING) RETURNS STRING", "parse_url(u, 'REF')"),
        (
            "url_extract_parameter(u STRING, k STRING) RETURNS STRING",
            "parse_url(u, 'QUERY', k)",
        ),
        # JSON family gaps (logical_expr.rs:491-505)
        (
            "json_array_get(j STRING, i BIGINT) RETURNS STRING",
            "get_json_object(j, concat('$[', CAST(i AS STRING), ']'))",
        ),
        (
            "json_array_contains(j STRING, v STRING) RETURNS BOOLEAN",
            "exists(from_json(j, 'array<string>'), x -> x = v)",
        ),
        (
            "json_size(j STRING, p STRING) RETURNS BIGINT",
            "CASE WHEN get_json_object(j, p) LIKE '[%' "
            "THEN CAST(json_array_length(get_json_object(j, p)) AS BIGINT) "
            "WHEN get_json_object(j, p) LIKE '{%' "
            "THEN CAST(size(json_object_keys(get_json_object(j, p))) AS BIGINT) "
            "WHEN get_json_object(j, p) IS NULL THEN NULL ELSE 0 END",
        ),
        # json_parse / json_format / is_json_scalar are pandas UDFs
        # (registered above) to mirror the reference's serde-exact
        # validate/pretty-print semantics.
    ]:
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name} RETURN {expr}")
