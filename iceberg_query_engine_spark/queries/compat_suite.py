"""Oracle suite for the compat function pack (functions/compat.py).

Inputs derive deterministically from nation keys; expected values are
computed at import time by the SAME pure-Python implementations the
pandas UDFs execute, embedded as literal VALUES — the oracle therefore
checks the full Spark plumbing (Arrow batch transfer, UDF execution,
null handling) produces bit-identical doubles.
"""

from __future__ import annotations

import unicodedata
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import compat
from .tpch import tables

WORDS = ["running", "flies", "caresses", "ponies", "agreed", "plastered",
         "motoring", "sing", "conflated", "happy", "tables", "relational"]
SIZES = ["1KB", "2.5MB", "17GB", "0.5TB", "123", "9PB"]


def compat_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-distribution functions over nation-derived inputs."""
    compat.register_all(spark)
    (nation,) = tables(spark, sf_dir, "nation")
    base = nation.select(
        "n_nationkey",
        ((F.col("n_nationkey") + 1) / 26.0).alias("p"),
        (F.col("n_nationkey") - 12.0).alias("x"),
    )
    return base.selectExpr(
        "n_nationkey",
        "normal_cdf(0.0, 5.0, x) AS ncdf",
        "inverse_normal_cdf(0.0, 1.0, p) AS incdf",
        "beta_cdf(2.0, 3.0, p) AS bcdf",
        "inverse_beta_cdf(2.0, 3.0, p) AS ibcdf",
        "t_cdf(5.0, x / 4) AS tcdf",
        "t_pdf(5.0, x / 4) AS tpdf",
        "wilson_interval_lower(CAST(n_nationkey + 1 AS DOUBLE), 30.0, 1.96) AS wl",
        "wilson_interval_upper(CAST(n_nationkey + 1 AS DOUBLE), 30.0, 1.96) AS wu",
    ).orderBy("n_nationkey")


def _stats_oracle() -> str:
    rows = []
    for k in range(25):
        p = (k + 1) / 26.0
        x = k - 12.0
        rows.append(
            # string→double cast: DuckDB parses bare numeric literals as
            # DECIMAL whose double conversion is not correctly rounded
            ("({0}, CAST('{1!r}' AS DOUBLE), CAST('{2!r}' AS DOUBLE), "
             "CAST('{3!r}' AS DOUBLE), CAST('{4!r}' AS DOUBLE), CAST('{5!r}' AS DOUBLE), "
             "CAST('{6!r}' AS DOUBLE), CAST('{7!r}' AS DOUBLE), CAST('{8!r}' AS DOUBLE))").format(
                k,
                compat.normal_cdf(0.0, 5.0, x),
                compat.inverse_normal_cdf(0.0, 1.0, p),
                compat.beta_cdf(2.0, 3.0, p),
                compat.inverse_beta_cdf(2.0, 3.0, p),
                compat.t_cdf(5.0, x / 4),
                compat.t_pdf(5.0, x / 4),
                compat.wilson_interval_lower(k + 1.0, 30.0, 1.96),
                compat.wilson_interval_upper(k + 1.0, 30.0, 1.96),
            )
        )
    return (
        "SELECT * FROM (VALUES {0}) AS t(n_nationkey, ncdf, incdf, bcdf, ibcdf, "
        "tcdf, tpdf, wl, wu) ORDER BY n_nationkey".format(",".join(rows))
    )


def compat_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stemmer / encodings / HMAC / data-size / IEEE754 round-trips."""
    compat.register_all(spark)
    words = spark.createDataFrame(
        [(i, w, SIZES[i % len(SIZES)]) for i, w in enumerate(WORDS)],
        ["id", "word", "size_str"],
    )
    return words.selectExpr(
        "id",
        "word_stem(word) AS stem",
        "parse_data_size(size_str) AS bytes",
        "hmac_sha256('key', word) AS mac",
        "to_base32(word) AS b32",
        "from_base32(to_base32(word)) AS b32rt",
        "to_ieee754_64(CAST(id AS DOUBLE) / 7) AS bits",
        "from_ieee754_64(to_ieee754_64(CAST(id AS DOUBLE) / 7)) AS bits_rt",
    ).orderBy("id")


def _strings_oracle() -> str:
    rows = []
    for i, w in enumerate(WORDS):
        rows.append(
            "({0}, '{1}', {2}, '{3}', '{4}', '{5}', {6}, CAST('{7!r}' AS DOUBLE))".format(
                i,
                compat._porter_light(w),
                compat.parse_data_size(SIZES[i % len(SIZES)]),
                compat.hmac_sha256("key", w),
                compat.to_base32(w),
                w,
                compat.to_ieee754_64(i / 7),
                i / 7,
            )
        )
    return (
        "SELECT * FROM (VALUES {0}) AS t(id, stem, bytes, mac, b32, b32rt, "
        "bits, bits_rt) ORDER BY id".format(",".join(rows))
    )


def _luhn(s: str) -> bool:
    """Standard Luhn mod-10 (public algorithm; mirrors Spark's builtin
    luhn_check and the reference's luhn_check — filter.rs:3491)."""
    if not s.isdigit():
        return False
    total = 0
    for i, ch in enumerate(reversed(s)):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


# deterministic inputs for compat_strings2
PAIRS = [("karolin", "kathrin"), ("toned", "roses"), ("AFRICA", "AMERIKA"),
         ("spark", "spore"), ("abcde", "abcde"), ("short", "longerstr")]
DIGITS = ["79927398713", "4539578763621486", "1234567812345670",
          "1234567812345678", "0", "59"]
DECOMPOSED = "e\u0301clair"  # e + combining acute; NFC -> precomposed


def compat_strings2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming / NFC normalize / Luhn / SHA-512 / HMAC family /
    UTF-8 + big-endian roundtrips / human-readable seconds / typeof."""
    compat.register_all(spark)
    rows = [
        (i, a, b, DIGITS[i % len(DIGITS)], i * 987.3 + 7.01)
        for i, (a, b) in enumerate(PAIRS)
    ]
    df = spark.createDataFrame(rows, ["id", "s1", "s2", "digits", "secs"])
    return df.selectExpr(
        "id",
        "hamming_distance(s1, s2) AS hd",
        f"normalize('{DECOMPOSED}') AS nfc",
        "luhn_check(digits) AS luhn",
        "sha2(s1, 512) AS h512",
        "hmac_md5('key', s1) AS hm5",
        "hmac_sha1('key', s1) AS hs1",
        "hmac_sha512('key', s1) AS hs512",
        "from_utf8(to_utf8(s1)) AS utf8rt",
        "from_big_endian_64(to_big_endian_64(id * 1234567)) AS bert",
        "human_readable_seconds(secs) AS hrs",
        "typeof(s1) AS ty",
        "CAST(length(uuid()) = 36 AS BOOLEAN) AS uuid_ok",
    ).orderBy("id")


def _human_readable(v: float) -> str:
    # mirrors the SQL UDF in compat.register_all (reference
    # filter.rs:4003-4027); Java %.2f rounds HALF_UP vs Python's
    # HALF_EVEN — inputs avoid half-cent boundaries.
    if v < 60:
        return f"{v:.2f} seconds"
    if v < 3600:
        return f"{v / 60:.2f} minutes"
    if v < 86400:
        return f"{v / 3600:.2f} hours"
    return f"{v / 86400:.2f} days"


def _strings2_oracle() -> str:
    import hashlib

    nfc = unicodedata.normalize("NFC", DECOMPOSED)
    rows = []
    for i, (a, b) in enumerate(PAIRS):
        hd = compat.hamming_distance(a, b)
        rows.append(
            "(CAST({0} AS BIGINT), CAST({1} AS BIGINT), '{2}', {3}, '{4}', '{5}', "
            "'{6}', '{7}', '{8}', CAST({9} AS BIGINT), '{10}', 'string', TRUE)".format(
                i,
                "NULL" if hd is None else hd,
                nfc,
                str(_luhn(DIGITS[i % len(DIGITS)])).upper(),
                hashlib.sha512(a.encode()).hexdigest(),
                compat.hmac_md5("key", a),
                compat.hmac_sha1("key", a),
                compat.hmac_sha512("key", a),
                a,
                i * 1234567,
                _human_readable(i * 987.3 + 7.01),
            )
        )
    return (
        "SELECT * FROM (VALUES {0}) AS t(id, hd, nfc, luhn, h512, hm5, hs1, "
        "hs512, utf8rt, bert, hrs, ty, uuid_ok) ORDER BY id".format(",".join(rows))
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "compat_stats": compat_stats,
    "compat_strings": compat_strings,
    "compat_strings2": compat_strings2,
}

ORACLE: dict[str, str] = {
    "compat_stats": _stats_oracle(),
    "compat_strings": _strings_oracle(),
    "compat_strings2": _strings2_oracle(),
}
