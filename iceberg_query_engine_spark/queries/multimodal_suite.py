"""Oracle suite for multimodal binary-column operators.

The synthetic payload is md5(text)×4 (64 bytes) so DuckDB can mirror
the byte math on hex text (checksums hash the lowercase hex form — DuckDB
1.0 md5 is VARCHAR-only): header ints via '0x'-prefixed hex slices,
frame hashes via md5 of the reassembled hex — an exact oracle for the
mapInPandas plumbing.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal
from .tpch import tables

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
MEDIA_DATA_ROOT = os.path.join(_REPO_ROOT, "data", "media")


def ensure_media_data(spark: SparkSession, sf_dir: str) -> str:
    """Path of the media table (real encoded BMP/PPM bytes in a BINARY
    parquet column) for sf_dir's scale — committed for sf0.001/sf0.01,
    generated deterministically (pure function of doc_id, distributed)
    for larger scales. See sources/generator.generate_media."""
    from ..sources.generator import generate_media

    base = os.path.basename(os.path.normpath(sf_dir))
    dest = os.path.join(MEDIA_DATA_ROOT, base, "media.parquet")
    if not os.path.exists(dest):
        generate_media(
            spark,
            os.path.join(sf_dir, "documents.parquet"),
            os.path.join(MEDIA_DATA_ROOT, base),
        )
    return dest


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(ensure_media_data(spark, sf_dir))


def _payload_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    return documents.filter(F.col("doc_id") < 100).select(
        "doc_id",
        multimodal.synthetic_payload(F.col("doc_id"), F.col("text")).alias("payload"),
    )


def mm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.extract_metadata(_payload_df(spark, sf_dir)).orderBy("doc_id")


MM_METADATA_SQL = """
SELECT doc_id,
  CAST(('0x' || substr(h4, 1, 8)) AS BIGINT) % 512 AS width,
  CAST(('0x' || substr(h4, 9, 8)) AS BIGINT) % 512 AS height,
  CAST(4 AS BIGINT) AS n_frames,
  CAST(64 AS BIGINT) AS payload_len,
  md5(h4) AS checksum
FROM (
  SELECT doc_id, md5(text) || md5(text) || md5(text) || md5(text) AS h4
  FROM documents WHERE doc_id < 100
)
ORDER BY doc_id
"""


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        multimodal.sample_frames(_payload_df(spark, sf_dir), every=2)
        .select("doc_id", "frame_idx", "frame_hash")
        .orderBy("doc_id", "frame_idx")
    )


MM_FRAME_SAMPLE_SQL = """
SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
  md5(substr(h4, fi * 32 + 1, 32)) AS frame_hash
FROM (
  SELECT doc_id, md5(text) || md5(text) || md5(text) || md5(text) AS h4,
         unnest([0, 2]) AS fi
  FROM documents WHERE doc_id < 100
)
ORDER BY doc_id, frame_idx
"""


def mm_dedup_by_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media dedup: exact payload dedup on checksum — metadata-only
    aggregation, payload bytes never shuffle."""
    meta = multimodal.extract_metadata(_payload_df(spark, sf_dir))
    return meta.groupBy().agg(
        F.countDistinct("checksum").alias("n_unique"),
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum("payload_len").cast("bigint").alias("total_bytes"),
    )


MM_DEDUP_SQL = """
SELECT CAST(COUNT(DISTINCT md5(md5(text) || md5(text) || md5(text) || md5(text))) AS BIGINT) AS n_unique,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(COUNT(*) * 64 AS BIGINT) AS total_bytes
FROM documents WHERE doc_id < 100
"""


def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-statistics feature extraction (numpy over Arrow batches).
    All four stats are EXACT in fp (payload = digest×4; means divide
    by powers of two), so the oracle matches bit-for-bit."""
    return multimodal.extract_features(_payload_df(spark, sf_dir)).orderBy("doc_id")


MM_FEATURES_SQL = """
SELECT doc_id,
  round(list_aggregate(b, 'sum') / 16.0, 6) AS mean_byte,
  CAST(list_min(b) AS BIGINT) AS min_byte,
  CAST(list_max(b) AS BIGINT) AS max_byte,
  round(sqrt(list_aggregate(list_transform(b, x -> x * x), 'sum') / 16.0
             - (list_aggregate(b, 'sum') / 16.0) ^ 2), 6) AS std_byte
FROM (
  SELECT doc_id,
    list_transform(range(16),
      i -> CAST(('0x' || substr(md5(text), CAST(i * 2 + 1 AS INT), 2)) AS INT)) AS b
  FROM documents WHERE doc_id < 100
)
ORDER BY doc_id
"""


def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing (nearest-neighbor byte sampling stands in for
    the codec-dependent pixel path); hex-projected so the comparer
    hashes strings, not raw binary."""
    return (
        multimodal.resize_payload(_payload_df(spark, sf_dir), out_w=4, out_h=8)
        .select(
            "doc_id", "out_w", "out_h", "out_len",
            F.hex(F.col("resized")).alias("resized_hex"),
        )
        .orderBy("doc_id")
    )


MM_RESIZE_SQL = """
SELECT doc_id, CAST(4 AS BIGINT) AS out_w, CAST(8 AS BIGINT) AS out_h,
  CAST(32 AS BIGINT) AS out_len,
  upper(array_to_string(
    list_transform(range(32),
      i -> substr(h4, CAST(floor(i * 63.0 / 31) AS INT) * 2 + 1, 2)), '')) AS resized_hex
FROM (
  SELECT doc_id, md5(text) || md5(text) || md5(text) || md5(text) AS h4
  FROM documents WHERE doc_id < 100
)
ORDER BY doc_id
"""


def mm_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame PCM16 RMS energy over the synthetic payload — the
    codec-free audio feature pass (operators/multimodal.py
    audio_frame_energy). Oracle decodes the same little-endian int16
    samples from hex slices."""
    return (
        multimodal.audio_frame_energy(_payload_df(spark, sf_dir))
        .select("doc_id", "frame_id", F.round(F.col("rms"), 6).alias("rms"))
        .orderBy("doc_id", "frame_id")
    )


# sample i (0-based) = bytes (2i, 2i+1) little-endian:
# value = hi<<8 | lo → '0x' || hex(byte 2i+1) || hex(byte 2i);
# byte k's hex = substr(h4, 2k+1, 2); unsigned ≥ 32768 → subtract 65536.
MM_AUDIO_ENERGY_SQL = """
WITH p AS (
  SELECT doc_id, md5(text) || md5(text) || md5(text) || md5(text) AS h4
  FROM documents WHERE doc_id < 100
), s AS (
  SELECT doc_id, g.i,
    CAST(('0x' || substr(h4, 4 * g.i + 3, 2) || substr(h4, 4 * g.i + 1, 2))
         AS INTEGER) AS u
  FROM p CROSS JOIN (SELECT unnest(range(32)) AS i) g
), sv AS (
  SELECT doc_id, i, CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS v FROM s
)
SELECT doc_id, CAST(i // 8 AS BIGINT) AS frame_id,
  round(sqrt(avg(CAST(v AS DOUBLE) * v)), 6) AS rms
FROM sv GROUP BY doc_id, i // 8
ORDER BY doc_id, frame_id
"""


def _varied_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload whose frames VARY per doc (unlike synthetic_payload's
    md5×4, whose 4 frames are identical): frame i = md5(text + '#' +
    salt_i), where even-length docs get 4 distinct frames (every
    boundary a cut) and odd-length docs get [s0,s0,s2,s2] (only the
    middle boundary cuts) — deterministic per-doc cut structure both
    engines reproduce."""
    (documents,) = tables(spark, sf_dir, "documents")
    ev = F.length("text") % 2 == 0

    def salt(i: int):
        return F.when(ev, F.lit(str(i))).otherwise(F.lit(str((i // 2) * 2)))

    frames = [
        F.md5(F.concat(F.col("text"), F.lit("#"), salt(i)).cast("binary"))
        for i in range(4)
    ]
    return documents.filter(F.col("doc_id") < 100).select(
        "doc_id", F.unhex(F.concat(*frames)).alias("payload")
    )


def mm_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection over the varied payload
    (operators/multimodal.py scene_cuts): per consecutive-frame
    boundary, differing-byte count + cut flag (> 8 of 16 bytes)."""
    return multimodal.scene_cuts(_varied_payload(spark, sf_dir)).orderBy(
        "doc_id", "boundary"
    )


MM_SCENE_CUTS_SQL = """
WITH d AS (
  SELECT doc_id, text, (length(text) % 2 = 0) AS ev
  FROM documents WHERE doc_id < 100
), h AS (
  SELECT doc_id,
    md5(text || '#' || '0') AS f0,
    md5(text || '#' || CASE WHEN ev THEN '1' ELSE '0' END) AS f1,
    md5(text || '#' || '2') AS f2,
    md5(text || '#' || CASE WHEN ev THEN '3' ELSE '2' END) AS f3
  FROM d
), b AS (
  SELECT doc_id, 1 AS boundary, f0 AS fa, f1 AS fb FROM h
  UNION ALL SELECT doc_id, 2, f1, f2 FROM h
  UNION ALL SELECT doc_id, 3, f2, f3 FROM h
), diffs AS (
  SELECT doc_id, CAST(boundary AS BIGINT) AS boundary,
    CAST(list_aggregate(list_transform(range(16),
      k -> CASE WHEN substr(fa, 2*k+1, 2) <> substr(fb, 2*k+1, 2)
           THEN 1 ELSE 0 END), 'sum') AS BIGINT) AS n_diff_bytes
  FROM b
)
SELECT doc_id, boundary, n_diff_bytes, n_diff_bytes > 8 AS is_cut
FROM diffs ORDER BY doc_id, boundary
"""


DECODE_SCHEMA = "doc_id long, width int, height int, sum_r long, sum_g long, sum_b long"


def mm_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode over a REAL binary parquet column: scan the
    committed media table (`data/media/<sf>/media.parquet` — genuine
    BMP and PPM files in a BINARY column, see generate_media), decode
    each payload through the pure-numpy codec (actual
    BITMAPINFOHEADER/P6 parsing, bottom-up rows, stride padding, BGR
    swap), and aggregate exact per-channel pixel sums. The oracle
    recomputes the sums from the generator's pixel definition in
    closed form, so any decode OR generation bug (stride, origin,
    channel order, format dispatch) breaks the hash match.

    Pixels: W=8+doc_id%5, H=6+doc_id%4; R=(doc_id+x+y)%256,
    G=(2*doc_id+3x)%256, B=(x*y+doc_id)%256. Even doc_ids are BMP,
    odd are PPM — both decode branches run on every batch.

    Scale: the doc_id<100 predicate is PUSHED to the parquet scan
    (row-group pruning skips payload bytes of non-matching groups —
    pinned); decode is mapInPandas, one Arrow batch per core; pixels
    never leave the executor (only 6 small columns come back)."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    media = _media(spark, sf_dir).filter(F.col("doc_id") < 100).select(
        "doc_id", "payload", "width", "height"
    )

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "width", "height", "sum_r", "sum_g", "sum_b")}
            for doc_id, payload, w, h in zip(
                pdf["doc_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                decoded = multimodal.decode_image(bytes(payload))
                # metadata columns must agree with the actual bytes
                assert decoded.shape == (int(h), int(w), 3)
                out["doc_id"].append(int(doc_id))
                out["width"].append(int(w))
                out["height"].append(int(h))
                out["sum_r"].append(int(decoded[:, :, 0].astype(np.int64).sum()))
                out["sum_g"].append(int(decoded[:, :, 1].astype(np.int64).sum()))
                out["sum_b"].append(int(decoded[:, :, 2].astype(np.int64).sum()))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, DECODE_SCHEMA).orderBy("doc_id")


MM_DECODE_STATS_SQL = """
WITH dims AS (
  SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 4 AS h
  FROM documents WHERE doc_id < 100
), px AS (
  SELECT doc_id, w, h,
         unnest(range(w * h)) AS i
  FROM dims
), vals AS (
  SELECT doc_id, w, h, i % w AS x, i // w AS y FROM px
)
SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       CAST(SUM((doc_id + x + y) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((2 * doc_id + 3 * x) % 256) AS BIGINT) AS sum_g,
       CAST(SUM((x * y + doc_id) % 256) AS BIGINT) AS sum_b
FROM vals
GROUP BY doc_id, w, h
ORDER BY doc_id
"""


def mm_decode_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pixel pipeline on the REAL codec: build BMP → decode →
    nearest-neighbor resize to 4x4 → exact channel sums of the resized
    image. Nearest-neighbor picks source pixel (x*w//4, y*h//4) for
    output (x, y) — deterministic index math the oracle reproduces, so
    a resize bug (axis swap, rounding mode) breaks the hash. Reads the
    media table's BINARY column (decode from committed bytes, both BMP
    and PPM branches)."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    media = _media(spark, sf_dir).filter(F.col("doc_id") < 100).select(
        "doc_id", "payload"
    )

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "sum_r", "sum_g", "sum_b")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                small = multimodal.resize_nearest(
                    multimodal.decode_image(bytes(payload)), 4, 4
                )
                assert small.shape == (4, 4, 3)
                out["doc_id"].append(int(doc_id))
                out["sum_r"].append(int(small[:, :, 0].astype(np.int64).sum()))
                out["sum_g"].append(int(small[:, :, 1].astype(np.int64).sum()))
                out["sum_b"].append(int(small[:, :, 2].astype(np.int64).sum()))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        run, "doc_id long, sum_r long, sum_g long, sum_b long"
    ).orderBy("doc_id")


MM_DECODE_RESIZE_SQL = """
WITH dims AS (
  SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 4 AS h
  FROM documents WHERE doc_id < 100
), px AS (
  SELECT doc_id, w, h, unnest(range(16)) AS i FROM dims
), src AS (
  -- output (ox, oy) samples source (ox*w//4, oy*h//4)
  SELECT doc_id,
         ((i % 4) * w) // 4 AS x,
         ((i // 4) * h) // 4 AS y
  FROM px
)
SELECT doc_id,
       CAST(SUM((doc_id + x + y) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((2 * doc_id + 3 * x) % 256) AS BIGINT) AS sum_g,
       CAST(SUM((x * y + doc_id) % 256) AS BIGINT) AS sum_b
FROM src
GROUP BY doc_id
ORDER BY doc_id
"""


def mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup on REAL pixels: per doc, decode the
    deterministic BMP, dHash it (nearest-resize to 8x8 integer luma,
    bit j = gray[y][x] > gray[y][x+1] — 7 comparisons x 8 rows = 56
    bits, kept under the signed-64 sign bit so Spark LONG and DuckDB
    BIGINT hex identically), then group — docs whose pixel patterns
    differ only by a brightness offset collapse to one hash (dHash
    compares neighbors, so constant shifts cancel except at mod-256
    wraps). Output: one row per distinct hash with its population and
    representative doc.

    Scale: hashing is map-only (pixels never shuffle — 8 bytes per
    image cross the exchange); the group-by is a tiny aggregate. The
    standard near-dup image pipeline (dHash → hamming buckets) at any
    corpus size. Reads the media table's BINARY column."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    media = _media(spark, sf_dir).filter(F.col("doc_id") < 100).select(
        "doc_id", "payload"
    )

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            out = {"doc_id": [], "dhash": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                d = int(doc_id)
                px = multimodal.resize_nearest(
                    multimodal.decode_image(bytes(payload)), 8, 8
                ).astype(np.int64)
                gray = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
                bits = gray[:, :-1] > gray[:, 1:]  # 8 rows x 7 comparisons
                hval = 0
                for j, b in enumerate(bits.flatten()):
                    if b:
                        hval |= 1 << j
                out["doc_id"].append(d)
                out["dhash"].append(hval)
            yield pd.DataFrame(out)

    hashed = media.mapInPandas(run, "doc_id long, dhash long")
    return (
        hashed.groupBy("dhash")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").alias("keep_doc"),
        )
        .select(F.lower(F.hex("dhash")).alias("dhash_hex"), "n_docs", "keep_doc")
        .orderBy("dhash_hex")
    )


MM_PHASH_DEDUP_SQL = """
WITH dims AS (
  SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 4 AS h
  FROM documents WHERE doc_id < 100
), cell AS (
  -- dHash grid: 8 columns x 8 rows, nearest-sampled from (w, h)
  SELECT doc_id, w, h, i % 8 AS ox, i // 8 AS oy
  FROM dims CROSS JOIN (SELECT unnest(range(64)) AS i) g
), gray AS (
  SELECT doc_id, ox, oy,
    (  299 * ((doc_id + (ox * w) // 8 + (oy * h) // 8) % 256)
     + 587 * ((2 * doc_id + 3 * ((ox * w) // 8)) % 256)
     + 114 * ((((ox * w) // 8) * ((oy * h) // 8) + doc_id) % 256)
    ) // 1000 AS gv
  FROM cell
), bits AS (
  SELECT a.doc_id,
         CAST(SUM(CASE WHEN a.gv > b.gv
             THEN CAST(1 AS BIGINT) << (a.oy * 7 + a.ox) ELSE 0 END) AS BIGINT)
           AS hval
  FROM gray a JOIN gray b
    ON a.doc_id = b.doc_id AND a.oy = b.oy AND b.ox = a.ox + 1
  WHERE a.ox < 7
  GROUP BY a.doc_id
)
SELECT lower(hex(hval)) AS dhash_hex,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS keep_doc
FROM bits
GROUP BY hval
ORDER BY dhash_hex
"""


VAD_THRESHOLD = 18500.0  # ~median frame RMS of the varied payload


def mm_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity detection: frames whose PCM16 RMS clears the
    energy threshold, merged into maximal CONSECUTIVE segments — the
    speech-segmentation step an ASR training pipeline runs before
    cutting audio into utterances. Gaps-and-islands via the classic
    frame_id - row_number() grouping key (consecutive flagged frames
    share it), so segmentation is one window + one aggregate per doc —
    no self-joins, scales as a single shuffle on doc_id."""
    from pyspark.sql import Window

    rms = multimodal.audio_frame_energy(_varied_payload(spark, sf_dir))
    flagged = rms.filter(F.col("rms") > VAD_THRESHOLD)
    w = Window.partitionBy("doc_id").orderBy("frame_id")
    seg = flagged.withColumn(
        "grp", F.col("frame_id") - F.row_number().over(w)
    )
    return (
        seg.groupBy("doc_id", "grp")
        .agg(
            F.min("frame_id").alias("seg_start"),
            F.max("frame_id").alias("seg_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_frames"),
            F.round(F.avg("rms"), 6).alias("mean_rms"),
        )
        .select("doc_id", "seg_start", "seg_end", "n_frames", "mean_rms")
        .orderBy("doc_id", "seg_start")
    )


# varied payload frame hex (same CTE as MM_SCENE_CUTS_SQL), then the
# MM_AUDIO_ENERGY sample extraction, threshold, and islands grouping.
MM_AUDIO_VAD_SQL = f"""
WITH d AS (
  SELECT doc_id, text, (length(text) % 2 = 0) AS ev
  FROM documents WHERE doc_id < 100
), p AS (
  SELECT doc_id,
    md5(text || '#' || '0')
    || md5(text || '#' || CASE WHEN ev THEN '1' ELSE '0' END)
    || md5(text || '#' || '2')
    || md5(text || '#' || CASE WHEN ev THEN '3' ELSE '2' END) AS h4
  FROM d
), s AS (
  SELECT doc_id, g.i,
    CAST(('0x' || substr(h4, 4 * g.i + 3, 2) || substr(h4, 4 * g.i + 1, 2))
         AS INTEGER) AS u
  FROM p CROSS JOIN (SELECT unnest(range(32)) AS i) g
), fr AS (
  SELECT doc_id, i // 8 AS frame_id,
    sqrt(avg(CAST(CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS DOUBLE)
             * CASE WHEN u >= 32768 THEN u - 65536 ELSE u END)) AS rms
  FROM s GROUP BY doc_id, i // 8
), flagged AS (
  SELECT doc_id, frame_id, rms,
         frame_id - row_number() OVER (PARTITION BY doc_id ORDER BY frame_id) AS grp
  FROM fr WHERE rms > {VAD_THRESHOLD}
)
SELECT doc_id, MIN(frame_id) AS seg_start, MAX(frame_id) AS seg_end,
       CAST(COUNT(*) AS BIGINT) AS n_frames, round(AVG(rms), 6) AS mean_rms
FROM flagged
GROUP BY doc_id, grp
ORDER BY doc_id, seg_start
"""


def mm_media_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only media inventory: per mime type, file count, total
    pixels, and total encoded bytes — WITHOUT touching the payload
    column. The scan's ReadSchema must exclude `payload` (pinned in
    tests/test_plans.py): at 100 TB of media, cataloging that reads
    the bytes is a 1000× overscan, so column pruning on BINARY columns
    is the property this query exists to exercise.

    `size_bytes` is derived from the typed metadata alone
    (width/height/mime) via the exact container formulas (BMP: 54-byte
    headers + 4-byte-aligned rows; PPM: text header + 3wh). The oracle
    instead sums DuckDB's octet_length over the REAL payload bytes —
    so the driver's hash compare proves the formulas match the
    committed files byte-for-byte, while the Spark side demonstrably
    never reads them."""
    media = _media(spark, sf_dir)
    bmp_size = 54 + (((3 * F.col("width") + 3) / 4).cast("long") * 4) * F.col("height")
    ppm_size = (
        8
        + F.length(F.concat_ws(" ", F.col("width"), F.col("height")))
        + 3 * F.col("width") * F.col("height")
    )
    size = F.when(F.col("mime") == "image/bmp", bmp_size).otherwise(ppm_size)
    return (
        media.select("mime", "width", "height", size.alias("sz"))
        .groupBy("mime")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum(F.col("width").cast("long") * F.col("height")).alias("total_px"),
            F.sum("sz").cast("bigint").alias("size_bytes"),
        )
        .orderBy("mime")
    )


def _mm_media_catalog_sql(sf_dir_base: str = "sf0.01") -> str:
    media_path = os.path.join(MEDIA_DATA_ROOT, sf_dir_base, "media.parquet")
    return f"""
SELECT mime, CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(width * height) AS BIGINT) AS total_px,
       CAST(SUM(octet_length(payload)) AS BIGINT) AS size_bytes
FROM '{media_path}' GROUP BY mime ORDER BY mime
"""


MM_MEDIA_CATALOG_SQL = _mm_media_catalog_sql()


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "mm_media_catalog": mm_media_catalog,
    "mm_metadata": mm_metadata,
    "mm_audio_energy": mm_audio_energy,
    "mm_scene_cuts": mm_scene_cuts,
    "mm_frame_sample": mm_frame_sample,
    "mm_dedup_by_checksum": mm_dedup_by_checksum,
    "mm_features": mm_features,
    "mm_resize": mm_resize,
    "mm_decode_stats": mm_decode_stats,
    "mm_decode_resize": mm_decode_resize,
    "mm_phash_dedup": mm_phash_dedup,
    "mm_audio_vad": mm_audio_vad,
}

ORACLE: dict[str, str] = {
    "mm_media_catalog": MM_MEDIA_CATALOG_SQL,
    "mm_metadata": MM_METADATA_SQL,
    "mm_audio_energy": MM_AUDIO_ENERGY_SQL,
    "mm_scene_cuts": MM_SCENE_CUTS_SQL,
    "mm_frame_sample": MM_FRAME_SAMPLE_SQL,
    "mm_dedup_by_checksum": MM_DEDUP_SQL,
    "mm_features": MM_FEATURES_SQL,
    "mm_resize": MM_RESIZE_SQL,
    "mm_decode_stats": MM_DECODE_STATS_SQL,
    "mm_decode_resize": MM_DECODE_RESIZE_SQL,
    "mm_phash_dedup": MM_PHASH_DEDUP_SQL,
    "mm_audio_vad": MM_AUDIO_VAD_SQL,
}
