"""Multimodal column operators: opaque binary + typed metadata.

North-star scope: image/audio/video payloads ride through the engine
as `binary` columns with a metadata struct; decode / feature-extract /
frame-sample run as Arrow-batched `mapInPandas` transforms.

Image decode is REAL for uncompressed formats (r4): `decode_image`
parses 24-bit BI_RGB BMP and binary PPM (P6) in pure struct+numpy —
public byte layouts, no codec library — with `encode_bmp` as the
writer half and `resize_nearest` as the pixel kernel
(oracle-exact end-to-end in mm_decode_stats). Compressed formats
(PNG/JPEG) genuinely need a codec library, which this container
lacks: that path falls back to Pillow if present, else raises the
documented NotImplementedError. Everything Spark-side — schema, batch
iteration, partitioning, UDF signatures — is real and oracle-tested.

Scale notes: mapInPandas streams Arrow batches; peak memory is one
batch per core regardless of table size. Binary payloads stay off the
shuffle path (metadata-only projections before any join/agg), which is
what makes this viable at 100 TB — never shuffle pixels.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FRAME_BYTES = 16

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("payload_len", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def synthetic_payload(doc_id_col, text_col):
    """Deterministic fake media payload: md5(text) × 4 = 64 bytes
    (4 'frames'); 'header' is the first 8 bytes. Columnar (no UDF)."""
    h = F.md5(text_col.cast("binary"))
    return F.unhex(F.concat(h, h, h, h))


def decode_image(payload: bytes):
    """Decode an image payload to an (H, W, 3) uint8 RGB numpy array.

    Uncompressed formats decode for REAL in pure numpy (public file
    formats, no codec library): 24-bit BI_RGB BMP and binary PPM (P6).
    Compressed formats (PNG/JPEG/...) need a codec library, which this
    container lacks — those fall back to Pillow if present, else raise
    the documented NotImplementedError.
    """
    import numpy as np

    if payload[:2] == b"BM":
        # BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER
        if len(payload) < 54:  # both headers must be present
            raise ValueError("truncated BMP payload (header incomplete)")
        data_offset = struct.unpack_from("<I", payload, 10)[0]
        width = struct.unpack_from("<i", payload, 18)[0]
        height = struct.unpack_from("<i", payload, 22)[0]
        bpp = struct.unpack_from("<H", payload, 28)[0]
        compression = struct.unpack_from("<I", payload, 30)[0]
        if bpp != 24 or compression != 0:
            raise NotImplementedError(
                f"only 24-bit uncompressed BMP decodes codec-free "
                f"(got bpp={bpp}, compression={compression})"
            )
        flipped = height > 0  # positive height = bottom-up row order
        height = abs(height)
        row_stride = (width * 3 + 3) & ~3  # rows pad to 4 bytes
        if width < 0 or data_offset + row_stride * height > len(payload):
            raise ValueError("truncated BMP payload (pixel data incomplete)")
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=row_stride * height, offset=data_offset
        ).reshape(height, row_stride)[:, : width * 3]
        img = rows.reshape(height, width, 3)[:, :, ::-1]  # BGR -> RGB
        return img[::-1] if flipped else img
    if payload[:2] == b"P6":
        # PPM: 'P6' <ws> width <ws> height <ws> maxval <single ws> data.
        # Every scan is bounded by len(payload): a truncated or malformed
        # header raises the documented ValueError, never IndexError.
        fields, pos, end = [], 2, len(payload)
        while len(fields) < 3:
            while pos < end and payload[pos] in b" \t\r\n":
                pos += 1
            if pos >= end:
                raise ValueError("truncated PPM payload (header incomplete)")
            if payload[pos : pos + 1] == b"#":  # comment to end of line
                while pos < end and payload[pos] not in b"\r\n":
                    pos += 1
                continue
            start = pos
            while pos < end and payload[pos] not in b" \t\r\n":
                pos += 1
            try:
                fields.append(int(payload[start:pos]))
            except ValueError:
                raise ValueError("malformed PPM header (non-integer field)")
        pos += 1  # exactly one whitespace after maxval
        width, height, maxval = fields
        if maxval > 255:
            raise NotImplementedError("16-bit PPM not supported")
        if pos + width * height * 3 > end:
            raise ValueError("truncated PPM payload (pixel data incomplete)")
        return np.frombuffer(
            payload, dtype=np.uint8, count=width * height * 3, offset=pos
        ).reshape(height, width, 3)
    try:
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "compressed-image decode requires Pillow (absent in this "
            "container, re-probed round 9 2026-08-16); BMP/PPM decode "
            "codec-free above"
        ) from exc


def encode_bmp(img) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as 24-bit BI_RGB BMP —
    the writer half of the codec-free pair (used by tests and the
    decode oracle query to build real files deterministically)."""
    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    height, width = img.shape[:2]
    row_stride = (width * 3 + 3) & ~3
    bgr = img[:, :, ::-1]
    rows = np.zeros((height, row_stride), dtype=np.uint8)
    rows[:, : width * 3] = bgr.reshape(height, width * 3)
    pixel_data = rows[::-1].tobytes()  # bottom-up
    data_offset = 14 + 40
    file_size = data_offset + len(pixel_data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    return header + info + pixel_data


def encode_ppm(img) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as binary PPM (P6) — the
    second codec-free format (public layout), used by the media-table
    generator so the corpus exercises both decode branches."""
    import numpy as np

    img = np.ascontiguousarray(np.asarray(img, dtype=np.uint8))
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def resize_nearest(img, out_w: int, out_h: int):
    """Nearest-neighbor resize on a decoded (H, W, 3) array — pure
    numpy index mapping, the vectorized per-row kernel the pixel
    pipeline runs inside mapInPandas."""
    import numpy as np

    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[ys][:, xs]


def extract_metadata(df: DataFrame) -> DataFrame:
    """mapInPandas metadata extraction: parse header ints + frame count
    + checksum from the binary payload (the decode-adjacent step that
    IS runnable without codecs)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [],
                "width": [],
                "height": [],
                "n_frames": [],
                "payload_len": [],
                "checksum": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                # short/empty payloads carry no header → NULL dims
                w = struct.unpack(">I", b[0:4])[0] % 512 if len(b) >= 8 else None
                h = struct.unpack(">I", b[4:8])[0] % 512 if len(b) >= 8 else None
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(len(b) // FRAME_BYTES)
                out["payload_len"].append(len(b))
                out["checksum"].append(hashlib.md5(b.hex().encode()).hexdigest())
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(run, META_SCHEMA)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("min_byte", T.LongType()),
        T.StructField("max_byte", T.LongType()),
        T.StructField("std_byte", T.DoubleType()),
    ]
)


def extract_features(df: DataFrame) -> DataFrame:
    """Feature extraction over raw payload bytes (numpy over Arrow
    batches): byte-level statistics — the codec-free stand-in for an
    embedding model; swap the numpy body for a model call and the
    Spark plumbing (batching, schema, partitioning) is unchanged."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "mean_byte": [], "min_byte": [],
                   "max_byte": [], "std_byte": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                a = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.float64)
                out["doc_id"].append(doc_id)
                if a.size == 0:  # empty payload → NULL features, not a crash
                    out["mean_byte"].append(None)
                    out["min_byte"].append(None)
                    out["max_byte"].append(None)
                    out["std_byte"].append(None)
                    continue
                out["mean_byte"].append(round(float(a.mean()), 6))
                out["min_byte"].append(int(a.min()))
                out["max_byte"].append(int(a.max()))
                out["std_byte"].append(round(float(a.std()), 6))
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_w", T.LongType()),
        T.StructField("out_h", T.LongType()),
        T.StructField("out_len", T.LongType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_payload(df: DataFrame, out_w: int = 4, out_h: int = 8) -> DataFrame:
    """Resize step. A real implementation decodes pixels (stubbed —
    decode_image raises without Pillow); the deterministic stand-in
    nearest-neighbor-samples the payload BYTES down to out_w*out_h so
    schema, batch shape, and downstream consumers are exercised
    end-to-end."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "out_w": [], "out_h": [], "out_len": [],
                    "resized": []}
            n_out = out_w * out_h
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b:
                    idx = np.linspace(0, len(b) - 1, n_out).astype(int)
                    resized = bytes(b[i] for i in idx)
                else:  # nothing to sample from
                    resized = b""
                rows["doc_id"].append(doc_id)
                rows["out_w"].append(out_w)
                rows["out_h"].append(out_h)
                rows["out_len"].append(len(resized))
                rows["resized"].append(resized)
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("frame_hash", T.StringType()),
    ]
)


def sample_frames(df: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling: split payload into FRAME_BYTES frames, keep every
    k-th — the video-keyframe-sampling shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame": [], "frame_hash": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for i in range(0, len(b) // FRAME_BYTES, every):
                    fr = b[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame"].append(fr)
                    rows["frame_hash"].append(hashlib.md5(fr.hex().encode()).hexdigest())
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(run, FRAME_SCHEMA)


AUDIO_FRAME_SAMPLES = 8  # PCM16 samples per analysis frame

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_id", T.LongType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def audio_frame_energy(df: DataFrame) -> DataFrame:
    """Audio feature extraction WITHOUT a codec: interpret the payload
    as raw PCM16-LE samples and emit per-frame RMS energy (8 samples
    per frame) — the windowed-energy pass of an audio curation pipeline
    (silence/clipping detection, energy-based segmentation). Raw-PCM
    interpretation needs no audio library, so unlike decode_image this
    path runs for real here.

    numpy over Arrow batches: frombuffer → reshape → one vectorized
    RMS per frame; the binary column never shuffles (energies only)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_id": [], "rms": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n = len(b) // 2
                samples = np.frombuffer(b[: n * 2], dtype="<i2").astype(np.int64)
                nf = n // AUDIO_FRAME_SAMPLES
                if nf == 0:
                    continue
                frames = samples[: nf * AUDIO_FRAME_SAMPLES].reshape(
                    nf, AUDIO_FRAME_SAMPLES
                )
                # sum of 8 int64 squares is exact; /8 is a power-of-two
                # division and sqrt is correctly rounded → bit-identical
                # to the SQL oracle's avg+sqrt
                rms = np.sqrt((frames * frames).mean(axis=1))
                rows["doc_id"].extend([doc_id] * nf)
                rows["frame_id"].extend(range(nf))
                rows["rms"].extend(float(x) for x in rms)
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(run, AUDIO_SCHEMA)


CUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("boundary", T.LongType()),
        T.StructField("n_diff_bytes", T.LongType()),
        T.StructField("is_cut", T.BooleanType()),
    ]
)


def scene_cuts(df: DataFrame, threshold: int = FRAME_BYTES // 2) -> DataFrame:
    """Scene-cut detection: byte-level difference between consecutive
    FRAME_BYTES frames; a boundary is a cut when more than `threshold`
    bytes change — the keyframe/shot-boundary pass of a video curation
    pipeline, runnable without a codec on raw frame bytes.

    numpy over Arrow batches: frombuffer → reshape(n_frames, FRAME_BYTES)
    → vectorized row-pair compare; only (doc, boundary, count) leaves
    the worker — frame bytes never shuffle."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "boundary": [], "n_diff_bytes": [], "is_cut": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                nf = len(b) // FRAME_BYTES
                if nf < 2:
                    continue
                frames = np.frombuffer(
                    b[: nf * FRAME_BYTES], dtype=np.uint8
                ).reshape(nf, FRAME_BYTES)
                diffs = (frames[1:] != frames[:-1]).sum(axis=1)
                rows["doc_id"].extend([doc_id] * (nf - 1))
                rows["boundary"].extend(range(1, nf))
                rows["n_diff_bytes"].extend(int(d) for d in diffs)
                rows["is_cut"].extend(bool(d > threshold) for d in diffs)
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(run, CUT_SCHEMA)
