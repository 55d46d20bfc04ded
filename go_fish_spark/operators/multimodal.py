"""Multimodal columns: opaque binary payloads + typed metadata, with
decode/feature-extraction as Arrow-batched pandas functions.

North-star extension (BASELINE.json). The engine treats image/audio/video
as ``binary`` columns with a metadata struct; the *plumbing* — schema,
partitioning, `mapInPandas` batch shape — is real and tested. Decode has
two arms:

* :func:`extract_image_meta` — REAL header-level metadata (format +
  dimensions for PNG/JPEG/GIF/BMP) parsed with the stdlib, no codec
  library needed; covers the per-image decisions a curation pipeline
  actually makes (size filters, aspect buckets, format routing).
  Exercised against COMPLETE valid PNG bytes in tests.
* pixel-level decode/resize — STUBBED (PIL/av are not in this
  container): ``decode_features``/``resize_media`` compute deterministic
  fake features and raise ``NotImplementedError`` if a real codec is
  requested, with the integration point clearly marked.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Metadata carried alongside every binary payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha", T.StringType()),
    ]
)

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("status", T.StringType()),
    ]
)


def ingest_binary(df: DataFrame, id_col: str, payload_col: str, media_type: str = "text") -> DataFrame:
    """Wrap a payload column as (id, content: binary, meta: struct).

    Column-expression only — encode/sha/length all run JVM-side."""
    content = F.encode(F.col(payload_col), "UTF-8")
    return df.select(
        F.col(id_col),
        content.alias("content"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(content).cast("long").alias("n_bytes"),
            F.sha2(content, 256).alias("sha"),
        ).alias("meta"),
    )


def _fake_decode(buf: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a real image decode: synthesize a
    (width, height) from the byte length. REPLACE with e.g. PIL.Image.open
    when a codec library is available."""
    n = len(buf)
    return n % 640 + 1, (n * 7) % 480 + 1


def decode_features(binary_df: DataFrame, codec: str = "fake") -> DataFrame:
    """Arrow-batched decode over mapInPandas: one pandas batch in, one
    feature batch out — the real integration shape for media decoding at
    scale (decode parallelism == partition count; no driver involvement).
    """
    if codec != "fake":
        # Integration point for real codecs (PIL / torchaudio / pyav).
        raise NotImplementedError(
            f"codec {codec!r}: media libraries not available in this build; "
            "only the deterministic 'fake' codec is implemented"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["content"].map(_fake_decode)
            w = dims.map(lambda t: t[0]).astype("int32")
            h = dims.map(lambda t: t[1]).astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w,
                    "height": h,
                    "n_pixels": (w.astype("int64") * h.astype("int64")),
                    "status": "fake-decoded",
                }
            )

    return binary_df.select("doc_id", "content").mapInPandas(run, DECODE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def resize_media(
    binary_df: DataFrame, width: int, height: int, codec: str = "fake"
) -> DataFrame:
    """Resize pass: binary in → (smaller) binary out, batch-at-a-time.

    Same integration shape as :func:`decode_features` (Arrow
    ``mapInPandas``; resize parallelism == partition count, output
    partitioning preserved for a downstream write). The fake codec
    deterministically truncates the payload to width×height/8 bytes —
    REPLACE the inner function with PIL ``Image.resize`` when codecs are
    available."""
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r}: media libraries not available in this build; "
            "only the deterministic 'fake' codec is implemented"
        )
    cap = max(width * height // 8, 1)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf["content"].map(lambda b: bytes(b)[:cap])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": out,
                    "width": width,
                    "height": height,
                    "n_bytes": out.map(len).astype("int64"),
                }
            )

    return binary_df.select("doc_id", "content").mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_off", T.LongType()),
        T.StructField("frame_len", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    binary_df: DataFrame, n_frames: int = 4, frame_bytes: int = 16
) -> DataFrame:
    """Frame sampling: ONE media row fans out to ≤ ``n_frames`` frame
    rows — the 1→N ``mapInPandas`` batch shape a video pipeline needs
    (each output row carries its provenance: index, byte offset, length).

    Frames are evenly-strided byte windows of the payload (the fake
    "keyframe" stand-in; a real codec would seek timestamps instead).
    Deterministic pure function of (n_bytes, n_frames, frame_bytes), so
    the offset/length math is oracle-checkable in SQL (x19)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                buf = bytes(content)
                n = len(buf)
                stride = max(n // n_frames, 1)
                for i in range(n_frames):
                    off = i * stride
                    if off >= n:
                        break
                    ln = min(frame_bytes, n - off)
                    rows.append((doc_id, i, off, ln, buf[off : off + ln]))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_off", "frame_len", "frame"]
            )

    return binary_df.select("doc_id", "content").mapInPandas(run, FRAME_SCHEMA)


def _parse_image_header(buf: bytes) -> tuple[str, int | None, int | None]:
    """REAL (stdlib-only) image metadata: container format and pixel
    dimensions parsed from the header bytes — no codec library needed.
    Full pixel DECODE still requires PIL/av (the marked integration
    points below); but width/height/format — what a curation pipeline
    filters and bucketizes on — are right here in the first bytes:

      PNG  signature + IHDR (big-endian u32 pair at offset 16)
      GIF  87a/89a logical screen descriptor (little-endian u16 pair)
      BMP  BITMAPINFOHEADER (little-endian i32 pair at offset 18)
      JPEG marker walk to the first SOFn frame header (big-endian u16s)

    Returns ("unknown", None, None) for unrecognized/truncated bytes —
    decode surfaces it as a status, never an exception (a poison byte
    string must not kill the batch)."""
    b = bytes(buf)
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
            return (
                "png",
                int.from_bytes(b[16:20], "big"),
                int.from_bytes(b[20:24], "big"),
            )
        if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            return (
                "gif",
                int.from_bytes(b[6:8], "little"),
                int.from_bytes(b[8:10], "little"),
            )
        if b[:2] == b"BM" and len(b) >= 26:
            # width is SIGNED in BITMAPINFOHEADER but only positive is
            # legal; height < 0 legally means top-down row order (hence
            # abs), height == 0 is malformed. Non-positive dims take the
            # "unsupported" path instead of poisoning size filters with
            # negative n_pixels.
            bmp_w = int.from_bytes(b[18:22], "little", signed=True)
            bmp_h = int.from_bytes(b[22:26], "little", signed=True)
            if bmp_w <= 0 or bmp_h == 0:
                return ("unknown", None, None)
            return ("bmp", bmp_w, abs(bmp_h))
        if b[:2] == b"\xff\xd8":  # JPEG: walk markers to SOFn
            i = 2
            while i + 9 < len(b):
                if b[i] != 0xFF:
                    break
                # skip 0xFF FILL bytes (legal padding before a marker) —
                # treating one as a marker would parse a bogus segment
                # length from the real marker's bytes and jump past SOFn
                while i + 9 < len(b) and b[i + 1] == 0xFF:
                    i += 1
                marker = b[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2  # standalone markers, no length
                    continue
                seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
                if (
                    0xC0 <= marker <= 0xCF
                    and marker not in (0xC4, 0xC8, 0xCC)
                ):  # SOFn frame header
                    return (
                        "jpeg",
                        int.from_bytes(b[i + 7 : i + 9], "big"),
                        int.from_bytes(b[i + 5 : i + 7], "big"),
                    )
                i += 2 + seg_len
    except (IndexError, ValueError):  # truncated header mid-field
        pass
    return ("unknown", None, None)


HEADER_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("status", T.StringType()),
    ]
)


def extract_image_meta(binary_df: DataFrame) -> DataFrame:
    """REAL header-level image metadata over Arrow ``mapInPandas`` — the
    de-stubbed arm of the multimodal family: format + dimensions parsed
    from the payload bytes with the stdlib (no PIL), which covers the
    decisions a curation pipeline actually makes per image (size
    filters, aspect buckets, format routing) without touching pixel
    data. Unrecognized payloads report status 'unsupported' and NULL
    dims — row-preserving, never throwing. Same batch shape / scale law
    as :func:`decode_features`: decode parallelism == partition count,
    zero driver involvement."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = pdf["content"].map(_parse_image_header)
            fmt = parsed.map(lambda t: t[0])
            w = parsed.map(lambda t: t[1])
            h = parsed.map(lambda t: t[2])
            npix = [
                (int(a) * int(b)) if a is not None and b is not None else None
                for a, b in zip(w, h)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": fmt,
                    "width": w.astype("object"),
                    "height": h.astype("object"),
                    "n_pixels": pd.Series(npix, dtype="object"),
                    "status": fmt.map(
                        lambda f: "decoded" if f != "unknown" else "unsupported"
                    ),
                }
            )

    return binary_df.select("doc_id", "content").mapInPandas(
        run, HEADER_SCHEMA
    )


def synth_png(w: int, h: int, shade: int = 0x10) -> bytes:
    """A COMPLETE valid PNG (signature, IHDR, zlib IDAT, IEND) built
    with the stdlib — the deterministic image generator for exercising
    the multimodal pipeline without media fixtures. Any real PNG reader
    (PIL included) opens it."""
    import binascii
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", binascii.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    px = bytes((shade & 0xFF, (shade * 2) & 0xFF, (shade * 3) & 0xFF))
    raw = b"".join(b"\x00" + px * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def synth_png_frame(
    df: DataFrame, id_col: str, width_expr, height_expr
) -> DataFrame:
    """(id, content binary) frame of real synthesized PNGs with
    per-row dimensions — Arrow-batched generation (mapInPandas), the
    write-side twin of :func:`extract_image_meta`'s parse."""
    base = df.select(
        F.col(id_col).alias("doc_id"),
        width_expr.cast("int").alias("_w"),
        height_expr.cast("int").alias("_h"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": [
                        synth_png(int(w), int(h))
                        for w, h in zip(pdf["_w"], pdf["_h"])
                    ],
                }
            )

    return base.mapInPandas(
        run, "doc_id long, content binary"
    )


FRAME_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_id", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def frame_sample(
    binary_df: DataFrame,
    win: int = 64,
    stride: int = 48,
    every: int = 1,
) -> DataFrame:
    """FRAME SAMPLING over opaque binary payloads — the video-pipeline
    plumbing shape (r1 brief: "frame-sample as Pandas UDFs over
    mapInPandas"): slide a ``win``-byte window at ``stride`` over each
    payload (the x24 chunking rule at byte grain: every byte covered,
    final frame short, one frame for sub-window payloads), keep every
    ``every``-th frame (the temporal-subsampling knob a video pipeline
    turns), and emit (doc_id, frame_id, offset, n_bytes, frame_md5) per
    kept frame. The byte-window extraction is REAL (Arrow batch in,
    exploded frame batch out — the exact shape a codec-backed frame
    decoder drops into); the per-frame "decode" is the deterministic
    md5 fingerprint, the integration point for a real frame featurizer.

    100 TB shape: decode parallelism == partition count, no shuffle —
    one input batch yields its own frame rows; output volume is
    len/stride/every rows per payload, controlled by the two knobs."""
    if win < 1 or stride < 1 or every < 1:
        raise ValueError("win, stride, every must all be >= 1")
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "frame_id": [], "offset": [],
                "n_bytes": [], "frame_md5": [],
            }
            for doc_id, buf in zip(pdf["doc_id"], pdf["content"]):
                buf = bytes(buf)
                n = len(buf)
                n_frames = max(0, -(-max(n - win, 0) // stride)) + 1
                for f in range(0, n_frames, every):
                    frame = buf[f * stride: f * stride + win]
                    out["doc_id"].append(doc_id)
                    out["frame_id"].append(f)
                    out["offset"].append(f * stride)
                    out["n_bytes"].append(len(frame))
                    out["frame_md5"].append(
                        hashlib.md5(frame).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_id": pd.Series(out["frame_id"], dtype="int32"),
                    "offset": pd.Series(out["offset"], dtype="int64"),
                    "n_bytes": pd.Series(out["n_bytes"], dtype="int32"),
                    "frame_md5": pd.Series(out["frame_md5"], dtype="object"),
                }
            )

    return binary_df.select("doc_id", "content").mapInPandas(
        run, FRAME_WINDOW_SCHEMA
    )
