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


# ---------------------------------------------------------------------------
# Audio/video HEADER metadata (r10 verdict Next #6 — x111 beyond images):
# WAV/RIFF and MP4 carry everything a multimodal curation pipeline
# buckets audio/video on (sample rate, channels, duration, brand) in
# stdlib-parseable header structures — no codec library, exactly like
# the PNG/JPEG work. Pixel/sample DECODE remains the documented PIL/av
# integration point; container metadata is real and tested here.


def synth_wav(
    sample_rate: int, n_channels: int, n_samples: int, bits: int = 16
) -> bytes:
    """A COMPLETE valid WAV (RIFF + fmt + data, PCM silence) built with
    the stdlib — the deterministic audio generator twin of
    :func:`synth_png`. Any real WAV reader opens it."""
    import struct

    block = n_channels * bits // 8
    byte_rate = sample_rate * block
    data = b"\x00" * (n_samples * block)
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, block, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synth_mp4(brand: str, timescale: int, duration: int) -> bytes:
    """A minimal structurally-valid MP4 box tree (ftyp + moov/mvhd v0)
    built with the stdlib — enough container structure for any box
    walker to recover brand, timescale, and duration (no media track;
    this is the header-metadata generator, not an encoder)."""
    import struct

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    ftyp = box(b"ftyp", brand.encode()[:4].ljust(4) + struct.pack(">I", 0)
               + brand.encode()[:4].ljust(4))
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"              # version 0 + flags
        + struct.pack(">II", 0, 0)        # ctime, mtime
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000)   # rate 1.0
        + struct.pack(">H", 0x0100)       # volume 1.0
        + b"\x00" * 70,                   # reserved + matrix + next_track
    )
    return ftyp + box(b"moov", mvhd)


def _parse_media_header(buf: bytes):
    """REAL (stdlib-only) audio/video container metadata: WAV/RIFF
    chunk walk (audio format, channels, sample rate, byte rate, bits,
    data size → duration) and MP4 box walk (ftyp major brand,
    moov/mvhd timescale + duration, versions 0 and 1). Returns
    (format, brand, sample_rate, n_channels, bits, duration_ms) with
    Nones for fields the container lacks; ("unknown", ...) for
    unrecognized/truncated bytes — a poison payload is a status, never
    an exception (the _parse_image_header rule). duration_ms is EXACT
    integer arithmetic (x·1000 // rate) so a SQL oracle reproduces it
    bit-for-bit."""
    b = bytes(buf)
    try:
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            i = 12
            sr = ch = bits = byte_rate = None
            data_size = None
            while i + 8 <= len(b):
                typ = b[i : i + 4]
                size = int.from_bytes(b[i + 4 : i + 8], "little")
                if typ == b"fmt " and i + 24 <= len(b):
                    ch = int.from_bytes(b[i + 10 : i + 12], "little")
                    sr = int.from_bytes(b[i + 12 : i + 16], "little")
                    byte_rate = int.from_bytes(b[i + 16 : i + 20], "little")
                    bits = int.from_bytes(b[i + 22 : i + 24], "little")
                elif typ == b"data":
                    data_size = size
                i += 8 + size + (size & 1)  # RIFF chunks pad to even
            if sr is None:
                return ("unknown", None, None, None, None, None)
            dur = (
                data_size * 1000 // byte_rate
                if data_size is not None and byte_rate
                else None
            )
            return ("wav", None, sr, ch, bits, dur)
        # MP4: top-level box walk (size u32 BE + 4cc type)
        if len(b) >= 12 and b[4:8] == b"ftyp":
            brand = b[8:12].decode("ascii", "replace").strip()
            i = 0
            ts = dur = None
            while i + 8 <= len(b):
                size = int.from_bytes(b[i : i + 4], "big")
                typ = b[i + 4 : i + 8]
                if size < 8:
                    break
                if typ == b"moov":
                    j = i + 8
                    end = min(i + size, len(b))
                    while j + 8 <= end:
                        csize = int.from_bytes(b[j : j + 4], "big")
                        ctyp = b[j + 4 : j + 8]
                        if csize < 8:
                            break
                        if ctyp == b"mvhd" and j + 12 <= end:
                            ver = b[j + 8]
                            if ver == 1 and j + 40 <= end:
                                ts = int.from_bytes(
                                    b[j + 28 : j + 32], "big"
                                )
                                dur = int.from_bytes(
                                    b[j + 32 : j + 40], "big"
                                )
                            elif ver == 0 and j + 28 <= end:
                                ts = int.from_bytes(
                                    b[j + 20 : j + 24], "big"
                                )
                                dur = int.from_bytes(
                                    b[j + 24 : j + 28], "big"
                                )
                        j += csize
                i += size
            dur_ms = dur * 1000 // ts if dur is not None and ts else None
            return ("mp4", brand, None, None, None, dur_ms)
    except (IndexError, ValueError):  # truncated header mid-field
        pass
    return ("unknown", None, None, None, None, None)


MEDIA_HEADER_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("brand", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("bits_per_sample", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("status", T.StringType()),
    ]
)


def extract_media_meta(binary_df: DataFrame) -> DataFrame:
    """Header-level audio/video metadata over Arrow ``mapInPandas`` —
    the WAV/MP4 sibling of :func:`extract_image_meta`: format routing,
    sample rate / channels / bit depth (audio), brand and exact
    integer duration_ms (both) parsed from the payload bytes with the
    stdlib. Unrecognized payloads report status 'unsupported' with
    NULL fields — row-preserving, never throwing. Decode parallelism
    == partition count, zero driver involvement."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = pdf["content"].map(_parse_media_header)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": parsed.map(lambda t: t[0]),
                    "brand": parsed.map(lambda t: t[1]).astype("object"),
                    "sample_rate": parsed.map(lambda t: t[2]).astype(
                        "object"
                    ),
                    "n_channels": parsed.map(lambda t: t[3]).astype(
                        "object"
                    ),
                    "bits_per_sample": parsed.map(lambda t: t[4]).astype(
                        "object"
                    ),
                    "duration_ms": parsed.map(lambda t: t[5]).astype(
                        "object"
                    ),
                    "status": parsed.map(
                        lambda t: "decoded"
                        if t[0] != "unknown"
                        else "unsupported"
                    ),
                }
            )

    return binary_df.select("doc_id", "content").mapInPandas(
        run, MEDIA_HEADER_SCHEMA
    )


def synth_media_frame(
    df: DataFrame,
    id_col: str,
    kind: str,
    sample_rate_expr=None,
    n_channels_expr=None,
    n_samples_expr=None,
    brand_expr=None,
    timescale_expr=None,
    duration_expr=None,
) -> DataFrame:
    """(id, content binary) frame of real synthesized WAV or MP4
    payloads with per-row parameters — the write-side twin of
    :func:`extract_media_meta` (the synth_png_frame pattern)."""
    if kind == "wav":
        base = df.select(
            F.col(id_col).alias("doc_id"),
            sample_rate_expr.cast("int").alias("_sr"),
            n_channels_expr.cast("int").alias("_ch"),
            n_samples_expr.cast("int").alias("_ns"),
        )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "content": [
                            synth_wav(int(sr), int(ch), int(ns))
                            for sr, ch, ns in zip(
                                pdf["_sr"], pdf["_ch"], pdf["_ns"]
                            )
                        ],
                    }
                )

    elif kind == "mp4":
        base = df.select(
            F.col(id_col).alias("doc_id"),
            brand_expr.cast("string").alias("_br"),
            timescale_expr.cast("int").alias("_ts"),
            duration_expr.cast("int").alias("_du"),
        )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "content": [
                            synth_mp4(str(br), int(ts), int(du))
                            for br, ts, du in zip(
                                pdf["_br"], pdf["_ts"], pdf["_du"]
                            )
                        ],
                    }
                )

    else:
        raise ValueError(f"unknown media kind {kind!r}")

    return base.mapInPandas(run, "doc_id long, content binary")
