"""Multimodal (binary) column operators — north-star extension.

Image/audio/video content is modeled as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched ``mapInPandas`` stages. The
DECODE step is a codec-dispatching function (``_decode``): REAL wav/PCM
decode through stdlib ``wave``, REAL binary-PGM (P5) raster parse
through pure integer math (``_parse_pgm``), REAL PNG/JPEG decode
through PIL behind a guarded import (PIL is absent in this container,
so that path falls through), and a clearly marked deterministic byte
STUB for any unrecognized payload. EVERY decode-bearing row runs a
real codec end-to-end on genuine container bytes: the image path
(``mm_decode_features``, ``mm_frame_sample``, ``mm_feature_knn``,
``mm_resize``, and extras2's ``mm_phash_nn``) wraps payloads as real
binary-PGM files via the shared ``_pgm_payloads`` stage and decodes
them with the real P5 parser, and the audio path
(``mm_audio_energy``) round-trips real WAV files through the stdlib
``wave`` encoder/decoder; the byte stub remains only as the
fall-through contract for unrecognized payloads, unit-covered in
tests/test_multimodal_decode.py. Everything Spark-side is real and
tested: schema, binary encoding, partitioned batch iteration, UDF
signatures, and output shapes.

The fixtures carry no binary table, so sample streams derive from
``documents.text`` (utf-8) — wrapped in real containers where the row
exercises a codec — structurally identical to reading a BLOB column
from Parquet.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables

#: bytes per fake "frame" for the frame-sampling stub
_FRAME_BYTES = 32


def _encode_wav_u8(data: bytes) -> bytes:
    """REAL audio container encoder: wrap a u8 sample stream in a WAV
    (RIFF) file — mono, 8-bit unsigned PCM, 8 kHz — via the stdlib
    ``wave`` writer. Deterministic byte-for-byte; the product is a
    genuine .wav any player or decoder accepts."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(data)
    return buf.getvalue()


def _encode_pgm(data: bytes) -> bytes:
    """REAL image container encoder: wrap a u8 pixel stream in a binary
    PGM (P5) file as a 1-row grayscale image. The product is a genuine
    .pgm any netpbm-compatible reader accepts."""
    return b"P5\n%d 1\n255\n" % len(data) + data


def _parse_pgm(payload: bytes) -> np.ndarray | None:
    """REAL image container parser: binary PGM (P5), pure integer math
    — magic, whitespace/comment-tolerant header (width, height,
    maxval), then exactly one whitespace byte before w*h raster bytes
    (8-bit: maxval < 256). Returns None when the payload is not a
    well-formed 8-bit P5 (caller falls back to the byte stub)."""
    if payload[:2] != b"P5":
        return None
    i, n = 2, len(payload)
    vals: list[int] = []
    while len(vals) < 3:
        while i < n and payload[i : i + 1].isspace():
            i += 1
        if i < n and payload[i : i + 1] == b"#":
            while i < n and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and payload[j : j + 1].isdigit():
            j += 1
        if j == i:
            return None
        vals.append(int(payload[i:j]))
        i = j
    if i >= n or not payload[i : i + 1].isspace():
        return None
    i += 1  # the single whitespace byte separating header and raster
    w, h, maxval = vals
    if not 0 < maxval < 256 or n - i < w * h:
        return None
    return np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=i)


def _encode_png(data: bytes) -> bytes:
    """REAL image container encoder: wrap a u8 pixel stream in a PNG
    file as a 1-row 8-bit grayscale image — pure stdlib (zlib + struct,
    per the public PNG spec): signature, IHDR (color type 0, no
    interlace), one zlib-deflated IDAT scanline with filter byte 0,
    IEND, all chunks CRC32-stamped. The product is a genuine .png any
    viewer accepts."""
    import struct
    import zlib

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", len(data), 1, 8, 0, 0, 0, 0)
    idat = zlib.compress(b"\x00" + data)  # one scanline, filter 0 (None)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _parse_png(payload: bytes) -> np.ndarray | None:
    """REAL image container parser for the 8-bit grayscale PNG subset —
    pure stdlib + numpy, no PIL: chunk walk with CRC32 verification,
    IHDR validation (bit depth 8, color type 0, deflate, adaptive
    filtering, no interlace), IDAT concatenation, zlib inflate, then
    per-scanline unfiltering implementing ALL FIVE standard filter
    types (None/Sub/Up/Average/Paeth — the encoder above emits only 0,
    but a genuine external grayscale PNG may use any). Returns the flat
    raster, or None when the payload is not a well-formed member of the
    subset (caller falls back to PIL-or-stub)."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    i, n = 8, len(payload)
    w = h = None
    idat = b""
    try:
        while i + 12 <= n:
            (length,) = struct.unpack(">I", payload[i : i + 4])
            typ = payload[i + 4 : i + 8]
            if i + 12 + length > n:
                return None
            body = payload[i + 8 : i + 8 + length]
            (crc,) = struct.unpack(
                ">I", payload[i + 8 + length : i + 12 + length]
            )
            if zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
                return None  # genuine-container discipline: bad CRC
            if typ == b"IHDR":
                w, h, depth, ctype, comp, filt, inter = struct.unpack(
                    ">IIBBBBB", body
                )
                if (depth, ctype, comp, filt, inter) != (8, 0, 0, 0, 0):
                    return None  # outside the grayscale subset
            elif typ == b"IDAT":
                idat += body
            elif typ == b"IEND":
                break
            i += 12 + length
        if w is None or h is None or not idat:
            return None
        raw = zlib.decompress(idat)
    except (struct.error, zlib.error):
        return None
    stride = w + 1
    if w == 0 or len(raw) < stride * h:
        return None
    out = np.empty((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.int32)
    for r in range(h):
        line = raw[r * stride : (r + 1) * stride]
        f = line[0]
        cur = np.frombuffer(line, dtype=np.uint8, count=w, offset=1).astype(
            np.int32
        )
        if f == 0:  # None
            rec = cur
        elif f == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth: left-sequential
            rec = np.empty(w, dtype=np.int32)
            a = 0
            for x in range(w):
                b = int(prev[x])
                c = int(prev[x - 1]) if x else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                a = (cur[x] + pred) & 0xFF
                rec[x] = a
        else:
            return None  # not a standard filter type
        out[r] = rec.astype(np.uint8)
        prev = rec
    return out.reshape(-1)


def _fake_decode(payload: bytes) -> np.ndarray:
    """STUB decoder — stands in for image/audio decode (PIL/librosa are
    not installed in this environment). Deterministic: interprets the
    byte stream as uint8 samples. A real deployment replaces exactly this
    function with e.g. ``PIL.Image.open(io.BytesIO(payload))``."""
    return np.frombuffer(payload, dtype=np.uint8)


def _decode(payload: bytes) -> np.ndarray:
    """Codec-dispatching decoder: sniff the container header and run a
    REAL decoder when one is available, else fall back to the stub.

    - ``RIFF..WAVE``: stdlib ``wave`` PCM decode (always available).
      8-bit PCM is already the uint8 sample domain; 16-bit PCM is
      mapped deterministically onto it (``(s + 32768) >> 8``) so every
      downstream stage keeps the one 0..255 contract.
    - ``P5`` magic: REAL binary-PGM raster parse (``_parse_pgm``) —
      pure integer math, no third-party dependency, so the image
      decode path is live in this container (mm_decode_features wraps
      its payloads in genuine PGM files and rides this branch).
    - PNG magic: REAL pure-stdlib decode (``_parse_png``: zlib +
      struct + the five standard unfilters) for the 8-bit grayscale
      non-interlaced subset — live in THIS container
      (``mm_decode_png`` wraps payloads in genuine PNG files via
      ``_encode_png`` and rides this branch); color/16-bit/interlaced
      PNGs and JPEG fall to PIL behind a guarded import — activates
      where PIL exists, falls through to the stub here.
    - anything else (incl. the utf-8 text payloads the fixtures
      derive): the deterministic byte stub, which is what keeps these
      rows FULL-oracle in this container.

    Every path returns a flat uint8-domain array, so the downstream
    contract (histogram buckets, energy sums, resize pooling) is
    codec-independent."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        import io
        import wave

        # 'RIFF????WAVE' is plain ASCII, so a text payload can carry
        # the magic without being a parseable WAV — fall back to the
        # stub on decode failure instead of failing the whole query.
        try:
            with wave.open(io.BytesIO(payload)) as w:
                width = w.getsampwidth()
                raw = w.readframes(w.getnframes())
        except (wave.Error, EOFError):
            return _fake_decode(payload)
        if width == 1:
            return np.frombuffer(raw, dtype=np.uint8)
        if width == 2:
            s = np.frombuffer(raw, dtype="<i2").astype(np.int32)
            return ((s + 32768) >> 8).astype(np.uint8)
        return np.frombuffer(raw, dtype=np.uint8)  # exotic widths: raw
    if payload[:2] == b"P5":
        parsed = _parse_pgm(payload)
        if parsed is not None:
            return parsed  # REAL 8-bit PGM raster, pure integer parse
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        # REAL pure-stdlib decode for the 8-bit grayscale subset first
        # (zlib + struct — live in THIS container, no PIL needed);
        # outside the subset (color, 16-bit, interlaced) fall through
        # to PIL where it exists, else the stub.
        parsed = _parse_png(payload)
        if parsed is not None:
            return parsed
    if payload[:8] == b"\x89PNG\r\n\x1a\n" or payload[:3] == b"\xff\xd8\xff":
        try:
            import io

            from PIL import Image

            img = Image.open(io.BytesIO(payload)).convert("L")
            return np.asarray(img, dtype=np.uint8).reshape(-1)
        except ImportError:
            pass  # no PIL in this container — stub keeps the contract
        except Exception:
            return _fake_decode(payload)  # magic hit, bytes not an image
    return _fake_decode(payload)


def _pgm_payloads(t: Tables) -> "DataFrame":
    """``documents`` as GENUINE binary-PGM payloads: one real container
    encode stage (``_encode_pgm``) shared by every image-path row, so
    the downstream ``_decode`` rides the real P5 parser — the byte
    stub never executes on these rows, and the oracles stay FULL
    because the raster bytes round-trip the container exactly."""
    raw = t.documents.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )

    def wrap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                _encode_pgm(bytes(p)) for p in pdf["payload"]
            ]
            yield pdf

    return raw.mapInPandas(wrap, schema="doc_id bigint, payload binary")


@query(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           md5(text) AS content_hash,
           lang
    FROM documents
    """,
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata extraction: payload size + content hash —
    the JVM-side (codegen) part of the multimodal pipeline."""
    t = Tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes"),
        F.md5("text").alias("content_hash"),
        "lang",
    )


@query(
    "mm_decode_features",
    oracle="""
    WITH b AS (
        SELECT d.doc_id, ascii(substr(d.text, i.i, 1)) AS v
        FROM documents d
        CROSS JOIN (SELECT unnest(generate_series(
                        1, (SELECT MAX(LEN(text)) FROM documents))) AS i) i
        WHERE i.i <= LEN(d.text)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS DOUBLE) AS n_samples,
           CAST(SUM(v) AS DOUBLE) AS sum_v,
           CAST(MIN(v) AS DOUBLE) AS min_v,
           CAST(MAX(v) AS DOUBLE) AS max_v
    FROM b GROUP BY doc_id
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract over binary payloads via ``mapInPandas``.

    The payload column carries GENUINE binary-PGM (P5) image files —
    a real container encode stage (``_encode_pgm``) wraps each
    document's bytes as a 1-row grayscale raster, and the decode is
    the REAL integer-math P5 parser (``_parse_pgm``): magic, header,
    raster offset, all parsed from actual container bytes.  No stub
    executes on this row.  Then a fixed-width feature row per image
    (length, sum, min, max of the sample stream; the SUM is
    integer-exact where a mean would hit cross-engine round-half
    ties) — the shape of a real image-embedding stage: binary in,
    fixed-width features out, streamed per Arrow batch with no driver
    involvement.

    The oracle stays FULL because the raster bytes round-trip the
    container exactly: encode(text) -> PGM -> parse == the utf-8
    bytes DuckDB reproduces from ``ascii(substr(...))``.  The
    encode/parse pair (incl. comment-tolerant headers and malformed
    fallbacks) is unit-covered in tests/test_multimodal_decode.py;
    a corpus of PNG/JPEG payloads would ride the guarded PIL branch
    instead (absent here), falling back to the stub and flipping the
    row WEAK — the PGM path has no such dependency."""
    t = Tables(spark, sf_dir)
    src = _pgm_payloads(t)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                s = _decode(bytes(payload))
                rows.append(
                    (
                        doc_id,
                        float(len(s)),
                        float(s.sum(dtype=np.int64)),
                        float(s.min()),
                        float(s.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_samples", "sum_v", "min_v", "max_v"],
            )

    return src.mapInPandas(
        extract,
        schema="doc_id bigint, n_samples double, sum_v double, "
        "min_v double, max_v double",
    )


@query(
    "mm_frame_sample",
    oracle="""
    WITH b AS (
        SELECT d.doc_id,
               CAST((i.i - 1) // 32 AS INTEGER) AS frame_idx,
               ascii(substr(d.text, i.i, 1)) AS v
        FROM documents d
        CROSS JOIN (SELECT unnest(generate_series(
                        1, (SELECT MAX(LEN(text)) FROM documents))) AS i) i
        WHERE i.i <= (LEN(d.text) // 32) * 32
    )
    SELECT doc_id, frame_idx, ROUND(AVG(v), 6) AS mean_intensity
    FROM b
    WHERE frame_idx % 4 = 0
    GROUP BY doc_id, frame_idx
    """,
)  # FULL: genuine PGM payloads, real P5 parse — the raster bytes
# round-trip the container exactly, so DuckDB reproduces the sample
# stream via ascii(substr(...))
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads: split each payload's
    decoded raster into fixed-size 'frames' (the video-frame-extraction
    shape), emit every 4th frame with its index and mean intensity —
    one-to-many binary op via ``mapInPandas`` (UDTF-like fan-out,
    Arrow-batched).  Payloads are GENUINE binary-PGM files
    (``_pgm_payloads``), so the decode is the real P5 raster parse —
    FULL because the raster round-trips the container exactly."""
    t = Tables(spark, sf_dir)
    src = _pgm_payloads(t)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, means = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                s = _decode(bytes(payload))
                n_frames = len(s) // _FRAME_BYTES
                for f in range(0, n_frames, 4):
                    frame = s[f * _FRAME_BYTES : (f + 1) * _FRAME_BYTES]
                    ids.append(doc_id)
                    idxs.append(f)
                    means.append(float(frame.mean()))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "mean_intensity": means}
            )

    return src.mapInPandas(
        sample, schema="doc_id bigint, frame_idx int, mean_intensity double"
    )


@query(
    "mm_feature_knn",
    oracle="""
    WITH bins AS (SELECT unnest(generate_series(0, 7)) AS bin),
    b AS (
        SELECT d.doc_id,
               CAST(FLOOR(ascii(substr(d.text, i.i, 1)) / 32) AS BIGINT)
                 AS bin
        FROM documents d
        CROSS JOIN (SELECT unnest(generate_series(
                        1, (SELECT MAX(LEN(text)) FROM documents))) AS i) i
        WHERE i.i <= LEN(d.text)
    ),
    h AS (SELECT doc_id, bin, COUNT(*) AS c FROM b GROUP BY 1, 2),
    full_h AS (
        SELECT d.doc_id, bins.bin, COALESCE(h.c, 0) AS c
        FROM (SELECT DISTINCT doc_id FROM documents) d
        CROSS JOIN bins
        LEFT JOIN h ON h.doc_id = d.doc_id AND h.bin = bins.bin
    ),
    q AS (SELECT bin, c FROM full_h WHERE doc_id = 0),
    d2 AS (
        SELECT f.doc_id,
               SUM((f.c - q.c) * (f.c - q.c)) AS dist
        FROM full_h f JOIN q USING (bin)
        WHERE f.doc_id <> 0
        GROUP BY 1
    )
    SELECT doc_id, CAST(dist AS BIGINT) AS dist
    FROM d2 ORDER BY dist, doc_id LIMIT 10
    """,
)
def mm_feature_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal RETRIEVAL path end-to-end: binary payload ->
    (stub) decode -> fixed-width feature vector -> kNN against a query
    payload's features — the image-similarity-search shape with every
    Spark-side stage real (Arrow-batched decode, broadcast query
    vector, JVM distance fold, TakeOrderedAndProject top-k).

    Features are 8-bin BYTE HISTOGRAMS (np.bincount of sample >> 5) and
    the distance is UNNORMALIZED integer squared-L2 — all-integer
    arithmetic end-to-end, so the kNN ordering has no cross-engine
    float-ulp hazard.  Payloads are GENUINE binary-PGM files
    (``_pgm_payloads``) decoded by the real P5 parser, and the row
    stays FULL because the raster round-trips the container exactly
    (the ``mm_decode_features`` argument)."""
    t = Tables(spark, sf_dir)
    src = _pgm_payloads(t)

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (
                    doc_id,
                    [
                        int(x)
                        for x in np.bincount(
                            _decode(bytes(payload)) >> 5, minlength=8
                        )[:8]
                    ],
                )
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "f"])

    feats = src.mapInPandas(
        featurize, schema="doc_id bigint, f array<bigint>"
    )
    q = feats.filter(F.col("doc_id") == 0).select(F.col("f").alias("qf"))
    dist = F.aggregate(
        F.zip_with("f", "qf", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        feats.filter(F.col("doc_id") != 0)
        .join(F.broadcast(q))
        .select("doc_id", dist.alias("dist"))
        .orderBy("dist", "doc_id")
        .limit(10)
    )


_AUDIO_FRAME = 32  # bytes per fake audio frame (mono u8 samples)


@query(
    "mm_audio_energy",
    oracle=f"""
    WITH s AS (
        SELECT d.doc_id,
               CAST((i.i - 1) // {_AUDIO_FRAME} AS BIGINT) AS frame,
               ascii(substr(d.text, CAST(i.i AS INTEGER), 1)) AS v
        FROM documents d
        CROSS JOIN (SELECT unnest(generate_series(
                        1, (SELECT MAX(LEN(text)) FROM documents))) AS i) i
        WHERE i.i <= LEN(d.text)
    ),
    f AS (
        SELECT doc_id, frame,
               COUNT(*) AS n,
               SUM(CAST(v AS BIGINT) * v) AS ss
        FROM s GROUP BY 1, 2
        HAVING COUNT(*) = {_AUDIO_FRAME}
    ),
    e AS (
        SELECT doc_id, frame, SQRT(ss * 1.0 / n) AS rms,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY ss DESC, frame) AS rk
        FROM f
    )
    SELECT e.doc_id,
           (SELECT COUNT(*) FROM f WHERE f.doc_id = e.doc_id)
               AS n_frames,
           e.frame AS peak_frame,
           ROUND(e.rms, 6) AS peak_rms
    FROM e WHERE rk = 1
    """,
)
def mm_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The AUDIO half of the multimodal story: binary payload -> REAL
    WAV-PCM decode -> per-frame RMS energy -> peak-frame detection
    (the loudness analysis behind silence trimming, voice-activity
    gating, and clip-level loudness normalization in an audio-training
    pipeline). Frames are 32 u8 samples; partial tail frames are
    dropped (fixed-width frame contract).

    The payload column carries GENUINE .wav files: a real encode
    stage (``_encode_wav_u8``, stdlib ``wave`` writer) wraps each
    document's bytes as mono 8-bit-PCM audio, and the decode is the
    REAL stdlib ``wave`` RIFF parse in ``_decode`` — header, fmt
    chunk, frame extraction, all from actual container bytes.  No
    stub executes on this row; the oracle stays FULL because 8-bit
    PCM samples round-trip the container exactly (encode(text) ->
    WAV -> decode == the utf-8 bytes DuckDB reads via
    ``ascii(substr(...))``).  Peak selection orders by the INTEGER
    energy sum (exact; the float RMS is computed only for display),
    with the frame index as tie-break — no float-ordering hazard."""
    t = Tables(spark, sf_dir)
    raw = t.documents.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )

    def wrap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # real container encode: downstream payloads are valid .wav
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                _encode_wav_u8(bytes(p)) for p in pdf["payload"]
            ]
            yield pdf

    src = raw.mapInPandas(wrap, schema="doc_id bigint, payload binary")

    def energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nf, pf, pr = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                s = _decode(bytes(payload)).astype(np.int64)
                n_frames = len(s) // _AUDIO_FRAME
                if n_frames == 0:
                    continue
                frames = s[: n_frames * _AUDIO_FRAME].reshape(
                    n_frames, _AUDIO_FRAME
                )
                ss = (frames * frames).sum(axis=1)  # exact int64
                peak = int(ss.argmax())  # first max == smallest index
                ids.append(doc_id)
                nf.append(n_frames)
                pf.append(peak)
                pr.append(float(np.sqrt(ss[peak] / _AUDIO_FRAME)))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_frames": nf,
                    "peak_frame": pf,
                    "peak_rms": pr,
                }
            )

    out = src.mapInPandas(
        energy,
        schema="doc_id bigint, n_frames bigint, peak_frame bigint, "
        "peak_rms double",
    )
    # JVM-side half-up rounding (Python round() is banker's — ties)
    return out.select(
        "doc_id",
        "n_frames",
        "peak_frame",
        F.round("peak_rms", 6).alias("peak_rms"),
    )


_RESIZE_W = 64  # target samples after block-average resize


@query(
    "mm_resize",
    oracle=f"""
    WITH s AS (
        SELECT d.doc_id,
               LEN(d.text) AS n,
               ((i.i - 1) * {_RESIZE_W}) // LEN(d.text) AS j,
               ascii(substr(d.text, CAST(i.i AS INTEGER), 1)) AS v
        FROM documents d
        CROSS JOIN (SELECT unnest(generate_series(
                        1, (SELECT MAX(LEN(text)) FROM documents))) AS i) i
        WHERE i.i <= LEN(d.text) AND LEN(d.text) >= {_RESIZE_W}
    ),
    b AS (
        SELECT doc_id, j,
               SUM(CAST(v AS BIGINT)) AS sv, COUNT(*) AS c
        FROM s GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS width,
           ROUND(MIN(sv * 1.0 / c), 6) AS min_sample,
           ROUND(MAX(sv * 1.0 / c), 6) AS max_sample,
           ROUND(SUM(sv) * 1.0 / SUM(c), 6) AS mean_sample
    FROM b GROUP BY doc_id
    """,
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RESIZE stage of the multimodal pipeline: every binary
    payload block-average downsampled to a fixed 64-sample signal (the
    1-D stand-in for image thumbnailing / audio resampling to a model's
    fixed input width), summarized per doc (width, min/max/mean
    sample). Payloads shorter than the target width are dropped —
    upsampling is a different contract.

    Arrow-batched ``mapInPandas`` like the other decode stages, over
    GENUINE binary-PGM payloads (``_pgm_payloads`` — the real P5
    parse, not the stub); each output sample is an integer byte-sum
    over its block divided once (exact inputs → identical floats in
    any engine). The mapping position→block is integer arithmetic
    (floor((i·W)/n)), so block boundaries are bit-identical too."""
    t = Tables(spark, sf_dir)
    src = _pgm_payloads(t)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, mn, mx, me = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                s = _decode(bytes(payload)).astype(np.int64)
                n = len(s)
                if n < _RESIZE_W:
                    continue
                j = (np.arange(n) * _RESIZE_W) // n
                sums = np.bincount(j, weights=s, minlength=_RESIZE_W)
                cnts = np.bincount(j, minlength=_RESIZE_W)
                means = sums / cnts
                ids.append(doc_id)
                ws.append(_RESIZE_W)
                mn.append(float(means.min()))
                mx.append(float(means.max()))
                me.append(float(s.sum() / n))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": ws,
                    "min_sample": mn,
                    "max_sample": mx,
                    "mean_sample": me,
                }
            )

    out = src.mapInPandas(
        resize,
        schema="doc_id bigint, width bigint, min_sample double, "
        "max_sample double, mean_sample double",
    )
    # round JVM-side: F.round is half-up like the oracle's ROUND;
    # Python's round() is banker's and diverges on exact .5 ties
    return out.select(
        "doc_id",
        "width",
        F.round("min_sample", 6).alias("min_sample"),
        F.round("max_sample", 6).alias("max_sample"),
        F.round("mean_sample", 6).alias("mean_sample"),
    )
