"""The codec-dispatching decoder (multimodal._decode): the REAL wav
path must decode PCM exactly (stdlib ``wave`` is always available), the
image path must fall back to the stub when PIL is absent, and
non-container payloads (the fixtures' utf-8 text) must be byte-stub
identical — which is what keeps the mm_* oracles FULL here."""

from __future__ import annotations

import io
import wave

import numpy as np

from traj_sim_spark_spark.operators.multimodal import _decode, _fake_decode


def _wav_bytes(samples: np.ndarray, width: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(width)
        w.setframerate(8000)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def test_wav_8bit_pcm_decodes_exactly():
    s = np.arange(256, dtype=np.uint8)
    out = _decode(_wav_bytes(s, 1))
    assert out.dtype == np.uint8
    assert np.array_equal(out, s)


def test_wav_16bit_pcm_maps_to_uint8_domain():
    s = np.array([-32768, -1, 0, 1, 32767], dtype="<i2")
    out = _decode(_wav_bytes(s, 2))
    assert out.dtype == np.uint8
    # (s + 32768) >> 8, deterministic and monotone
    assert out.tolist() == [0, 127, 128, 128, 255]


def test_text_payload_falls_through_to_stub():
    payload = "the quick brown fox".encode("utf-8")
    assert np.array_equal(_decode(payload), _fake_decode(payload))


def test_png_magic_without_pil_falls_through_to_stub():
    payload = b"\x89PNG\r\n\x1a\n" + bytes(range(32))
    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if not have_pil:
        assert np.array_equal(_decode(payload), _fake_decode(payload))


def test_riff_non_wave_is_not_misdetected():
    payload = b"RIFF" + b"\x00" * 4 + b"AVI " + bytes(range(16))
    assert np.array_equal(_decode(payload), _fake_decode(payload))


def test_malformed_wav_magic_falls_back_to_stub():
    """'RIFF????WAVE' is plain ASCII, so a text payload can spell the
    WAV magic without being parseable — the decode must fall back to
    the byte stub, not crash the query (round-6 ADVICE fix)."""
    payload = b"RIFF1234WAVEthis is not a real wave file at all"
    out = _decode(payload)
    assert np.array_equal(out, _fake_decode(payload))


def test_truncated_wav_header_falls_back_to_stub():
    """A RIFF/WAVE header cut off mid-chunk raises wave.Error/EOFError
    inside wave.open — same stub fallback."""
    real = _wav_bytes(np.arange(64, dtype=np.uint8), 1)
    payload = real[:20]  # valid magic, truncated fmt chunk
    out = _decode(payload)
    assert np.array_equal(out, _fake_decode(payload))


def test_pgm_roundtrip_decodes_exactly():
    """The REAL image path: _encode_pgm wraps bytes in a genuine P5
    container and _decode's P5 branch parses the raster back exactly."""
    from traj_sim_spark_spark.operators.multimodal import _encode_pgm

    data = bytes(range(256))
    payload = _encode_pgm(data)
    assert payload.startswith(b"P5\n256 1\n255\n")
    out = _decode(payload)
    assert out.dtype == np.uint8
    assert out.tobytes() == data


def test_pgm_comment_tolerant_header():
    payload = b"P5\n# a netpbm comment\n 4 \n# again\n2\n255\n" + bytes(8)
    out = _decode(payload)
    assert out.tolist() == [0] * 8


def test_pgm_like_text_falls_back_to_stub():
    """A text payload that merely starts with 'P5' must not be
    misparsed — no digits follow, so _parse_pgm returns None and the
    stub reproduces the bytes (what keeps text-payload rows FULL)."""
    payload = b"P5 is a chess opening, not this document"
    assert np.array_equal(_decode(payload), _fake_decode(payload))


def test_pgm_truncated_raster_falls_back_to_stub():
    from traj_sim_spark_spark.operators.multimodal import _encode_pgm

    payload = _encode_pgm(bytes(range(64)))[:-10]  # raster short
    assert np.array_equal(_decode(payload), _fake_decode(payload))


def test_pgm_16bit_maxval_falls_back_to_stub():
    payload = b"P5\n2 1\n65535\n" + bytes(4)
    assert np.array_equal(_decode(payload), _fake_decode(payload))


def test_png_roundtrip_decodes_exactly():
    """The REAL stdlib PNG path (round 11): _encode_png writes a
    genuine 8-bit grayscale PNG (CRC-stamped chunks, zlib IDAT) and
    _decode's _parse_png branch inflates + unfilters the raster back
    exactly — no PIL involved."""
    from traj_sim_spark_spark.operators.multimodal import _encode_png

    data = bytes(range(256)) * 3
    payload = _encode_png(data)
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    out = _decode(payload)
    assert out.dtype == np.uint8
    assert out.tobytes() == data


def test_png_all_filter_types_unfilter_correctly():
    """_parse_png implements all five standard filters; build a 5-row
    image where row r uses filter r and check against the spec's
    reconstruction functions applied by hand."""
    import struct
    import zlib

    from traj_sim_spark_spark.operators.multimodal import _parse_png

    w, h = 7, 5
    truth = np.arange(w * h, dtype=np.int32).reshape(h, w) * 13 % 256
    scan = b""
    prev = np.zeros(w, dtype=np.int32)
    for r in range(h):
        row = truth[r]
        f = r  # filter type == row index: exercises 0..4
        enc = np.empty(w, dtype=np.int32)
        for x in range(w):
            a = int(row[x - 1]) if x else 0
            b = int(prev[x])
            c = int(prev[x - 1]) if x else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            enc[x] = (int(row[x]) - pred) & 0xFF
        scan += bytes([f]) + enc.astype(np.uint8).tobytes()
        prev = row
    def chunk(typ, body):
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    out = _parse_png(payload)
    assert out is not None
    assert out.tolist() == truth.reshape(-1).tolist()


def test_png_bad_crc_falls_back_to_stub():
    """A bit-flipped chunk body must fail the CRC check and stub."""
    from traj_sim_spark_spark.operators.multimodal import _encode_png

    payload = bytearray(_encode_png(bytes(range(64))))
    payload[40] ^= 0xFF  # inside IDAT
    payload = bytes(payload)
    assert np.array_equal(_decode(payload), _fake_decode(payload))


def test_png_color_type_outside_subset_falls_back():
    """An RGB (color type 2) IHDR is outside the stdlib subset — with
    no PIL the decode must stub, not misparse."""
    import struct
    import zlib

    def chunk(typ, body):
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" + bytes(6)))
        + chunk(b"IEND", b"")
    )
    try:
        import PIL  # noqa: F401
    except ImportError:
        assert np.array_equal(_decode(payload), _fake_decode(payload))


def test_phash_bands_rejects_non_pgm():
    """mm_phash_nn's hash kernel enforces the PGM-only caller contract
    (round-10 ADVICE): a payload _parse_pgm rejects must RAISE, never
    silently fall back to the byte stub — a malformed container would
    otherwise diverge from the ascii(substr(...)) oracle unnoticed."""
    import pytest

    from traj_sim_spark_spark.operators.extras2 import _phash_bands
    from traj_sim_spark_spark.operators.multimodal import _encode_pgm

    with pytest.raises(ValueError, match="binary PGM"):
        _phash_bands(b"P5 is a chess opening, not this document", 8)
    with pytest.raises(ValueError, match="binary PGM"):
        _phash_bands(_encode_pgm(bytes(range(64)))[:-10], 8)  # short
    # and a genuine container hashes fine
    bands = _phash_bands(_encode_pgm(bytes(range(128))), 8)
    assert len(bands) == 8 and all(0 <= b < 256 for b in bands)


def test_wav_u8_encoder_roundtrip():
    """The REAL audio path: _encode_wav_u8 writes a genuine RIFF/WAVE
    container and _decode's wave branch extracts the PCM exactly."""
    from traj_sim_spark_spark.operators.multimodal import _encode_wav_u8

    data = bytes(range(256))
    payload = _encode_wav_u8(data)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    out = _decode(payload)
    assert out.dtype == np.uint8
    assert out.tobytes() == data
