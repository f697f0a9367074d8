"""Round-6 additions: real pure-Python PNG/WAV codecs, REST mutation
surface glue, and plan-shape fixes from the r5 verdict."""

from __future__ import annotations

import pytest


class TestRealCodecs:
    """The PNG/WAV paths operate on REAL bytes — spec-valid files out,
    CRC/structure-checked parses back (public W3C PNG + RIFF specs)."""

    def test_png_roundtrip(self):
        from heroku_kafka_connect_spark.functions.multimodal import (
            encode_png,
            parse_png,
        )

        for w, h in [(1, 1), (640, 480), (639, 1), (13, 7)]:
            assert parse_png(encode_png(w, h)) == (w, h, 8, 0)

    def test_png_is_spec_valid(self):
        """Signature, chunk layout, CRCs, and a decompressible IDAT of
        filter-0 scanlines — a standards-compliant viewer would open
        this file."""
        import struct
        import zlib

        from heroku_kafka_connect_spark.functions.multimodal import encode_png

        b = encode_png(3, 2)
        assert b[:8] == b"\x89PNG\r\n\x1a\n"
        off = 16 + 13 + 4  # past IHDR
        ln, tag = struct.unpack(">I4s", b[off : off + 8])
        assert tag == b"IDAT"
        assert zlib.decompress(b[off + 8 : off + 8 + ln]) == (b"\x00" * 4) * 2
        assert b[-12:][4:8] == b"IEND"

    def test_png_rejects_garbage_and_bad_crc(self):
        from heroku_kafka_connect_spark.functions.multimodal import (
            encode_png,
            parse_png,
        )

        with pytest.raises(ValueError):
            parse_png(b"not a png at all, just bytes....")
        good = bytearray(encode_png(5, 5))
        good[20] ^= 0xFF  # corrupt a dimension byte, CRC now wrong
        with pytest.raises(ValueError):
            parse_png(bytes(good))

    def test_wav_roundtrip_and_alignment(self):
        from heroku_kafka_connect_spark.functions.multimodal import (
            encode_wav,
            parse_wav,
        )

        assert parse_wav(encode_wav(8000, 100)) == (8000, 1, 16, 100)
        assert parse_wav(encode_wav(16000, 0, channels=2)) == (16000, 2, 16, 0)
        with pytest.raises(ValueError):
            parse_wav(b"RIFFxxxxNOPE")

    def test_decode_images_real_vs_stub_branch(self, spark):
        """One frame: PNG payloads parse for real, non-PNG payloads
        keep the deterministic stub — both through the same Arrow
        batch loop."""
        from heroku_kafka_connect_spark.functions import multimodal as mm

        df = spark.createDataFrame(
            [(1, "hello world"), (2, "x" * 100)], "doc_id bigint, text string"
        )
        real = mm.decode_images(mm.attach_png_payload(df)).collect()
        assert {r.decoder for r in real} == {"png-pure-python"}
        assert {(r.doc_id, r.width, r.height) for r in real} == {
            (1, 11 % 640 + 1, 11 % 480 + 1),
            (2, 100 % 640 + 1, 100 % 480 + 1),
        }
        assert all(r.bit_depth == 8 and r.color_type == 0 and r.n_frames == 1 for r in real)
        stub = mm.decode_images(mm.attach_payload(df)).collect()
        assert {r.decoder for r in stub} == {"stub-deterministic"}
