from __future__ import annotations

import pytest

from dic_a1_spark.operators import multimodal
from tests.conftest import SF_CORRECT, SF_SMOKE
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(multimodal.ORACLES))
def test_multimodal_oracle(spark, name):
    compare(
        spark, multimodal.ORACLES[name], multimodal.QUERIES[name], SF_CORRECT, name
    )


def test_real_decode_is_gated():
    with pytest.raises(NotImplementedError):
        multimodal.real_decode(b"\x00\x01")


def test_decode_batch_shape(spark):
    out = multimodal.QUERIES["multimodal_decode_stub"](spark, SF_SMOKE)
    assert [f.name for f in out.schema] == [
        "doc_id", "byte_len", "width", "height", "n_frames", "mode",
    ]
    row = out.orderBy("doc_id").first()
    assert row["mode"] == "stub" and row["width"] >= 16


def test_header_parse_matches_struct_unpack(spark):
    """Independent byte-level check of the r11 header parser: re-parse the
    SAME payload bytes with Python struct (PNG spec: 8-byte signature,
    IHDR length/tag, BE uint32 width/height, depth/color bytes; WAV spec:
    RIFF/WAVE tags, LE uint16/uint32 fmt fields, data size) and demand
    field-for-field equality with the Spark hex/conv expressions."""
    import struct

    payloads = {
        r["doc_id"]: r["payload"]
        for r in multimodal.synth_media_payloads(
            spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        ).collect()
    }
    parsed = {
        r["doc_id"]: r
        for r in multimodal.QUERIES["multimodal_header_meta"](
            spark, SF_SMOKE
        ).collect()
    }
    assert set(payloads) == set(parsed)
    n_png = n_wav = 0
    for doc_id, raw in payloads.items():
        row = parsed[doc_id]
        if raw is None:
            assert row["container"] is None
            continue
        b = bytes(raw)
        if b[:8] == b"\x89PNG\r\n\x1a\n":
            n_png += 1
            assert row["container"] == "png"
            length, tag = struct.unpack(">I4s", b[8:16])
            assert length == 13 and tag == b"IHDR"
            w, h, depth, color = struct.unpack(">IIBB", b[16:26])
            assert (row["width"], row["height"]) == (w, h)
            assert (row["bit_depth"], row["color_type"]) == (depth, color)
            assert row["n_channels"] is None
        else:
            n_wav += 1
            assert row["container"] == "wav"
            assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
            assert b[12:16] == b"fmt " and b[36:40] == b"data"
            fmt_len, audio_fmt, ch, rate, byte_rate, block, bits = struct.unpack(
                "<IHHIIHH", b[16:36]
            )
            assert fmt_len == 16 and audio_fmt == 1
            (data_len,) = struct.unpack("<I", b[40:44])
            assert len(b) == 44 + data_len
            assert byte_rate == rate * block and block == ch * bits // 8
            assert (row["n_channels"], row["sample_rate"]) == (ch, rate)
            assert (row["bits_per_sample"], row["data_bytes"]) == (bits, data_len)
            assert row["width"] is None
    assert n_png and n_wav
