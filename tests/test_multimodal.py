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
