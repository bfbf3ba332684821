"""Multimodal plumbing contracts beyond the oracle comparison."""

from __future__ import annotations

import pytest

from etl_jobs_spark.operators import multimodal as MM
from etl_jobs_spark.sources.readers import read_table
from tests.conftest import SF_DIR


def test_media_schema(spark):
    df = MM.attach_fake_media(read_table(spark, SF_DIR, "documents"))
    assert dict(df.dtypes)["media"] == "binary"
    assert dict(df.dtypes)["meta"].startswith("struct<width:int,height:int")
    row = df.first()
    assert len(row["media"]) == MM.MEDIA_BYTES
    assert 1 <= row["meta"]["width"] <= 640


def test_real_decode_is_stubbed(spark):
    df = MM.attach_fake_media(read_table(spark, SF_DIR, "documents"))
    with pytest.raises(NotImplementedError):
        MM.decode_image_real(df)
