"""Multimodal plumbing tests (X6): binary schema, Arrow feature extraction,
frame-sampling fan-out, and the honest-stub contract for real codecs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from webscale_vector_search_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_image,
    extract_features,
    frame_sample_plan,
    media_from_documents,
)
from webscale_vector_search_spark.sources.fixtures import load_table


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, "documents", SF_SMOKE).filter(F.col("doc_id") < 60)
    return media_from_documents(docs).cache()


def test_media_schema_and_types(media):
    pdf = media.toPandas()
    assert set(pdf.columns) == {"media_id", "media_type", "content", "n_bytes", "content_hash"}
    assert set(pdf["media_type"]) == {"image", "audio", "video"}
    assert (pdf["n_bytes"] > 0).all()
    assert isinstance(pdf["content"].iloc[0], (bytes, bytearray))


def test_extract_features_deterministic_shape(media):
    f1 = extract_features(media).toPandas().sort_values("media_id").reset_index(drop=True)
    f2 = extract_features(media).toPandas().sort_values("media_id").reset_index(drop=True)
    assert len(f1) == media.count()
    assert all(len(v) == FEATURE_DIM for v in f1["feature"])
    assert all((a == b).all() for a, b in zip(f1["feature"], f2["feature"]))
    # features are normalized byte means
    import numpy as np

    assert all(0.0 <= float(np.max(v)) <= 1.0 for v in f1["feature"])


def test_frame_sample_plan_fanout(media):
    frames = frame_sample_plan(media, every_n=2).toPandas()
    assert len(frames) > 0
    assert (frames["frame_no"] % 2 == 0).all()
    videos = media.filter(F.col("media_type") == "video").count()
    assert frames["media_id"].nunique() == videos


def test_real_codec_is_an_honest_stub(media):
    with pytest.raises(NotImplementedError, match="image codec"):
        decode_image(media)
