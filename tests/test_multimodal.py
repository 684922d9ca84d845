"""Multimodal plumbing: binary payload schema, feature extraction,
frame sampling, stubbed decode gate."""

from __future__ import annotations

import math

import pytest

from annoy_spark.functions.multimodal import (
    decode_image,
    extract_features,
    frame_sample,
    media_table_from_documents,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(1, "abcd" * 100), (2, ""), (3, "\x00\x01" * 64)],
        "doc_id long, text string",
    )
    return media_table_from_documents(docs)


def test_media_schema(media):
    assert dict(media.dtypes)["payload"] == "binary"
    assert media.count() == 3


def test_extract_features(media):
    rows = {r.media_id: r for r in extract_features(media, hist_bins=16).collect()}
    assert rows[1].n_bytes == 400
    # 'abcd' -> 4 distinct bytes, uniform -> entropy = 2 bits
    assert abs(rows[1].byte_entropy - 2.0) < 1e-9
    assert rows[2].n_bytes == 0 and rows[2].byte_entropy == 0.0
    assert len(rows[1].histogram) == 16
    assert abs(sum(rows[1].histogram) - 1.0) < 1e-9


def test_frame_sample(media):
    frames = frame_sample(media, every_n=1).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    assert len(by_id[1]) == math.ceil(400 / 64)
    assert by_id[1][0].frame == b"abcd" * 16
    assert 2 not in by_id  # empty payload -> no frames


def test_decode_is_env_gated(media):
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; stub gate not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(media)
