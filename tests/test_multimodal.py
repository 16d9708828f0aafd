"""Multimodal binary-column plumbing: Arrow-batched transforms with
stubbed decoders must have real schemas, determinism, and batch shape."""

import pytest

from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.multimodal import (
    decode_image,
    resize_images,
    sample_frames,
    with_binary_payload,
)

from conftest import TESTDATA


def _docs(spark, n=20):
    docs = spark.read.parquet(f"{TESTDATA}/documents.parquet").limit(n)
    return with_binary_payload(docs)


def test_decode_stub_is_clearly_marked():
    with pytest.raises(NotImplementedError, match="not available"):
        decode_image(b"\x89PNG...")


def test_resize_schema_and_determinism(spark):
    out = resize_images(_docs(spark), width=8, height=6)
    rows = {r.doc_id: r for r in out.collect()}
    again = {r.doc_id: r for r in resize_images(_docs(spark), 8, 6).collect()}
    assert len(rows) == 20
    for doc_id, r in rows.items():
        assert (r.width, r.height, r.channels) == (8, 6, 3)
        assert len(r.resized) == 8 * 6 * 3
        assert bytes(r.resized) == bytes(again[doc_id].resized)


def test_sample_frames_explodes_with_stable_order(spark):
    out = sample_frames(_docs(spark), n_frames=4)
    rows = out.collect()
    assert len(rows) == 20 * 4
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, frames in by_doc.items():
        assert sorted(f.frame_idx for f in frames) == [0, 1, 2, 3]
        for f in frames:
            assert f.frame_bytes == len(f.frame) > 0
