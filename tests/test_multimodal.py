"""Multimodal plumbing tests: binary ingest, Arrow-batched decode,
resize, and 1→N frame sampling (the fake codec is deterministic; real
codecs are a marked NotImplementedError integration point)."""

from __future__ import annotations

import pytest

from go_fish_spark.operators import multimodal


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, "hello world, a payload of some length"), (2, "tiny")],
        "doc_id long, text string",
    )


def test_ingest_binary_meta(spark, docs):
    out = {r.doc_id: r for r in multimodal.ingest_binary(docs, "doc_id", "text").collect()}
    assert bytes(out[1].content).decode() == "hello world, a payload of some length"
    assert out[1].meta.n_bytes == 37 and out[2].meta.n_bytes == 4
    assert len(out[1].meta.sha) == 64


def test_decode_features_fake_and_unimplemented(spark, docs):
    b = multimodal.ingest_binary(docs, "doc_id", "text")
    rows = {r.doc_id: r for r in multimodal.decode_features(b).collect()}
    assert rows[1].n_pixels == rows[1].width * rows[1].height
    assert rows[1].status == "fake-decoded"
    with pytest.raises(NotImplementedError, match="codec"):
        multimodal.decode_features(b, codec="png")


def test_resize_media_truncates_deterministically(spark, docs):
    b = multimodal.ingest_binary(docs, "doc_id", "text")
    out = {r.doc_id: r for r in multimodal.resize_media(b, 8, 8, codec="fake").collect()}
    # cap = 8*8//8 = 8 bytes; short payloads pass through whole
    assert out[1].n_bytes == 8 and bytes(out[1].content) == b"hello wo"
    assert out[2].n_bytes == 4
    assert (out[1].width, out[1].height) == (8, 8)
    with pytest.raises(NotImplementedError):
        multimodal.resize_media(b, 8, 8, codec="jpeg")


def test_sample_frames_fan_out_and_provenance(spark, docs):
    b = multimodal.ingest_binary(docs, "doc_id", "text")
    rows = multimodal.sample_frames(b, n_frames=4, frame_bytes=5).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 37 bytes, stride 9 -> 4 frames at offsets 0,9,18,27
    f1 = sorted(by_doc[1], key=lambda r: r.frame_idx)
    assert [(r.frame_off, r.frame_len) for r in f1] == [(0, 5), (9, 5), (18, 5), (27, 5)]
    assert bytes(f1[0].frame) == b"hello"
    # doc 2: 4 bytes, stride 1 -> 4 frames, shrinking tail windows
    f2 = sorted(by_doc[2], key=lambda r: r.frame_idx)
    assert [(r.frame_off, r.frame_len) for r in f2] == [(0, 4), (1, 3), (2, 2), (3, 1)]
    assert bytes(f2[3].frame) == b"y"
