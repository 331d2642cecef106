"""Multimodal binary-column plumbing (decode stubbed; schema + Arrow
batch shape are real)."""

from __future__ import annotations

import hashlib

import pytest

from jsonld_spark.operators.multimodal import (FEATURE_DIM, decode_image,
                                               extract_media_features,
                                               synth_media_from_documents,
                                               _HAS_PIL)

SF_DIR = "/root/testdata/sf0.001"


def test_decode_is_stubbed():
    if _HAS_PIL:
        pytest.skip("PIL present — decode not stubbed in this env")
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff")


def test_media_schema_and_features(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    media = synth_media_from_documents(docs)
    assert dict(media.dtypes)["content"] == "binary"
    feats = extract_media_features(media)
    rows = {r.doc_id: r for r in feats.collect()}
    assert len(rows) == docs.count()
    r = rows[3]
    content = bytes.fromhex(hashlib.md5(b"3").hexdigest())
    assert r.n_bytes == 16
    assert r.content_hex == content.hex()
    d = hashlib.md5(content.hex().encode()).digest()
    assert len(r.feature) == FEATURE_DIM
    assert r.feature == pytest.approx([d[i] / 255.0
                                       for i in range(FEATURE_DIM)])


def test_resize_and_frames_shapes(spark):
    """Resize keeps one row per media with the target dims; frame
    sampling fans out exactly n_frames rows per media with distinct
    deterministic signatures."""
    import pytest as _pytest

    from jsonld_spark.operators.multimodal import (resize_media,
                                                   sample_frames,
                                                   synth_media_from_documents)
    docs = spark.createDataFrame([(1, "a", 10), (2, "b", 20)],
                                 "doc_id long, text string, n_chars long")
    media = synth_media_from_documents(docs)
    r = resize_media(media, 64, 48).collect()
    assert {(x.doc_id, x.width, x.height) for x in r} == {(1, 64, 48),
                                                          (2, 64, 48)}
    # same content+dims → same bytes; different dims → different bytes
    r2 = {x.doc_id: x.content_hex for x in resize_media(media, 64, 48)
          .collect()}
    assert {x.doc_id: x.content_hex for x in r} == r2
    f = sample_frames(media, 3).collect()
    assert len(f) == 6
    per_doc = {}
    for x in f:
        per_doc.setdefault(x.doc_id, set()).add((x.frame_idx, x.frame_sig))
    assert all(len(v) == 3 for v in per_doc.values())
    with _pytest.raises(ValueError, match="n_frames"):
        sample_frames(media, 0)
