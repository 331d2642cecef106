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
