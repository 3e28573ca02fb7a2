"""I2 — multimodal mapInPandas plumbing: schema, batching, stub gating."""

from __future__ import annotations

import pytest

from australian_company_etl_spark.operators.multimodal import (
    attach_payload,
    decode_meta,
    fake_decode,
    real_decode,
    sample_frames,
)
from australian_company_etl_spark.sources.registry import load_tables


def _docs(spark, sf_dir):
    return load_tables(spark, sf_dir, ["documents"])["documents"]


def test_real_decode_is_gated():
    with pytest.raises(NotImplementedError):
        real_decode(b"\x89PNG")


def test_decode_meta_schema_and_determinism(spark, sf_dir):
    mm = attach_payload(_docs(spark, sf_dir))
    out = decode_meta(mm, decoder=fake_decode)
    assert out.columns == ["doc_id", "byte_len", "width", "height", "channels", "mean_byte"]
    rows = {r.doc_id: r for r in out.collect()}
    docs = {r.doc_id: r.text for r in _docs(spark, sf_dir).collect()}
    assert len(rows) == len(docs)
    # fake decoder is a pure function of the bytes
    some = next(iter(rows))
    w, h, c, mean = fake_decode(docs[some].encode())
    r = rows[some]
    assert (r.width, r.height, r.channels) == (w, h, c)
    assert abs(r.mean_byte - mean) < 1e-9
    assert r.byte_len == len(docs[some].encode())


def test_sample_frames_shape(spark, sf_dir):
    mm = attach_payload(_docs(spark, sf_dir).limit(20))
    frames = sample_frames(mm, stride=64, max_frames=3)
    rows = frames.collect()
    assert {r.frame_idx for r in rows} <= {0, 1, 2}
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == 20
    for frs in by_doc.values():
        # frames are contiguous byte windows, ≤ stride bytes each
        assert [f.frame_idx for f in sorted(frs, key=lambda f: f.frame_idx)] == list(
            range(len(frs))
        )
        assert all(len(bytes(f.frame_bytes)) <= 64 for f in frs)
