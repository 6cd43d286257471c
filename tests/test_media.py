"""Multimodal-column plumbing gates (operators/media.py + mediaops.py):
deterministic synthesis, fake-decode correctness vs pure Python, Arrow
batch shape honored, real-backend stubs fail loudly AT CALL TIME, frame
slicing stays JVM-side, resize is shape-exact."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from kgpipe.operators.media import (
    decode_media_features,
    resize_images,
    sample_frames,
)
from kgpipe.queries.mediaops import _PAYLOAD_BYTES, media_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return media_table(spark, SF_DIR).cache()


def test_media_table_deterministic_and_typed(spark, media):
    rows = media.collect()
    assert rows
    assert {r.kind for r in rows} <= {"image", "audio", "video"}
    for r in rows:
        assert isinstance(r.payload, (bytes, bytearray))
        assert len(r.payload) == _PAYLOAD_BYTES
        if r.kind == "audio":
            assert r.sample_rate >= 8000 and r.width == 0
        else:
            assert r.sample_rate == 0 and r.width >= 16
        if r.kind == "video":
            assert 4 <= r.n_frames <= 8
        else:
            assert r.n_frames == 1
    again = {(r.media_id, bytes(r.payload))
             for r in media_table(spark, SF_DIR).collect()}
    assert {(r.media_id, bytes(r.payload)) for r in rows} == again


def test_fake_decode_matches_pure_python(spark, media):
    got = {r.media_id: r for r in decode_media_features(media).collect()}
    for r in media.collect():
        a = np.frombuffer(bytes(r.payload), dtype=np.uint8)
        g = got[r.media_id]
        assert g.n_bytes == a.size
        assert g.mean_byte == pytest.approx(float(a.mean()))
        want_hist = np.bincount(a >> 4, minlength=16) / a.size
        assert np.allclose(g.byte_hist, want_hist)


def test_decode_honors_arrow_batch_size(spark, media):
    """mapInPandas must receive Arrow record batches bounded by
    maxRecordsPerBatch — the decoder reports the batch it rode in on."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "7")
    try:
        batch_sizes = {r.batch_rows for r in
                       decode_media_features(media).collect()}
    finally:
        spark.conf.set(key, old)
    assert max(batch_sizes) <= 7
    assert len(batch_sizes) >= 1


def test_real_backends_fail_loudly_at_call_time(media):
    for backend in ("pil", "librosa", "av"):
        with pytest.raises(NotImplementedError, match="codec"):
            decode_media_features(media, backend=backend)
    with pytest.raises(ValueError, match="unknown"):
        resize_images(media, 8, 8, backend="opencv")


def test_frame_sampling_matches_python_slicing(spark, media):
    frames = sample_frames(media, every_k=2).collect()
    payloads = {r.media_id: (bytes(r.payload), r.n_frames)
                for r in media.filter("kind = 'video'").collect()}
    assert frames and payloads
    seen = set()
    for f in frames:
        payload, n_frames = payloads[f.media_id]
        flen = len(payload) // n_frames
        assert f.frame_idx % 2 == 0 and f.frame_len == flen
        start = f.frame_idx * flen
        assert bytes(f.frame) == payload[start:start + flen]
        seen.add(f.media_id)
    assert seen == set(payloads)  # every video sampled


def test_frame_sampling_is_jvm_only(spark, media):
    df = sample_frames(media)
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    assert "Python" not in plan  # no Arrow/Batch eval nodes: pure codegen


def test_resize_is_shape_exact_and_deterministic(spark, media):
    out = resize_images(media, 8, 8).collect()
    n_images = media.filter("kind = 'image'").count()
    assert len(out) == n_images > 0
    digests = set()
    for r in out:
        assert len(r.resized) == 64
        digests.add(hashlib.md5(bytes(r.resized)).hexdigest())
    out2 = {(r.media_id, bytes(r.resized))
            for r in resize_images(media, 8, 8).collect()}
    assert {(r.media_id, bytes(r.resized)) for r in out} == out2
