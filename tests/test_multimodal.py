"""Multimodal binary-column plumbing: schema, batching, stubbed decode."""

import hashlib

import pytest

from scardina_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(tables):
    return M.documents_as_media(tables["documents"]).cache()


def test_media_schema_and_digest(media, duck):
    assert [f.name for f in media.schema.fields] == [
        "media_id", "kind", "payload", "n_bytes", "digest"]
    row = media.orderBy("media_id").first()
    assert row["digest"] == hashlib.md5(bytes(row["payload"])).hexdigest()
    assert row["n_bytes"] == len(bytes(row["payload"]))
    # DuckDB 1.0 md5() is VARCHAR-only; md5 of the utf-8 blob equals md5 of
    # the text itself
    want = duck.sql(
        "select md5(text), octet_length(text::BLOB) from documents "
        "where doc_id = (select min(doc_id) from documents)").fetchone()
    assert (row["digest"], row["n_bytes"]) == want


def test_metadata_only_prunes_payload(media):
    meta = M.metadata_only(media)
    assert "payload" not in meta.columns
    plan = meta._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan.lower().split("readschema")[-1][:300] \
        if "readschema" in plan.lower() else True


def test_feature_extraction_contract(media):
    feats = M.extract_features(media)
    rows = feats.orderBy("media_id").collect()
    assert len(rows) == media.count()
    by_id = {r["media_id"]: r for r in rows}
    src = {r["media_id"]: r for r in media.collect()}
    for mid, r in by_id.items():
        payload = bytes(src[mid]["payload"])
        assert r["feat_dim"] == min(16, len(payload))
        assert r["feat_head"] == payload[:16].hex()


def test_decode_stub_rejects_unknown_kind():
    with pytest.raises(NotImplementedError):
        M.decode_stub(b"abc", "hologram")


def test_frame_sampling_offsets_and_bytes(media):
    frames = M.sample_frames(media, n_frames=4, frame_bytes=4)
    rows = frames.orderBy("media_id", "frame_idx").collect()
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert len(rows) == 4 * len(src)
    for r in rows:
        payload = src[r["media_id"]]
        total = max(1, len(payload) // 4)
        want_off = (r["frame_idx"] * total // 4) * 4
        assert r["frame_offset"] == want_off
        assert r["frame_hex"] == payload[want_off:want_off + 4].hex()


def test_resize_batch_contract(media):
    out = M.resize_batch(media, target_bytes=64)
    rows = {r["media_id"]: r for r in out.collect()}
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert set(rows) == set(src)
    for mid, r in rows.items():
        payload = src[mid]
        assert r["orig_bytes"] == len(payload)
        assert r["resized_bytes"] == min(64, len(payload))
        assert r["scale_bp"] == (r["resized_bytes"] * 10_000) // len(payload)
        assert r["resized_head"] == payload[:8].hex()


def test_payload_size_repartition(media):
    out = M.repartition_by_payload_size(media, target_bytes=10_000)
    assert out.rdd.getNumPartitions() >= 2
    assert out.count() == media.count()


def test_wav_container_roundtrip_real_codec(spark):
    """The WAV path is a REAL codec loop: the stdlib wave READER must
    recover the exact PCM, sample rate, and frame count the encoder
    wrote — including a non-default rate (proving the header is parsed,
    not assumed)."""
    import io
    import wave

    pcm = bytes(range(256))
    for rate in (8000, 44100):
        container = M.pcm_to_wav(pcm, sample_rate=rate)
        assert container[:4] == b"RIFF" and container[8:12] == b"WAVE"
        with wave.open(io.BytesIO(container), "rb") as w:
            assert w.getframerate() == rate
            assert w.getnchannels() == 1
            assert w.getsampwidth() == 1
            assert w.getnframes() == len(pcm)
            assert w.readframes(w.getnframes()) == pcm


def test_wav_decode_features_match_numpy(spark, tables):
    """decode_wav_features == a direct numpy recomputation from the
    source text, for every document (including empty/NULL)."""
    import numpy as np

    docs = tables["documents"].limit(50)
    extra = spark.createDataFrame(
        [(100001, ""), (100002, None)], "doc_id: long, text: string")
    docs = docs.select("doc_id", "text").unionByName(extra)
    wav = M.documents_as_wav(docs)
    got = {r["media_id"]: r.asDict()
           for r in M.decode_wav_features(wav).collect()}
    for row in docs.collect():
        pcm = (row["text"] or "").encode("utf-8")
        arr = np.frombuffer(pcm, dtype=np.uint8).astype(np.int64)
        c = arr - 128
        d = got[row["doc_id"]]
        assert d["sample_rate"] == M.WAV_SAMPLE_RATE
        assert d["n_samples"] == len(pcm)
        assert d["duration_us"] == len(pcm) * 1_000_000 // M.WAV_SAMPLE_RATE
        assert d["pcm_sum"] == int(arr.sum())
        assert d["pcm_sq_sum"] == int((c * c).sum())
        assert d["peak"] == (int(np.abs(c).max()) if len(pcm) else 0)
