import hashlib

from cdc_tools_spark.ops.multimodal import (
    FEATURE_DIM,
    FEATURES_SCHEMA,
    extract_features,
    frame_sample,
    synth_media,
)


def test_extract_features_plumbing(spark):
    media = synth_media(spark, n=48).repartition(4)
    out = extract_features(media)
    assert out.schema == FEATURES_SCHEMA
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 48
    r0 = rows[0]
    assert len(r0["features"]) == FEATURE_DIM
    assert all(0.0 <= f <= 1.0 for f in r0["features"])
    # deterministic fake: feature vector is a pure function of the bytes
    payload = media.where("media_id = 0").collect()[0]["payload"]
    assert r0["payload_sha256"] == hashlib.sha256(payload).hexdigest()
    assert r0["n_bytes"] == len(payload)


def test_extract_features_deterministic_across_partitionings(spark):
    a = extract_features(synth_media(spark, 32).repartition(2)).collect()
    b = extract_features(synth_media(spark, 32).repartition(8)).collect()
    assert {(r["media_id"], tuple(r["features"])) for r in a} == {
        (r["media_id"], tuple(r["features"])) for r in b
    }


def test_frame_sample(spark):
    media = synth_media(spark, 30)
    frames = frame_sample(media, every_n_bytes=1024, frame_bytes=64)
    rows = frames.collect()
    assert rows and all(len(r["frame_bytes"]) == 64 for r in rows)
    kinds = {r["kind"] for r in media.collect()}
    assert kinds == {"image", "audio", "video"}
    n_video = media.where("kind = 'video'").count()
    per_doc = {r["media_id"] for r in rows}
    assert len(per_doc) == n_video  # only videos are sampled
