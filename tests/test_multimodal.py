"""Multimodal plumbing: schemas, Arrow batch shapes, determinism, pruning."""

from __future__ import annotations

import pytest

from rockefeller_spark import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    return M.gen_media(spark, n=200, seed=7).cache()


def test_gen_media_schema_and_determinism(spark, media):
    assert [(f.name, f.dataType) for f in media.schema.fields] == \
           [(f.name, f.dataType) for f in M.MEDIA_SCHEMA.fields]
    a = media.toPandas().sort_values("media_id").reset_index(drop=True)
    b = (M.gen_media(spark, n=200, seed=7, num_partitions=7)
         .toPandas().sort_values("media_id").reset_index(drop=True))
    assert a.equals(b)
    assert set(a.kind) == {"image", "audio", "video"}
    assert a[a.kind == "image"].width.notna().all()
    assert a[a.kind == "audio"].sample_rate.notna().all()


def test_extract_features_shape_and_determinism(spark, media):
    f1 = M.extract_features(media).toPandas().sort_values("media_id")
    assert len(f1) == 200
    assert all(len(v) == M.FEATURE_DIM for v in f1.feature)
    assert (f1.n_bytes > 0).all()
    f2 = M.extract_features(media, batch_rows=16).toPandas().sort_values("media_id")
    # batch size never changes results (iterator contract is pure)
    assert f1.reset_index(drop=True).media_id.equals(f2.reset_index(drop=True).media_id)
    assert f1.reset_index(drop=True).feature.map(tuple).equals(
        f2.reset_index(drop=True).feature.map(tuple))


def test_resize_and_frames(spark, media):
    th = M.resize_images(media, max_side=64).toPandas()
    assert (th.thumb_w <= 64).all() and (th.thumb_h <= 64).all()
    assert (th.thumb.map(len) > 0).all()
    fr = M.sample_frames(media, every_ms=20_000).toPandas()
    assert (fr.groupby("media_id").frame_idx.min() == 0).all()
    assert (fr.frame.map(len) > 0).all()


def test_metadata_rollup_prunes_payload(spark, tmp_path, media):
    """The metadata rollup must not read the blob column at all."""
    path = str(tmp_path / "media.parquet")
    media.write.parquet(path)
    df = spark.read.parquet(path)
    plan = M.media_summary(df)._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan


def test_decode_stub_contract():
    with pytest.raises(NotImplementedError):
        M._fake_decode(b"xx", real_codec=True)
    import numpy as np
    a = M._fake_decode(b"same-bytes")
    b = M._fake_decode(b"same-bytes")
    assert np.array_equal(a, b)
