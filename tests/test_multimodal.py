"""Multimodal plumbing: binaryFile ingest → asset schema → Arrow-batched
feature extraction and frame sampling (codec stubbed, per environment).
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def asset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("assets")
    (d / "a.png").write_bytes(b"\x89PNG" + b"\x01" * 500)
    (d / "b.jpg").write_bytes(b"\xff\xd8\xff" + b"\x02" * 300)
    (d / "c.wav").write_bytes(b"RIFF" + b"\x03" * 800)
    (d / "d.mp4").write_bytes(b"\x00\x00\x00\x18ftyp" + b"\x04" * 20000)
    (d / "e.dat").write_bytes(b"\x05" * 100)
    return str(d)


@pytest.fixture(scope="module")
def assets(spark, asset_dir):
    from data_lake_construction_and_querying_with_pyspark_spark.operators.multimodal import (
        assets_from_binary_files,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import (
        read_binary_files,
    )

    return assets_from_binary_files(read_binary_files(spark, asset_dir)).cache()


def test_modality_inference(assets):
    got = {r.asset_path.rsplit("/", 1)[-1]: r.modality for r in assets.collect()}
    assert got == {
        "a.png": "image",
        "b.jpg": "image",
        "c.wav": "audio",
        "d.mp4": "video",
        "e.dat": "unknown",
    }


def test_feature_extraction_schema_and_determinism(assets):
    from data_lake_construction_and_querying_with_pyspark_spark.operators.multimodal import (
        _FEATURE_DIM,
        extract_features,
    )

    feats = extract_features(assets)
    rows = {r.asset_path.rsplit("/", 1)[-1]: r for r in feats.collect()}
    assert len(rows) == 5
    a = rows["a.png"]
    assert a.decoder in ("stub-sha256", "pillow")
    assert len(a.content_sha) == 64
    assert a.width > 0 and a.height > 0
    assert len(a.feature) == _FEATURE_DIM or a.decoder == "pillow"
    # deterministic: re-run produces identical features
    rows2 = {r.asset_path.rsplit("/", 1)[-1]: r for r in extract_features(assets).collect()}
    assert rows2["a.png"].feature == a.feature
    assert rows2["a.png"].content_sha == a.content_sha


def test_strict_mode_raises_without_codec(assets):
    from data_lake_construction_and_querying_with_pyspark_spark.operators.multimodal import (
        extract_features,
    )

    try:
        import PIL  # noqa: F401

        pytest.skip("real codec present")
    except ImportError:
        pass
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as exc:
        extract_features(assets, strict=True).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(exc.value, NotImplementedError)


def test_frame_sampling(assets):
    from data_lake_construction_and_querying_with_pyspark_spark.operators.multimodal import (
        sample_frames,
    )

    frames = sample_frames(assets, frame_size=4096, stride=1).collect()
    # only d.mp4 (20008 bytes) is video → ceil(20024/4096) = 5 frames
    assert {f.asset_path.rsplit("/", 1)[-1] for f in frames} == {"d.mp4"}
    assert [f.frame_index for f in sorted(frames, key=lambda f: f.frame_index)] == [0, 1, 2, 3, 4]
    assert sum(len(f.frame_bytes) for f in frames) == 20008


def test_metadata_only_scan_prunes_binary(assets, spark, tmp_path):
    """Writing assets to parquet and querying metadata only must not
    read the content column (column pruning check via ReadSchema)."""
    out = str(tmp_path / "assets_parquet")
    assets.write.mode("overwrite").parquet(out)
    meta = spark.read.parquet(out).select("asset_path", "modality", "n_bytes")
    plan = meta._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan


def test_real_decode_when_pillow_available(assets, spark):
    """Probe-gated REAL-codec case: wherever Pillow is importable (it
    isn't in this container, but may be in the driver's image), the
    decode path must use it — reporting decoder='pillow', the true
    pixel dimensions, and the 4×4 grayscale-thumbnail feature — instead
    of the deterministic stub. Skips (never fakes a pass) without PIL."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from data_lake_construction_and_querying_with_pyspark_spark.operators.multimodal import (
        ASSET_SCHEMA,
        extract_features,
    )

    buf = io.BytesIO()
    Image.new("RGB", (23, 17), (200, 10, 10)).save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame(
        [("mem://real.png", "image", len(png), png)], ASSET_SCHEMA
    )
    row = extract_features(df).collect()[0]
    assert row.decoder == "pillow"
    assert (row.width, row.height) == (23, 17)
    assert len(row.feature) == 16  # 4×4 grayscale thumbnail
    # uniform-color image → uniform thumbnail
    assert len({round(x, 6) for x in row.feature}) == 1
