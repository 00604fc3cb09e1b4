"""Multimodal stage composition (resize → features, frame sampling) and
streaming dedup parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.multimodal import (
    documents_as_media,
    extract_features,
    extract_features_arrow,
    resize_media,
    sample_frames,
)
from snowflake_cdc_spark.sources.io import read_table
from snowflake_cdc_spark.streaming.dedup_stream import dedup_stream
from tests.conftest import SF_SMOKE


def test_resize_composes_with_features(spark):
    media = documents_as_media(read_table(spark, SF_SMOKE, "documents")).limit(50)
    resized = resize_media(media, width=16, height=4)
    rows = resized.collect()
    assert all(len(r.payload) == 64 for r in rows)
    assert all(r.meta.width == 16 and r.meta.height == 4 for r in rows)
    # the resized output feeds the feature stage unchanged (same shape)
    feats = extract_features(resized, dim=4).collect()
    assert all(r.n_bytes == 64 and len(r.feature) == 4 for r in feats)


def test_arrow_lane_matches_pandas_lane(spark):
    """mapInArrow feature extraction returns byte-identical results to the
    mapInPandas lane (md5s, lengths, float features)."""
    media = documents_as_media(read_table(spark, SF_SMOKE, "documents")).limit(80)
    canon = lambda rows: sorted(
        (r.media_id, r.n_bytes, r.payload_md5, tuple(r.feature)) for r in rows
    )
    a = canon(extract_features_arrow(media, dim=8).collect())
    b = canon(extract_features(media, dim=8).collect())
    assert a == b and len(a) == 80


def test_frame_sampling_one_to_n(spark):
    media = documents_as_media(read_table(spark, SF_SMOKE, "documents")).limit(20)
    frames = sample_frames(media, n_frames=4)
    per = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 4 for r in per)
    # frames are disjoint slices: re-concatenation is a prefix of payload
    one = frames.filter(F.col("media_id") == per[0].media_id).orderBy("frame_index").collect()
    joined = b"".join(bytes(r.frame_payload) for r in one)
    original = bytes(
        media.filter(F.col("media_id") == per[0].media_id).collect()[0].payload
    )
    assert joined == original[: len(joined)]


def test_dedup_stream_batch_and_stream_agree(spark, tmp_path):
    events = read_table(spark, SF_SMOKE, "events").select("ts", "user_id", "event_type")
    doubled = events.unionByName(events)  # every row duplicated
    src = str(tmp_path / "src")
    doubled.coalesce(2).write.parquet(src)

    batch = dedup_stream(doubled, ["user_id", "event_type"]).count()

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = dedup_stream(stream, ["user_id", "event_type"])
    counts = []
    q = (
        out.writeStream.foreachBatch(lambda df, _: counts.append(df.count()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert sum(counts) == batch  # stream dedup state matches global dedup


def test_decode_stub_raises_without_codec_lib():
    """Without pillow, decode_media must fail loudly with the documented
    NotImplementedError — never silently fake a decode (round-3: the stub
    is env-gated, not hardcoded)."""
    import pytest

    from snowflake_cdc_spark.operators.multimodal import _have_pil, decode_media

    if _have_pil():
        pytest.skip("pillow installed here — the real-decode test below covers this")
    with pytest.raises(NotImplementedError, match="pillow"):
        decode_media(b"\x89PNG\r\n\x1a\n" + b"\0" * 16, "png")


def test_decode_images_real_when_pillow_present(spark):
    """With pillow installed, decode_media/decode_images run a TRUE decode:
    a generated 3x2 RGB PNG round-trips through the mapInPandas stage with
    exact pixel bytes. Skipped (visibly) where pillow is absent."""
    import pytest

    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from snowflake_cdc_spark.operators.multimodal import decode_images

    img = Image.new("RGB", (3, 2))
    img.putdata([(r, g, 7) for r, g in [(0, 1), (2, 3), (4, 5), (6, 7), (8, 9), (10, 11)]])
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    media = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()), ("image", "png", 3, 2, None))],
        "media_id long, payload binary, "
        "meta struct<media_type:string,format:string,width:int,height:int,duration_ms:bigint>",
    )
    row = decode_images(media).collect()[0]
    assert (row.width, row.height, row.mode) == (3, 2, "RGB")
    assert bytes(row.pixels) == img.tobytes()


class TestRealBmpDecode:
    """Round 4: the BMP codec is dependency-free, so image decode is
    REAL in this codec-less container — no PIL gate for this format."""

    def test_roundtrip_exact(self, spark):
        from snowflake_cdc_spark.operators.multimodal import decode_bmp, encode_bmp

        w, h = 5, 3  # odd row width -> exercises 4-byte row padding
        rgb = bytes(range(w * h * 3))
        out = decode_bmp(encode_bmp(w, h, rgb))
        assert (out["width"], out["height"], out["mode"]) == (w, h, "RGB")
        assert out["pixels"] == rgb

    def test_decode_stage_runs_real_codec_end_to_end(self, spark):
        from snowflake_cdc_spark.operators.multimodal import (
            decode_images,
            documents_as_bmp_media,
        )
        from snowflake_cdc_spark.sources.io import read_table
        from tests.conftest import SF_SMOKE

        docs = read_table(spark, SF_SMOKE, "documents").limit(20)
        media = documents_as_bmp_media(docs, width=16)
        decoded = {r.media_id: r for r in decode_images(media).collect()}
        raw = {r.doc_id: r.text.encode() for r in docs.collect()}
        assert set(decoded) == set(raw)
        for mid, r in decoded.items():
            assert r.width == 16 and r.mode == "RGB"
            # decoded pixels start with the document's exact bytes
            assert bytes(r.pixels)[: len(raw[mid])] == raw[mid]
            assert len(r.pixels) == 16 * r.height * 3

    def test_unsupported_variant_fails_loudly(self, spark):
        import pytest

        from snowflake_cdc_spark.operators.multimodal import decode_bmp, encode_bmp

        with pytest.raises(ValueError, match="not a BMP"):
            decode_bmp(b"PNG...")
        bad = bytearray(encode_bmp(2, 2, bytes(12)))
        bad[28] = 8  # claim 8bpp
        with pytest.raises(ValueError, match="unsupported BMP"):
            decode_bmp(bytes(bad))

    def test_matches_pil_when_available(self, spark):
        import importlib.util

        import pytest

        if importlib.util.find_spec("PIL") is None:
            pytest.skip("pillow not installed — cross-check self-activates with it")
        import io

        from PIL import Image

        from snowflake_cdc_spark.operators.multimodal import encode_bmp

        w, h = 4, 2
        rgb = bytes(range(w * h * 3))
        img = Image.open(io.BytesIO(encode_bmp(w, h, rgb)))
        assert img.size == (w, h) and img.convert("RGB").tobytes() == rgb


class TestRealWavAndResize:
    def test_wav_roundtrip_and_duration(self, spark):
        from snowflake_cdc_spark.operators.multimodal import decode_wav, encode_wav

        pcm = bytes(range(256)) * 4  # 512 16-bit mono frames
        wav = encode_wav(8000, 1, pcm)
        d = decode_wav(wav)
        assert (d["sample_rate"], d["channels"], d["n_frames"]) == (8000, 1, 512)
        assert d["duration_ms"] == 512 * 1000 // 8000 == 64
        assert d["pcm"] == pcm

    def test_audio_stage_end_to_end(self, spark):
        from snowflake_cdc_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            decode_audio,
            encode_wav,
        )

        rows = [
            (i, encode_wav(8000, 1, bytes(200 * (i + 1))),
             {"media_type": "audio", "format": "wav", "width": None,
              "height": None, "duration_ms": None})
            for i in range(6)
        ]
        media = spark.createDataFrame(rows, MEDIA_SCHEMA)
        out = {r.media_id: r for r in decode_audio(media).collect()}
        assert all(out[i].n_frames == 100 * (i + 1) for i in range(6))
        assert all(out[i].sample_rate == 8000 for i in range(6))

    def test_bmp_resize_is_real_nearest_neighbor(self, spark):
        import numpy as np

        from snowflake_cdc_spark.operators.multimodal import (
            decode_bmp,
            encode_bmp,
            resize_bmp,
        )

        # 2x2 image with distinct corner colors -> 4x4 nearest-neighbor
        # must tile each corner into a 2x2 block
        px = np.zeros((2, 2, 3), np.uint8)
        px[0, 0], px[0, 1], px[1, 0], px[1, 1] = (255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)
        big = decode_bmp(resize_bmp(encode_bmp(2, 2, px.tobytes()), 4, 4))
        arr = np.frombuffer(big["pixels"], np.uint8).reshape(4, 4, 3)
        assert (arr[0:2, 0:2] == (255, 0, 0)).all()
        assert (arr[0:2, 2:4] == (0, 255, 0)).all()
        assert (arr[2:4, 0:2] == (0, 0, 255)).all()
        assert (arr[2:4, 2:4] == (9, 9, 9)).all()

    def test_resize_stage_routes_bmp_through_real_codec(self, spark):
        from snowflake_cdc_spark.operators.multimodal import (
            decode_images,
            documents_as_bmp_media,
            resize_media,
        )
        from snowflake_cdc_spark.sources.io import read_table
        from tests.conftest import SF_SMOKE

        docs = read_table(spark, SF_SMOKE, "documents").limit(5)
        media = documents_as_bmp_media(docs, width=16)
        small = resize_media(media, 8, 8)
        dec = decode_images(small).collect()
        assert all(r.width == 8 and r.height == 8 and len(r.pixels) == 8 * 8 * 3
                   for r in dec)
