"""Multimodal column conventions (SURVEY.md §2.8 N4).

Images / audio / video travel as opaque ``binary`` payloads with a typed
metadata struct; decode and feature-extraction run as Arrow-batched
``mapInPandas`` stages. The decode step itself is STUBBED (no image/audio
libraries in this container — clearly marked below); everything Spark
cares about — schema, batch shape, partitioning, UDF signatures — is real
and tested.

At 100 TB the pattern matters more than the codec: payloads stay in
columnar storage next to their metadata (no sidecar fetches), decode is a
narrow per-partition map (no shuffle), and feature extraction emits
fixed-width columns so downstream joins/aggregations leave Python
entirely.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image/audio/video
        T.StructField("format", T.StringType()),  # png/jpeg/wav/...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _have_pil() -> bool:
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mode", T.StringType()),
        T.StructField("pixels", T.BinaryType()),
    ]
)


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Encode raw top-down RGB bytes as a 24bpp BI_RGB Windows BMP —
    dependency-free (struct only). BMP is the one mainstream image
    format simple enough to implement outright, which makes the decode
    stage REAL in codec-less environments instead of env-gated: rows are
    stored bottom-up, 4-byte padded, no compression."""
    import struct

    if len(rgb) != width * height * 3:
        raise ValueError("rgb must be width*height*3 bytes")
    row = width * 3
    pad = (-row) % 4
    body = b"".join(
        rgb[(height - 1 - y) * row : (height - y) * row] + b"\0" * pad
        for y in range(height)
    )
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", 54 + len(body), 0, 0, 54,
        40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0,
    )
    return header + body


def decode_bmp(payload: bytes) -> dict:
    """Decode a 24bpp uncompressed BMP to top-down RGB bytes —
    numpy row flipping, no codec library. Rejects anything but the
    BI_RGB/24bpp subset ``encode_bmp`` writes (clear error, never a
    silent misread)."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={compression})")
    row = width * 3
    stride = row + ((-row) % 4)
    arr = np.frombuffer(payload, dtype=np.uint8, offset=data_off)
    rows = arr[: stride * abs(height)].reshape(abs(height), stride)[:, :row]
    if height > 0:  # bottom-up storage -> flip to top-down
        rows = rows[::-1]
    return {
        "width": width,
        "height": abs(height),
        "mode": "RGB",
        "pixels": rows.tobytes(),
    }


def encode_wav(sample_rate: int, channels: int, pcm16: bytes) -> bytes:
    """Encode 16-bit PCM as a WAV container — the ``wave`` module is
    Python STDLIB, so audio decode needs no environment gate at all."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm16)
    return buf.getvalue()


def decode_wav(payload: bytes) -> dict:
    """Decode a WAV payload (stdlib ``wave``): sample rate, channels,
    frame count, integer-exact duration_ms, and the raw PCM bytes."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        rate, channels, n = w.getframerate(), w.getnchannels(), w.getnframes()
        pcm = w.readframes(n)
    return {
        "sample_rate": rate,
        "channels": channels,
        "n_frames": n,
        "duration_ms": n * 1000 // rate,
        "pcm": pcm,
    }


AUDIO_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("pcm", T.BinaryType()),
    ]
)


def decode_audio(media: DataFrame) -> DataFrame:
    """Arrow-batched WAV decode stage — REAL in every environment (the
    codec is stdlib), same ``mapInPandas`` shape as ``decode_images``."""
    from snowflake_cdc_spark.operators.util import fan_out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_wav(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": [d["sample_rate"] for d in decoded],
                    "channels": [d["channels"] for d in decoded],
                    "n_frames": [d["n_frames"] for d in decoded],
                    "duration_ms": [d["duration_ms"] for d in decoded],
                    "pcm": [d["pcm"] for d in decoded],
                }
            )

    return fan_out(media).mapInPandas(run, schema=AUDIO_DECODED_SCHEMA)


def resize_bmp(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize for BMP payloads: decode with the
    built-in codec, integer index sampling (``(i * src) // dst`` — the
    deterministic nearest-neighbor grid), re-encode."""
    import numpy as np

    d = decode_bmp(payload)
    a = np.frombuffer(d["pixels"], np.uint8).reshape(
        d["height"], d["width"], 3
    )
    ys = (np.arange(height) * d["height"]) // height
    xs = (np.arange(width) * d["width"]) // width
    return encode_bmp(width, height, a[ys][:, xs].tobytes())


def decode_media(payload: bytes, fmt: str) -> dict:
    """Image decode: BMP is decoded by the built-in dependency-free
    codec (REAL in every environment, including this codec-less one);
    png/jpeg/gif are real whenever pillow is importable (checked at
    call time via ``find_spec('PIL')``), a clearly-marked
    NotImplementedError otherwise. Audio/video (wav/libav) stay stubbed
    until their libs exist. Returns dict(width, height, mode, pixels)."""
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt in ("png", "jpeg", "jpg", "gif") and _have_pil():
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload))
        img.load()
        return {
            "width": img.width,
            "height": img.height,
            "mode": img.mode,
            "pixels": img.tobytes(),
        }
    raise NotImplementedError(
        f"media decode for format {fmt!r} requires a codec library "
        "(pillow for images) not available in this environment"
    )


def decode_images(media: DataFrame) -> DataFrame:
    """Arrow-batched decode stage over the binary payload column —
    ``mapInPandas``, one Python worker per partition, emitting fixed
    columns (width/height/mode/raw pixels). Requires pillow; the Spark
    plumbing is identical either way and is what the parity tests pin."""
    from snowflake_cdc_spark.operators.util import fan_out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                decode_media(bytes(p), m["format"])
                for p, m in zip(pdf["payload"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "mode": [d["mode"] for d in decoded],
                    "pixels": [d["pixels"] for d in decoded],
                }
            )

    return fan_out(media).mapInPandas(run, schema=DECODED_SCHEMA)


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for an embedding model: byte histogram
    folded to ``dim`` doubles, numpy-vectorized (a per-byte Python loop
    measured ~3× slower end-to-end on the documents fixture — inside a
    Pandas UDF the per-element work must stay in C)."""
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    pad = (-len(arr)) % dim
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=np.uint8)])
    acc = arr.reshape(-1, dim).sum(axis=0, dtype=np.int64)
    total = max(int(acc.sum()), 1)
    return (acc / total).tolist()


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas``: one Python worker per partition, pandas in/out — the
    only sanctioned Python boundary shape for bulk media work.
    """
    import hashlib

    from snowflake_cdc_spark.operators.util import fan_out

    media = fan_out(media)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len),
                    "payload_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "feature": payloads.map(lambda b: _fake_feature(bytes(b), dim)),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def extract_features_arrow(media: DataFrame, dim: int = 8) -> DataFrame:
    """``mapInArrow`` twin of ``extract_features``: RecordBatches in/out,
    no Arrow→pandas materialization at all. For wide binary payloads the
    pandas hop is pure overhead — each payload becomes a Python ``bytes``
    object inside a pandas object column; here lengths come vectorized
    from the Arrow offsets buffer and per-payload work reads zero-copy
    ``memoryview``s of the value buffer. Same output schema and values as
    the pandas lane (parity-tested)."""
    import hashlib

    import pyarrow as pa

    from snowflake_cdc_spark.operators.util import fan_out

    media = fan_out(media)

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            payloads = batch.column(batch.schema.get_field_index("payload"))
            # n_bytes vectorized on the offsets — no per-row Python
            n_bytes = pa.compute.binary_length(payloads).cast(pa.int64())
            md5s, feats = [], []
            for v in payloads:
                buf = memoryview(v.as_buffer())
                md5s.append(hashlib.md5(buf).hexdigest())
                feats.append(_fake_feature(buf, dim))
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("media_id")),
                    n_bytes,
                    pa.array(md5s, type=pa.string()),
                    pa.array(feats, type=pa.list_(pa.float32())),
                ],
                names=["media_id", "n_bytes", "payload_md5", "feature"],
            )

    return media.mapInArrow(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage: Arrow-batched ``mapInPandas`` keeping the (payload,
    meta) shape so stages compose. BMP payloads are resized for REAL
    (round 4 — built-in codec + deterministic nearest-neighbor index
    sampling); other formats keep the documented stand-in
    (truncate/pad to width*height bytes) until their codec libs exist —
    the plumbing (meta rewrite, batch shapes, composability with
    ``extract_features``) is identical either way."""
    from snowflake_cdc_spark.operators.util import fan_out

    target = width * height

    def one(payload, meta):
        if meta["format"] == "bmp":
            return resize_bmp(bytes(payload), width, height)
        return bytes(payload)[:target].ljust(target, b"\0")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [
                one(p, m) for p, m in zip(pdf["payload"], pdf["meta"])
            ]
            out["meta"] = out["meta"].map(
                lambda m: {**m, "width": width, "height": height}
            )
            yield out

    return fan_out(media).mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling: one media row → ``n_frames`` rows of equal payload
    slices (the video-decode stand-in; real impl: pyav keyframe grab).
    Demonstrates the 1→N ``mapInPandas`` output shape (no explode of a
    pre-built array — frames never materialize as one giant row)."""
    from snowflake_cdc_spark.operators.util import fan_out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                step = max(len(raw) // n_frames, 1)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    payloads.append(raw[i * step : (i + 1) * step])
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame_payload": payloads}
            )

    return fan_out(media).mapInPandas(run, schema=FRAME_SCHEMA)


def documents_as_bmp_media(docs: DataFrame, width: int = 16) -> DataFrame:
    """Adapter producing REAL image payloads: each document's utf-8
    bytes become the RGB pixel data of a genuine 24bpp BMP (padded to a
    whole number of ``width``-pixel rows), so the decode stage runs an
    actual image codec end to end in this codec-less container. Built
    in an Arrow-batched ``mapInPandas`` (binary composition is not
    expressible as a Column)."""
    from snowflake_cdc_spark.operators.util import fan_out

    base = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("__raw"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, metas = [], [], []
            for mid, raw in zip(pdf["media_id"], pdf["__raw"]):
                raw = bytes(raw)
                row_bytes = width * 3
                height = max((len(raw) + row_bytes - 1) // row_bytes, 1)
                rgb = raw.ljust(width * height * 3, b"\0")
                ids.append(mid)
                payloads.append(encode_bmp(width, height, rgb))
                metas.append(
                    {
                        "media_type": "image",
                        "format": "bmp",
                        "width": width,
                        "height": height,
                        "duration_ms": None,
                    }
                )
            yield pd.DataFrame(
                {"media_id": ids, "payload": payloads, "meta": metas}
            )

    return fan_out(base).mapInPandas(run, schema=MEDIA_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter used by tests/queries: treat each document's utf-8 bytes as
    an opaque payload with image-ish metadata — exercises the real binary
    column path end to end."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("format"),
            F.col("n_chars").cast("int").alias("width"),
            F.lit(1).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def documents_as_wav_media(docs: DataFrame, sample_rate: int = 8000) -> DataFrame:
    """Adapter producing REAL audio payloads: each document's utf-8
    bytes become little-endian 16-bit PCM samples (padded to an even
    byte count) inside a genuine WAV container, so the audio decode
    stage runs an actual stdlib codec end to end — the audio analog of
    ``documents_as_bmp_media``. ASCII corpora keep every sample in
    [0, 31354] (hi byte <= 122), which the q186 oracle exploits to
    re-derive the samples from the text column alone."""
    from snowflake_cdc_spark.operators.util import fan_out

    base = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("__raw"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, metas = [], [], []
            for mid, raw in zip(pdf["media_id"], pdf["__raw"]):
                raw = bytes(raw)
                if len(raw) % 2:
                    raw += b"\0"
                ids.append(mid)
                payloads.append(encode_wav(sample_rate, 1, raw))
                metas.append(
                    {
                        "media_type": "audio",
                        "format": "wav",
                        "width": None,
                        "height": None,
                        "duration_ms": (len(raw) // 2) * 1000 // sample_rate,
                    }
                )
            yield pd.DataFrame(
                {"media_id": ids, "payload": payloads, "meta": metas}
            )

    return fan_out(base).mapInPandas(run, schema=MEDIA_SCHEMA)


AUDIO_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("energy", T.LongType(), False),
    ]
)


def audio_frame_energy(decoded: DataFrame, frame_len: int = 200) -> DataFrame:
    """Frame-level energy extraction over decoded PCM — the audio
    feature-extract stage of the multimodal lane (VAD front-ends,
    silence trimming and loudness normalization all start here): the
    PCM splits into ``frame_len``-sample frames (final frame partial)
    and each frame emits the EXACT integer sum of squared int16
    samples — int16^2 * frame_len stays far under 2^63, so the feature
    is a pure BIGINT and the whole mapInPandas stage is
    oracle-checkable. Arrow-batched, one output row per frame."""
    import numpy as np

    from snowflake_cdc_spark.operators.util import fan_out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ns, es = [], [], [], []
            for mid, pcm in zip(pdf["media_id"], pdf["pcm"]):
                samples = np.frombuffer(bytes(pcm), dtype="<i2").astype(np.int64)
                # empty PCM yields NO frames (ADVICE r05: a zero-sample
                # sentinel frame would contradict the "final frame
                # partial" contract — partial of nothing is nothing)
                for f in range(0, len(samples), frame_len):
                    chunk = samples[f : f + frame_len]
                    ids.append(mid)
                    idxs.append(f // frame_len)
                    ns.append(len(chunk))
                    es.append(int((chunk * chunk).sum()))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_index": idxs,
                    "n_samples": ns,
                    "energy": es,
                }
            )

    return fan_out(decoded.select("media_id", "pcm")).mapInPandas(
        run, schema=AUDIO_ENERGY_SCHEMA
    )
