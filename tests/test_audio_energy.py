"""Audio frame-energy lane (operators/multimodal.py): WAV round-trip
plus exact framing/energy semantics vs an independent Python
reference."""

from __future__ import annotations

from snowflake_cdc_spark.operators.multimodal import (
    audio_frame_energy,
    decode_audio,
    documents_as_wav_media,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ref_energies(text: str, frame_len: int):
    raw = text.encode()
    if len(raw) % 2:
        raw += b"\0"
    samples = [
        raw[2 * i] + 256 * raw[2 * i + 1] for i in range(len(raw) // 2)
    ]
    out = []
    for f in range(0, max(len(samples), 1), frame_len):
        chunk = samples[f : f + frame_len]
        out.append((f // frame_len, len(chunk), sum(v * v for v in chunk)))
    return out


class TestAudioEnergy:
    def test_roundtrip_and_framing(self, spark):
        rows = [
            (1, "abcdef"),          # 3 samples, one frame
            (2, "abcde"),           # odd byte count -> zero pad
            (3, "x" * 9),           # crosses the frame boundary at 4
        ]
        dec = decode_audio(documents_as_wav_media(_docs(spark, rows)))
        got = {
            (r.media_id, r.frame_index): (r.n_samples, r.energy)
            for r in audio_frame_energy(dec, frame_len=4).collect()
        }
        expect = {}
        for doc_id, text in rows:
            for idx, n, e in _ref_energies(text, 4):
                expect[(doc_id, idx)] = (n, e)
        assert got == expect

    def test_decode_preserves_pcm_metadata(self, spark):
        rows = [(7, "hello world here")]  # 16 bytes -> 8 samples
        dec = decode_audio(documents_as_wav_media(_docs(spark, rows), 8000))
        r = dec.collect()[0]
        assert (r.sample_rate, r.channels, r.n_frames) == (8000, 1, 8)
        assert r.duration_ms == 8 * 1000 // 8000
        assert bytes(r.pcm) == b"hello world here"
