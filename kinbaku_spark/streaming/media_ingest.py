"""Streaming media featurization: real decode on a binary-payload stream.

The batch decoders (operators/multimodal.image_features / audio_features
with fake=False — stdlib PNG/BMP/WAV codecs from operators/codecs.py) are
declarative mapInPandas stages, so they compose with Structured Streaming
UNCHANGED: apply them to a readStream DataFrame and every micro-batch is
decoded executor-side in Arrow batches, exactly like the batch plan. This
module gives the streaming entry points a name (and the parity test in
tests/test_streaming.py proves batch == stream output row-for-row).

Scale notes: decode is stateless 1→1, so the stream needs no watermark,
no state store, and no shuffle — each micro-batch inherits the source's
partitioning; throughput scales with executors exactly like the batch
path. This is the ingest-side shape of a multimodal training pipeline:
raw payload files land, features stream out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from kinbaku_spark.operators.multimodal import audio_features, image_features


def decode_image_stream(
    stream: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Real image decode (PNG/BMP pixels, JPEG/GIF headers) over a
    streaming binary column — the batch operator applied verbatim."""
    return image_features(stream, id_col, payload_col, fake=False)


def decode_audio_stream(
    stream: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Real 16-bit PCM WAV decode over a streaming binary column."""
    return audio_features(stream, id_col, payload_col, fake=False)
