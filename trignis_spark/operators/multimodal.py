"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` (the Spark-idiomatic shape for per-blob Python work —
one Python worker per partition, columnar Arrow transfer, no per-row
pickling).

The real decoders (PIL/librosa/ffmpeg) are not available in this
container, so ``decode_and_extract`` computes deterministic features of
the raw bytes and the declared modality — the Spark-side plumbing
(schema, batching, partitioning) is real and oracle-checked; the codec
call sites are clearly marked stubs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("byte_len", LongType()),
        StructField("checksum16", LongType()),
        StructField("head_char", LongType()),
    ]
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Model documents as multimodal rows: binary payload + metadata.

    ``payload`` is the UTF-8 encoding of the text (standing in for
    image/audio bytes); ``meta`` is the typed sidecar a real pipeline
    would carry (modality, declared size, source).
    """
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text").alias("modality"),
            F.col("n_chars").alias("declared_len"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes, modality: str) -> str:
    """STUB: real decoders are unavailable in this environment.

    A production deployment would dispatch here to PIL (image), soundfile
    (audio) or pyav (video) and return decoded frames/samples. We decode
    only the 'text' modality (UTF-8); anything else raises.
    """
    if modality == "text":
        return payload.decode("utf-8")
    raise NotImplementedError(f"decoder for modality {modality!r} not bundled")


def decode_and_extract(mm: DataFrame) -> DataFrame:
    """Arrow-batched decode + feature extraction over binary payloads.

    Features are deterministic functions of the decoded content
    (byte length, sum of the first 16 character codes, first char code),
    so the DuckDB oracle can verify the full binary→decode→feature path.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = [
                _decode_stub(p, m)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "byte_len": [len(p) for p in pdf["payload"]],
                    "checksum16": [sum(ord(c) for c in t[:16]) for t in texts],
                    "head_char": [ord(t[0]) if t else 0 for t in texts],
                }
            )

    flat = mm.select("doc_id", "payload", F.col("meta.modality").alias("modality"))
    return flat.mapInPandas(extract, FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_index", LongType()),
        StructField("frame_len", LongType()),
        StructField("frame_checksum", LongType()),
    ]
)


def frame_sample(
    mm: DataFrame, frame_chars: int = 16, every: int = 3
) -> DataFrame:
    """Frame sampling: 1→N Arrow-batched fan-out over binary payloads.

    Models video frame extraction: the decoded payload is treated as a
    sequence of fixed-size frames (``frame_chars`` per frame — a real
    pipeline would use pyav keyframe iteration here) and every
    ``every``-th frame is emitted as its own row. Exercises the
    mapInPandas shape where one input row yields many output rows with a
    new schema — the plumbing a video pipeline needs regardless of codec.

    Frame features are deterministic (length + character-code sum), so
    the full payload→decode→sample→feature path is oracle-checkable.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, sums = [], [], [], []
            for doc_id, payload, modality in zip(
                pdf["doc_id"], pdf["payload"], pdf["modality"]
            ):
                t = _decode_stub(payload, modality)
                n_frames = (len(t) + frame_chars - 1) // frame_chars
                for i in range(0, n_frames, every):
                    chunk = t[i * frame_chars : (i + 1) * frame_chars]
                    ids.append(doc_id)
                    idxs.append(i)
                    lens.append(len(chunk))
                    sums.append(sum(ord(c) for c in chunk))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_index": idxs,
                    "frame_len": lens,
                    "frame_checksum": sums,
                }
            )

    flat = mm.select("doc_id", "payload", F.col("meta.modality").alias("modality"))
    return flat.mapInPandas(sample, FRAME_SCHEMA)


ENERGY_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("window_index", LongType()),
        StructField("n_samples", LongType()),
        StructField("energy", LongType()),
    ]
)


def audio_window_energy(
    mm: DataFrame, window: int = 32, center: int = 96
) -> DataFrame:
    """Audio-style windowed energy over binary payloads.

    Models PCM feature extraction: the payload's bytes stand in for
    8-bit samples (a real pipeline decodes via soundfile/librosa at the
    ``_decode_stub`` seam), split into fixed ``window``-sample frames;
    each frame emits its squared deviation from ``center`` (≈ DC offset)
    as an integer energy. Integer math end to end, so the whole
    payload→window→energy path is bit-exact against the oracle.

    Same 1→N ``mapInPandas`` fan-out shape as ``frame_sample`` — at
    100 TB the work is embarrassingly parallel per partition with Arrow
    batch transfer and no shuffle until the caller aggregates.
    """

    def energies(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ns, es = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for w in range(0, len(b), window):
                    chunk = b[w : w + window]
                    ids.append(doc_id)
                    idxs.append(w // window)
                    ns.append(len(chunk))
                    es.append(sum((x - center) ** 2 for x in chunk))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "window_index": idxs,
                    "n_samples": ns,
                    "energy": es,
                }
            )

    return mm.select("doc_id", "payload").mapInPandas(energies, ENERGY_SCHEMA)


def resize_stub(mm: DataFrame, stride: int = 4) -> DataFrame:
    """STUB resize: binary→binary transform with metadata update.

    A production deployment would decode the image and run
    ``PIL.Image.resize`` here; the deterministic surrogate keeps every
    ``stride``-th byte. The Spark plumbing — Arrow batch in, new binary
    column + updated metadata struct out — is the real deliverable.
    """
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("orig_len", LongType()),
            StructField("resized_len", LongType()),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [bytes(p[::stride]) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": resized,
                    "orig_len": [len(p) for p in pdf["payload"]],
                    "resized_len": [len(r) for r in resized],
                }
            )

    flat = mm.select("doc_id", "payload")
    return flat.mapInPandas(resize, out_schema)
