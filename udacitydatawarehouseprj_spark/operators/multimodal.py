"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Beyond-reference operators (BASELINE.json north star). The pattern for
image/audio/video at 100 TB: store the payload as a ``binary`` column (or
a reference + fetched bytes) with a typed metadata struct alongside, and
run decode / feature-extract / resize / frame-sample as Arrow-batched
pandas functions over ``mapInPandas`` — the bytes never round-trip through
row-at-a-time Python, and partitioning stays Spark-managed.

The decode step itself is STUBBED (no image/audio libraries in this
container — ``NotImplementedError`` behind an import-try), but the
Spark-side plumbing is real and tested: schema, Arrow batch shape,
``mapInPandas`` signature, and a deterministic byte-level feature extractor
(`extract_byte_features`) that exercises the full binary path end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried alongside every payload column
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # 'image' | 'audio' | 'video' | 'text'
        T.StructField("encoding", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

BYTE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
    ]
)

CHECKSUM_MOD = 2_147_483_647


def attach_payload(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Build a multimodal-shaped frame from a text table: payload =
    utf-8 bytes (binary), metadata struct alongside. In a real pipeline the
    payload column arrives from the source (S3 object bytes, parquet
    binary); this adapter lets every downstream operator be tested."""
    payload = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit("text").alias("media_type"),
        F.lit("utf-8").alias("encoding"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )
    return df.select(F.col(id_col), payload.alias("payload"), meta.alias("meta"))


def extract_byte_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched byte-level feature extraction via ``mapInPandas``.

    Computes (n_bytes, first_byte, rolling checksum) per payload in pandas
    over whole Arrow batches — the template every real decoder below
    follows. Deterministic, so oracle-checkable end-to-end.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(
                        lambda b: int(b[0]) if len(b) else -1
                    ).astype("int32"),
                    "checksum": payloads.map(
                        lambda b: sum(b) % CHECKSUM_MOD
                    ).astype("int64"),
                }
            )

    return df.mapInPandas(batches, schema=BYTE_FEATURES_SCHEMA)


# --- stubbed decoders: real signature/schema/partitioning, gated codecs ---

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def decode_image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode image payloads and emit (width, height, mean luminance).

    STUB: the container ships no image codec (no PIL/cv2). The
    ``mapInPandas`` plumbing is identical to ``extract_byte_features``;
    only the per-payload decode call is gated.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: F401
        except ImportError as e:  # pragma: no cover - no codec in container
            raise NotImplementedError(
                "image decode requires an image codec (PIL/cv2); the Spark "
                "plumbing (schema, Arrow batching, partitioning) is real — "
                "plug a decoder into this function body."
            ) from e
        raise NotImplementedError("decoder body intentionally stubbed")

    return df.mapInPandas(batches, schema=IMAGE_FEATURES_SCHEMA)


AUDIO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def sample_frames(df: DataFrame, id_col: str = "doc_id",
                  frame_size: int = 1024, stride: int = 4096) -> DataFrame:
    """Frame-sample a binary payload: emit every ``stride``-th window of
    ``frame_size`` bytes (the audio/video frame-sampling shape, applied to
    raw bytes so it runs without codecs). One-to-many ``mapInPandas``."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_ids, out_idx, out_frames = [], [], []
            for did, payload in zip(pdf[id_col], pdf["payload"]):
                for n, off in enumerate(range(0, len(payload), stride)):
                    out_ids.append(int(did))
                    out_idx.append(n)
                    out_frames.append(bytes(payload[off : off + frame_size]))
            yield pd.DataFrame(
                {"doc_id": out_ids, "frame_idx": out_idx, "frame_bytes": out_frames}
            )

    return df.mapInPandas(batches, schema=AUDIO_FRAME_SCHEMA)


def extract_byte_features_arrow(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """``mapInArrow`` variant of ``extract_byte_features``: operates on raw
    ``pyarrow.RecordBatch`` objects — no pandas materialization at all, the
    lowest-overhead path for binary-heavy batches (pandas boxes each
    payload as a Python bytes object; Arrow keeps them in one buffer).
    Same output contract as the pandas version."""

    def batches(it):
        import pyarrow as pa

        for batch in it:
            ids = batch.column(batch.schema.get_field_index(id_col))
            payloads = batch.column(batch.schema.get_field_index("payload"))
            n_bytes, first, checksum = [], [], []
            for buf in payloads:
                b = buf.as_py()
                n_bytes.append(len(b))
                first.append(b[0] if b else -1)
                checksum.append(sum(b) % CHECKSUM_MOD)
            yield pa.RecordBatch.from_arrays(
                [
                    ids.cast(pa.int64()),
                    pa.array(n_bytes, pa.int64()),
                    pa.array(first, pa.int32()),
                    pa.array(checksum, pa.int64()),
                ],
                names=["doc_id", "n_bytes", "first_byte", "checksum"],
            )

    return df.mapInArrow(batches, schema=BYTE_FEATURES_SCHEMA)
