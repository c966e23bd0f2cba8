"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed in Arrow batches via mapInPandas.

The decode layer is STUBBED (this container has no image/audio libs):
``decode_image`` raises NotImplementedError by design, and the pipeline
runs with ``fake_decode`` — a deterministic metadata extractor over the
raw bytes — so the Spark-side contract (schema, batch shape, partition
behavior) is real and tested even though pixel decoding is not.

Scale notes: mapInPandas streams Arrow record batches through Python —
memory is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``,
not partition size, which is what makes binary columns viable; keep
binary payloads out of shuffle keys and aggregate on the extracted
metadata instead.
"""

# NOTE: no `from __future__ import annotations` — it stringifies type
# hints module-wide and breaks pandas-UDF signature inspection.
import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EXTRACT_SCHEMA = (
    "doc_id long, n_bytes int, content_md5 string, header_hex string, "
    "fake_width int, fake_height int"
)


def attach_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary content column (here: utf-8 bytes of
    the text — a stand-in for image/audio payloads) plus a media-type
    tag, the schema shape a multimodal table needs."""
    return df.select(
        "*",
        F.col(text_col).cast("binary").alias("content"),
        F.lit("application/octet-stream").alias("media_type"),
    )


def decode_image(content: bytes):
    """REAL decode path — deliberately stubbed: pixel decoding needs an
    imaging library not present in this environment. The Spark plumbing
    around it (see ``extract_features``) is real."""
    raise NotImplementedError(
        "image decoding requires an imaging library; use fake_decode for "
        "the deterministic metadata path"
    )


def fake_decode(content: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode: derive fake dimensions from the
    byte length, so tests and oracles can verify the full pipeline."""
    n = len(content)
    return n % 1024 + 1, (n * 7) % 1024 + 1


def extract_features(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """mapInPandas feature extraction over binary content: byte length,
    md5, 4-byte header hex, and fake-decoded dimensions. One Arrow
    round-trip per batch; output schema declared up front."""
    import pandas as pd

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf[content_col]
            n_bytes = content.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n_bytes.astype("int32"),
                    "content_md5": content.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "header_hex": content.map(lambda b: bytes(b)[:4].hex()),
                    "fake_width": n_bytes.map(lambda n: n % 1024 + 1).astype("int32"),
                    "fake_height": n_bytes.map(lambda n: (n * 7) % 1024 + 1).astype(
                        "int32"
                    ),
                }
            )

    return df.select(id_col, content_col).mapInPandas(_extract, EXTRACT_SCHEMA)
