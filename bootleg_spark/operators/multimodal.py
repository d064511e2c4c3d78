"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, decoded/feature-extracted in Arrow-batched stages.

Engine extension beyond the reference (task brief): web-scale training
pipelines carry images/audio/video as binary columns. Here the pages
table's ``html`` binary is the resident example payload; the same
plumbing (schema, batch shape, mapInPandas iterator) applies to any
media column. Actual image/audio decoding libraries are not in this
container, so :func:`decode_image_stub` is a clearly-marked stub — the
Spark-side dataflow (partitioning, UDF signature, batched Arrow
transfer) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# magic-byte sniffing table (raw byte prefix → kind); binary magics are
# compared on hex (a binary→string cast would mangle non-UTF-8 bytes)
_MAGIC = [
    (b"\x89PNG", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff"),
]
_TEXT_MAGIC = [("<htm", "html"), ("<!do", "html")]


def media_metadata(df: DataFrame, bin_col: str = "html", id_col: str = "url") -> DataFrame:
    """(id, n_bytes, kind): typed metadata over an opaque binary column —
    pure JVM expressions (length + hex/text prefix compare), no Python."""
    kind = F.lit("unknown")
    text_prefix = F.lower(F.substring(F.col(bin_col).cast("string"), 1, 4))
    for magic, name in _TEXT_MAGIC:
        kind = F.when(text_prefix.startswith(magic), name).otherwise(kind)
    for magic, name in _MAGIC:
        hex_prefix = F.hex(F.expr(f"substring({bin_col}, 1, {len(magic)})"))
        kind = F.when(hex_prefix == magic.hex().upper(), name).otherwise(kind)
    return df.select(
        F.col(id_col).alias("id"),
        F.length(F.col(bin_col)).cast("long").alias("n_bytes"),
        kind.alias("kind"),
    )


def decode_image_stub(payload: bytes) -> "object":
    """Image decode placeholder — the real pipeline plugs PIL/ffmpeg here.

    Raises so no caller silently treats the stub as a real decoder.
    """
    raise NotImplementedError(
        "image/audio decoding libraries are not available in this "
        "environment; plug a real decoder into extract_media_features"
    )


def extract_media_features(
    df: DataFrame,
    bin_col: str = "html",
    id_col: str = "url",
    dim: int = 8,
    decoder=None,
) -> DataFrame:
    """Batched media feature extraction over a binary column.

    ``mapInPandas`` iterator form: one decoder init per partition, Arrow
    batches in/out — the shape a real (expensive) image model needs.
    The default "decoder" is a deterministic byte-histogram feature (a
    stand-in keeping the dataflow testable); pass ``decoder`` to use a
    real one.
    """
    schema = f"id string, feat array<double>"

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition init happens HERE (model load in a real pipeline)
        dec = decoder
        for pdf in batches:
            feats = []
            for payload in pdf[bin_col]:
                if dec is not None:
                    feats.append(dec(payload))
                else:
                    b = bytes(payload or b"")
                    hist = [0.0] * dim
                    for x in b:
                        hist[x % dim] += 1.0
                    total = sum(hist) or 1.0
                    feats.append([h / total for h in hist])
            yield pd.DataFrame({"id": pdf[id_col], "feat": feats})

    return df.select(id_col, bin_col).mapInPandas(_extract, schema=schema)
