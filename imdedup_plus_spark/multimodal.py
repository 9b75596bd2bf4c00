"""Multimodal (binary-column) plumbing.

The input table carries ``html BINARY`` (BASELINE.json input_hint). This
module implements the binary-payload operators a training-data pipeline
needs, treating media as opaque bytes + typed metadata:

* ``extract_text_df`` — REAL: html -> text extraction (mapInPandas,
  Arrow-batched), verifying the per-row invariant ``extract(html) == text``
  (the analog of the reference's lossless decode,
  ``/root/reference/jpeg.c:16-122``);
* ``binary_metadata`` — REAL: size/prefix metadata over any binary column;
* ``decode_image`` / ``resize_image`` / ``sample_frames`` — STUBS: the
  image/audio libraries are not in this container. The Spark-side plumbing
  (schema, batch shape, partitioning) is real and tested via the
  deterministic fake; the codec call itself raises ``NotImplementedError``
  unless ``deterministic_fake=True``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extract_text_df(df: DataFrame, html_col: str = "html", id_col: str = "url") -> DataFrame:
    """Decode the html payload back to text (fixture html layout:
    ``...<p>{text}</p>...``). Narrow Arrow-batched map."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = []
            for raw in pdf[html_col].values:
                s = bytes(raw).decode("utf-8", errors="replace")
                if "<p>" in s and "</p>" in s:
                    texts.append(s.split("<p>", 1)[1].split("</p>", 1)[0])
                else:
                    texts.append("")
            yield pd.DataFrame({id_col: pdf[id_col].values, "extracted_text": texts})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, html_col).mapInPandas(
        fn, schema=f"{id_col} {id_type}, extracted_text string"
    )


def binary_metadata(df: DataFrame, bin_col: str, id_col: str) -> DataFrame:
    """Typed metadata over an opaque binary column — pure built-ins."""
    return df.select(
        F.col(id_col),
        F.length(F.col(bin_col)).cast("long").alias("n_bytes"),
        F.hex(F.expr(f"substring({bin_col}, 1, 4)")).alias("magic_hex"),
        F.crc32(F.col(bin_col)).cast("long").alias("crc32"),
    )


_IMG_FEATURE_DIM = 8


def decode_image(
    df: DataFrame, bin_col: str, id_col: str, deterministic_fake: bool = False
) -> DataFrame:
    """binary -> (width, height, feature array). STUB: no image codec in
    this container. With ``deterministic_fake`` the kernel emits seeded
    per-row fake features (hash of bytes) with the production schema, so
    the distributed plumbing is fully exercised."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "image codec not available in this environment; "
                    "run with deterministic_fake=True to exercise the plumbing"
                )
            ids, ws, hs, feats = [], [], [], []
            for key, raw in zip(pdf[id_col].values, pdf[bin_col].values):
                b = bytes(raw)
                h = 0
                for c in b[:256]:
                    h = (h * 31 + c) % (2**31)
                ids.append(key)
                ws.append(64 + h % 512)
                hs.append(64 + (h // 512) % 512)
                feats.append([float((h >> (4 * i)) & 0xF) for i in range(_IMG_FEATURE_DIM)])
            yield pd.DataFrame(
                {id_col: ids, "width": ws, "height": hs, "features": feats}
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, bin_col).mapInPandas(
        fn,
        schema=f"{id_col} {id_type}, width int, height int, features array<double>",
    )


def resize_image(
    df: DataFrame, bin_col: str, id_col: str, size: tuple[int, int] = (224, 224),
    deterministic_fake: bool = False,
) -> DataFrame:
    """STUB resize: production schema (id, binary out, w, h)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError("image codec not available")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "resized": [bytes(raw)[:64] for raw in pdf[bin_col].values],
                    "width": size[0],
                    "height": size[1],
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, bin_col).mapInPandas(
        fn, schema=f"{id_col} {id_type}, resized binary, width int, height int"
    )


def sample_frames(
    df: DataFrame, bin_col: str, id_col: str, every_n: int = 30,
    deterministic_fake: bool = False,
) -> DataFrame:
    """STUB video frame sampling: one output row per sampled frame —
    demonstrates the 1->N explode shape of media pipelines."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError("video codec not available")
            ids, fidx, frames = [], [], []
            for key, raw in zip(pdf[id_col].values, pdf[bin_col].values):
                b = bytes(raw)
                n_frames = max(1, len(b) // (every_n * 16))
                for i in range(min(n_frames, 4)):
                    ids.append(key)
                    fidx.append(i * every_n)
                    frames.append(b[i * 16 : i * 16 + 16])
            yield pd.DataFrame({id_col: ids, "frame_idx": fidx, "frame": frames})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, bin_col).mapInPandas(
        fn, schema=f"{id_col} {id_type}, frame_idx int, frame binary"
    )


def text_binary_metadata(docs: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """``binary_metadata`` over the UTF-8 bytes of ``text_col`` — lets the
    binary-column lane run (and be oracled) on corpora that carry only
    text, like the driver's testdata. All built-ins, narrow map."""
    b = f"encode({text_col}, 'UTF-8')"
    return docs.select(
        F.col(id_col),
        F.expr(f"CAST(length({b}) AS BIGINT)").alias("n_bytes"),
        F.expr(f"upper(hex(substring({b}, 1, 4)))").alias("magic_hex"),
        F.expr(f"md5({b})").alias("md5_hex"),
    )


def text_binary_metadata_sql(id_col: str, table: str = "documents") -> str:
    return f"""
SELECT {id_col},
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  upper(left(hex(encode(text)), 8)) AS magic_hex,
  md5(text) AS md5_hex
FROM {table}"""
