"""Multimodal (binary-column) plumbing.

The input table carries ``html BINARY`` (BASELINE.json input_hint). This
module implements the binary-payload operators a training-data pipeline
needs, treating media as opaque bytes + typed metadata:

* ``extract_text_df`` / ``html_to_text_col`` — REAL: html -> text
  extraction (a deterministic minimal parser: head/script/style/comment
  block removal, tag strip, entity decode, whitespace normalization),
  verifying the per-row invariant ``extract(html) == text`` (the analog of
  the reference's lossless decode, ``/root/reference/jpeg.c:16-122``).
  Identical rules ship three ways: Spark built-ins (JVM hot path), Python
  ``re`` (Arrow kernel), DuckDB SQL (oracle);
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


#: block-removal patterns, applied in order BEFORE the generic tag strip
#: (a script body may contain '<' that is not markup). Shared verbatim by
#: the Spark (Java regex), Python (re), and DuckDB (RE2) implementations —
#: only constructs all three dialects support identically: inline (?is)
#: flags, non-greedy .*?, optional attribute group.
_HTML_BLOCK_PATTERNS = [
    r"(?is)<head(\s[^>]*)?>.*?</head\s*>",
    r"(?is)<script(\s[^>]*)?>.*?</script\s*>",
    r"(?is)<style(\s[^>]*)?>.*?</style\s*>",
    r"(?s)<!--.*?-->",
]
_HTML_TAG_PATTERN = r"<[^>]+>"
#: entity decode table; '&amp;' deliberately LAST so '&amp;lt;' decodes to
#: the literal '&lt;' (single-pass decode, the inverse of escape-&-first)
_HTML_ENTITIES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
]


def html_to_text_col(col: "F.Column") -> "F.Column":
    """Minimal real html -> text extraction as pure Spark built-ins (JVM
    whole-stage codegen, no Python): strip head/script/style/comment
    blocks, strip tags to spaces, decode the common entities, collapse
    whitespace. Deterministic by construction."""
    c = col
    for p in _HTML_BLOCK_PATTERNS:
        c = F.regexp_replace(c, p, " ")
    c = F.regexp_replace(c, _HTML_TAG_PATTERN, " ")
    for ent, ch in _HTML_ENTITIES:
        c = F.regexp_replace(c, ent, ch)
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def html_to_text_sql(expr: str) -> str:
    """The identical rule chain as DuckDB SQL (RE2 dialect; 'g' = global,
    matching Spark's replace-all default)."""
    c = expr
    for p in _HTML_BLOCK_PATTERNS:
        c = f"regexp_replace({c}, '{p}', ' ', 'g')"
    c = f"regexp_replace({c}, '{_HTML_TAG_PATTERN}', ' ', 'g')"
    for ent, ch in _HTML_ENTITIES:
        ch_sql = ch.replace("'", "''")
        c = f"regexp_replace({c}, '{ent}', '{ch_sql}', 'g')"
    return f"trim(regexp_replace({c}, '\\s+', ' ', 'g'))"


def html_to_text_py(s: str) -> str:
    """The identical rule chain in Python (for the Arrow kernel + tests)."""
    import re

    for p in _HTML_BLOCK_PATTERNS:
        s = re.sub(p, " ", s)
    s = re.sub(_HTML_TAG_PATTERN, " ", s)
    for ent, ch in _HTML_ENTITIES:
        s = s.replace(ent, ch)
    return re.sub(r"\s+", " ", s).strip()


def extract_text_df(df: DataFrame, html_col: str = "html", id_col: str = "url") -> DataFrame:
    """Decode the html payload back to text with the real minimal parser
    (``html_to_text_py``). Narrow Arrow-batched map."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = [
                html_to_text_py(bytes(raw).decode("utf-8", errors="replace"))
                for raw in pdf[html_col].values
            ]
            yield pd.DataFrame({id_col: pdf[id_col].values, "extracted_text": texts})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, html_col).mapInPandas(
        fn, schema=f"{id_col} {id_type}, extracted_text string"
    )


#: messy synthetic page wrapped around an entity-escaped text payload —
#: exercises body-level script (with '<' inside), style, comments, and
#: attribute-laden tags; used by the oracled roundtrip query below
_HTML_WRAP_PREFIX = (
    '<html><head><title>t</title></head><body>'
    '<script type="text/javascript">var x = 1 < 2; // <not a tag></script>'
    "<style media=\"all\">p { color: red; }</style>"
    "<!-- hidden <comment> -->\n  <p class=\"main\" data-x=\"1\">"
)
_HTML_WRAP_SUFFIX = "</p><br/>\n</body></html>"


def wrapped_html_col(text_col: str = "text") -> "F.Column":
    """The messy synthetic page as a Spark column: entity-escape the text,
    wrap in the prefix/suffix. Shared by the extraction-roundtrip query and
    the byte-delta lane (which deltas the page's UTF-8 bytes)."""
    esc = F.col(text_col)
    for ch, ent in [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")]:
        esc = F.regexp_replace(esc, ch, ent)
    return F.concat(F.lit(_HTML_WRAP_PREFIX), esc, F.lit(_HTML_WRAP_SUFFIX))


def wrapped_html_sql(text_expr: str = "text") -> str:
    """The identical page construction as DuckDB SQL."""
    esc = text_expr
    for ch, ent in [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")]:
        esc = f"regexp_replace({esc}, '{ch}', '{ent}', 'g')"
    pre = _HTML_WRAP_PREFIX.replace("'", "''")
    suf = _HTML_WRAP_SUFFIX.replace("'", "''")
    return f"'{pre}' || {esc} || '{suf}'"


def html_extract_roundtrip(docs: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Render each text into a messy synthetic page (entity-escaped payload
    inside scripts/styles/comments/attribute tags), run the REAL extractor,
    and check the per-row invariant: extracted == whitespace-normalized
    original. The driver testdata carries no html column, so the page is
    synthesized deterministically — the extraction under test is real."""
    ext = html_to_text_col(wrapped_html_col(text_col))
    norm = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return docs.select(
        F.col(id_col),
        ext.alias("extracted_text"),
        (ext == norm).alias("roundtrip_ok"),
    )


def html_extract_roundtrip_sql(id_col: str, table: str = "documents") -> str:
    ext = html_to_text_sql(wrapped_html_sql("text"))
    norm = "trim(regexp_replace(text, '\\s+', ' ', 'g'))"
    return f"""
SELECT {id_col}, {ext} AS extracted_text, ({ext} = {norm}) AS roundtrip_ok
FROM {table}"""


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
