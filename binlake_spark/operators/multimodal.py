"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Convention: media rides in a table as

    media(doc_id string, kind string ∈ {image,audio,video},
          payload binary, meta map<string,string>)

exactly as the tokenized docs ride the change log — binary is opaque to
the engine, metadata is typed, and all per-row work happens in
Arrow-batched ``mapInPandas`` / ``mapInArrow`` stages.

The decode step itself (JPEG → pixels, PCM → samples, container → frames)
needs image/audio libraries that are NOT in this container, so it is
**stubbed** two ways, clearly marked:

- ``decode_stub="raise"``  → NotImplementedError at evaluation time (the
  production integration point: swap `_decode_fake` for PIL/ffmpeg).
- ``decode_stub="fake"``   → a deterministic byte-statistics feature
  vector (histogram over 16 byte-value bins + length), so the Spark-side
  plumbing — schema, Arrow batch shape, partitioning, downstream
  consumers — is fully real and testable.

What IS real here: batch iteration, zero-copy binary access, output
schemas, frame sampling arithmetic, and the partitioning contract
(repartition by doc_id so one doc's frames land together).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 17  # 16 histogram bins + normalized length

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _decode_fake(payload: pd.Series) -> list[np.ndarray]:
    """Deterministic stand-in for pixel/sample decode: 16-bin byte
    histogram + log-length, float32.  Vectorized per batch via numpy
    (frombuffer is a C-level view, no per-byte Python)."""
    out = []
    for buf in payload:
        arr = np.frombuffer(buf, dtype=np.uint8) if buf else np.zeros(0, np.uint8)
        hist = np.bincount(arr >> 4, minlength=16).astype(np.float32)
        total = max(1.0, float(arr.size))
        out.append(np.concatenate([hist / total, [np.log1p(arr.size)]]).astype(np.float32))
    return out


def pil_available() -> bool:
    """Import guard for the optional real image decoder — PIL is not in
    this container, so everything PIL-backed is gated on this and tests
    skip cleanly when it returns False."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _luminance_vec(px: np.ndarray, n_bytes: int) -> np.ndarray:
    hist = np.bincount(px >> 4, minlength=16).astype(np.float32)
    total = max(1.0, float(px.size))
    return np.concatenate([hist / total, [np.log1p(n_bytes)]]).astype(np.float32)


def _decode_with_fallback(payload, kinds, pixels) -> list[np.ndarray]:
    """Shared real-decoder loop: ``pixels(buf) -> uint8 luminance
    array`` per image row; every non-image kind or undecodable payload
    is collected and handed to ``_decode_fake`` ONCE as a batch slice —
    a mostly-non-image batch must not pay a pandas Series construction
    per row inside the Arrow hot loop."""
    out: list = [None] * len(payload)
    fb_idx: list[int] = []
    fb_buf: list = []
    for i, (buf, kind) in enumerate(zip(payload, kinds)):
        if kind == "image" and buf:
            try:
                out[i] = _luminance_vec(pixels(buf), len(buf))
                continue
            except Exception:
                pass  # not decodable — byte-stats fallback below
        fb_idx.append(i)
        fb_buf.append(buf)
    if fb_idx:
        for i, vec in zip(fb_idx, _decode_fake(pd.Series(fb_buf, dtype=object))):
            out[i] = vec
    return out


def _decode_png_stdlib(payload: pd.Series, kinds: pd.Series) -> list[np.ndarray]:
    """Real pixel-domain decode with NO optional dependency: the
    stdlib PNG codec (functions/png_codec.py — zlib inflate + scanline
    unfilter) → luminance histogram, the same FEATURE_DIM vector as the
    PIL path (identical fixed-point gray weights, so a PIL-ful
    deployment computes the same features on the same PNGs).  Non-image
    kinds and payloads that aren't decodable PNGs fall back to the
    byte-statistics vector rather than poisoning the batch."""
    from binlake_spark.functions.png_codec import png_luminance

    return _decode_with_fallback(
        payload, kinds, lambda buf: png_luminance(bytes(buf))
    )


def _decode_pil(payload: pd.Series, kinds: pd.Series) -> list[np.ndarray]:
    """Real image decode (optional dependency): bytes → PIL → grayscale
    pixels → 16-bin luminance histogram + log-length, the pixel-domain
    twin of `_decode_fake`'s byte-domain vector (same FEATURE_DIM, so
    downstream consumers are agnostic to which decoder ran).  Non-image
    kinds and undecodable payloads fall back to the byte-statistics
    vector rather than poisoning the whole batch."""
    import io

    from PIL import Image

    return _decode_with_fallback(
        payload,
        kinds,
        lambda buf: np.asarray(
            Image.open(io.BytesIO(buf)).convert("L"), dtype=np.uint8
        ).ravel(),
    )


def extract_features(
    df: DataFrame,
    decode_stub: str = "fake",
    payload_col: str = "payload",
) -> DataFrame:
    """media → per-item feature vectors, Arrow-batched.

    ``decode_stub``:

    - ``"fake"`` — deterministic byte-statistics vector (always
      available; what the oracle checks);
    - ``"pil"`` — real image decode via PIL (optional dependency;
      raises ImportError here, driver-side, when PIL is absent);
    - ``"png"`` — real PNG decode via the stdlib codec
      (functions/png_codec.py) — no dependency, CI-testable on real
      PNG bytes; non-PNG payloads fall back per row to byte-stats;
    - ``"auto"`` — PIL when importable, else the stdlib PNG decoder
      (so "auto" always has a REAL pixel-domain branch);
    - ``"raise"`` — NotImplementedError at evaluation time (marks the
      integration point in plumbing-only deployments).

    The Spark plumbing (schema, batching, partitioning) is identical in
    every mode — a jar-ful/PIL-ful deployment lights up real decode with
    no plan change."""
    if decode_stub == "auto":
        decode_stub = "pil" if pil_available() else "png"
    if decode_stub == "pil" and not pil_available():
        raise ImportError(
            "decode_stub='pil' requires Pillow (pip install Pillow); "
            "use 'fake' or 'auto' where the dependency is optional"
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "media decode requires image/audio libs not present in "
                    "this container; use decode_stub='fake' for plumbing tests"
                )
            if decode_stub == "pil":
                feats = _decode_pil(pdf[payload_col], pdf["kind"])
            elif decode_stub == "png":
                feats = _decode_png_stdlib(pdf[payload_col], pdf["kind"])
            else:
                feats = _decode_fake(pdf[payload_col])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "kind": pdf["kind"].values,
                    "n_bytes": pdf[payload_col].map(lambda b: len(b) if b else 0).astype("int64"),
                    "features": feats,
                }
            )

    return df.mapInPandas(fn, FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 1024,
    every_n: int = 10,
    payload_col: str = "payload",
) -> DataFrame:
    """Frame sampling for video-like payloads: treat the payload as
    fixed-size frames, keep every Nth.  Pure JVM: sequence + transform +
    explode on substr(binary) — no Python in the path."""
    n_frames = F.floor(F.octet_length(payload_col) / frame_bytes).cast("int")
    # sequence(0, -1) would be a DESCENDING range in Spark — guard empties
    all_idx = F.when(n_frames > 0, F.sequence(F.lit(0), n_frames - 1)).otherwise(
        F.array().cast("array<int>")
    )
    idxs = F.filter(all_idx, lambda i: i % every_n == 0)
    return (
        df.select("doc_id", "kind", F.explode(idxs).alias("frame_idx"), F.col(payload_col))
        .select(
            "doc_id",
            "kind",
            "frame_idx",
            F.expr(f"substring({payload_col}, frame_idx * {frame_bytes} + 1, {frame_bytes})").alias(
                "frame"
            ),
        )
    )


def make_media_table(spark, docs: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic synthetic media over the documents table (text bytes
    as payload) — no external data, real binary plumbing."""
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map(F.lit("lang"), F.col("lang")).alias("meta"),
    )
