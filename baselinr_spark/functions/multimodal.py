"""Multimodal (image/audio/video) column operators.

Treats media as opaque ``binary`` columns with typed metadata, processed
through Arrow-batched ``mapInPandas`` — the pattern a 100 TB training-data
pipeline uses for decode / feature-extract / resize / frame-sample. The
Spark-side plumbing (schemas, batch iteration, partition behavior) is real
and tested; the codec step itself is pluggable because no image/audio
libraries exist in this container:

- ``decoder=None`` (default) raises ``NotImplementedError`` at executor
  time with a clear message — the production configuration points this at
  PIL/libav via ``register_decoder``.
- ``fake_media_decoder`` is a deterministic stand-in (parses the tiny
  header format produced by ``make_fake_media``) used by tests and the
  driver gate, so the distributed plumbing is exercised end-to-end.

Batch shape notes (scale-relevant): mapInPandas streams an iterator of
pandas DataFrames per partition, so peak executor memory is one Arrow
batch of decoded payloads, not the whole partition — cap batch size with
``spark.sql.execution.arrow.maxRecordsPerBatch`` when payloads are large.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# deterministic fake media (tests / gate) — 16-byte header + payload
#   magic "FMED" | kind u8 (0=image,1=audio,2=video) | w u16 | h u16 |
#   frames u16 | sample_rate u32 | flags u8
# ---------------------------------------------------------------------------

_MAGIC = b"FMED"
_KINDS = ("image", "audio", "video")


def make_fake_media(kind: str, width: int = 0, height: int = 0,
                    frames: int = 1, sample_rate: int = 0,
                    seed: int = 7) -> bytes:
    k = _KINDS.index(kind)
    header = _MAGIC + struct.pack("<BHHHIB", k, width, height, frames,
                                  sample_rate, 0)
    body_len = max(width * height, sample_rate, frames * 64, 16)
    rng = np.random.default_rng(seed)
    return header + rng.integers(0, 256, size=body_len, dtype=np.uint8).tobytes()


def fake_media_decoder(blob: bytes) -> dict:
    """Parse the fake header → metadata dict. Deterministic; the shape of
    a real decoder's output (kind, dims, frames, sample_rate, ok)."""
    if blob is None or len(blob) < 16 or blob[:4] != _MAGIC:
        return {"kind": None, "width": None, "height": None, "frames": None,
                "sample_rate": None, "ok": False}
    k, w, h, fr, sr, _ = struct.unpack("<BHHHIB", blob[4:16])
    return {"kind": _KINDS[k] if k < 3 else None, "width": w, "height": h,
            "frames": fr, "sample_rate": sr, "ok": True}


# ---------------------------------------------------------------------------
# operators
# ---------------------------------------------------------------------------

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_kind", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("frames", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("decode_ok", T.BooleanType()),
    T.StructField("content_sha1", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
])

Decoder = Callable[[bytes], dict]


def _require_decoder(decoder: Decoder | None) -> Decoder:
    if decoder is None:
        raise NotImplementedError(
            "No media decoder available in this environment (PIL/libav not "
            "installed). Pass decoder=fake_media_decoder for tests or "
            "register a real codec in production."
        )
    return decoder


def extract_media_metadata(
    df: DataFrame, id_col: str, blob_col: str, decoder: Decoder | None = None
) -> DataFrame:
    """(id, blob) → typed metadata row per media item. One pass, Arrow
    batches; sha1 gives an exact-dedup key for binary payloads."""
    out_schema = T.StructType(
        [df.schema[id_col]] + list(MEDIA_META_SCHEMA.fields)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = _require_decoder(decoder)
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                blob = r[blob_col]
                m = dec(blob)
                rows.append({
                    id_col: r[id_col],
                    "media_kind": m["kind"],
                    "width": m["width"], "height": m["height"],
                    "frames": m["frames"], "sample_rate": m["sample_rate"],
                    "decode_ok": bool(m["ok"]),
                    "content_sha1": hashlib.sha1(blob).hexdigest() if blob is not None else None,
                    "n_bytes": len(blob) if blob is not None else None,
                })
            yield pd.DataFrame(rows)

    return df.select(id_col, blob_col).mapInPandas(run, schema=out_schema)


def frame_sample_plan(
    df: DataFrame, id_col: str, blob_col: str, every_n: int = 30,
    decoder: Decoder | None = None,
) -> DataFrame:
    """Video → one row per sampled frame index (frame extraction itself is
    the decoder's job; this materializes the (id, frame_idx) work list the
    way a distributed frame-sampler fans out)."""
    meta = extract_media_metadata(df, id_col, blob_col, decoder)
    return (
        meta.filter((F.col("media_kind") == "video") & F.col("decode_ok"))
        .select(
            id_col,
            F.explode(
                F.sequence(F.lit(0), F.col("frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )


def resize_images(
    df: DataFrame, id_col: str, blob_col: str,
    target: tuple[int, int] = (224, 224),
    decoder: Decoder | None = None,
) -> DataFrame:
    """Image resize via mapInPandas. The pixel transform requires a real
    codec, so with the default decoder=None the JOB PLAN builds fine but
    executing raises NotImplementedError (stub per environment note); the
    fake decoder path returns the would-be output shape for plumbing tests."""
    out_schema = T.StructType([
        df.schema[id_col],
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = _require_decoder(decoder)
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                m = dec(r[blob_col])
                ok = m["ok"] and m["kind"] == "image"
                rows.append({
                    id_col: r[id_col],
                    "out_width": target[0] if ok else None,
                    "out_height": target[1] if ok else None,
                    # fake path: no pixels to resample — emit empty payload
                    "resized": b"" if ok else None,
                })
            yield pd.DataFrame(rows)

    return df.select(id_col, blob_col).mapInPandas(run, schema=out_schema)
