"""Multimodal columns (BASELINE.json north star: "multimodal columns").

Images/audio/video are opaque ``binary`` columns plus typed metadata —
exactly how large training-data lakes store them (the bytes travel with the
row; decode happens late, inside Arrow-batched Python stages). This module
provides:

- attach/inspect: binary payload columns, magic-byte sniffing, byte stats —
  pure JVM column functions (oracle-matchable).
- decode/featurize plumbing: ``mapInPandas`` stages with real schemas,
  batching and partitioning, where the codec itself is stubbed (PIL/ffmpeg
  are not in this container): ``decode=\"fake\"`` produces deterministic
  features from the bytes; ``decode=\"strict\"`` raises NotImplementedError
  at the stub boundary, which is the marked integration point for a real
  codec.

Scale notes: payload columns make rows wide — the operators here never
shuffle the binary column (metadata is projected out first; Parquet column
pruning keeps un-asked-for payloads on disk), and decode stages size their
Arrow batches via spark.sql.execution.arrow.maxRecordsPerBatch rather than
collecting anything."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: magic prefixes (hex of first 4 bytes) → media type
MAGIC = {
    "89504E47": "image/png",
    "FFD8FFE0": "image/jpeg",
    "52494646": "audio/wav",  # RIFF
    "1A45DFA3": "video/webm",
}


def attach_binary(df: DataFrame, text_col: str = "text", out: str = "payload") -> DataFrame:
    """Turn a text column into a binary payload column (UTF-8 bytes) — the
    ingestion shape for blobs arriving via base64/raw fields."""
    return df.withColumn(out, F.encode(F.col(text_col), "UTF-8"))


def sniff_media_type(payload: str = "payload"):
    """Magic-byte sniff as a column expression: hex of the first 4 bytes
    looked up against known signatures."""
    prefix = F.substring(F.hex(F.col(payload)), 1, 8)
    expr = F.lit("application/octet-stream")
    for magic, mtype in reversed(MAGIC.items()):
        expr = F.when(prefix == magic, mtype).otherwise(expr)
    return expr


def binary_stats(df: DataFrame, payload: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Typed metadata for a payload column: byte length + sniffed type."""
    return df.select(
        id_col,
        F.length(F.col(payload)).alias("n_bytes"),
        sniff_media_type(payload).alias("media_type"),
    )


#: decoded-feature schema: fixed-length feature vector + declared shape.
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def decode_features(
    df: DataFrame,
    payload: str = "payload",
    id_col: str = "doc_id",
    dim: int = 8,
    decode: str = "fake",
) -> DataFrame:
    """Decode/feature-extract stage: Arrow-batched mapInPandas over the
    payload column. The Spark-side plumbing (schema, batch iteration,
    column pruning before the shuffle-free map) is real; the codec is the
    stub. decode='strict' raises NotImplementedError — the marked seam
    where PIL/ffmpeg plug in."""
    if decode not in ("fake", "strict"):
        raise ValueError("decode must be 'fake' or 'strict'")

    pruned = df.select(id_col, payload)  # never carry unneeded columns
    magic = dict(MAGIC)
    out_columns = [f.name for f in FEATURE_SCHEMA.fields]

    # NOTE: the worker closure must be self-contained — module-level
    # *functions* referenced here would be pickled by reference and the
    # worker would need this package importable (not guaranteed when the
    # host runs from an arbitrary cwd). Data globals (magic, out_columns)
    # pickle by value and are safe.
    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        def fake_decode(data: bytes):
            h = _hl.sha256(data).digest()
            height = 1 + data[0] % 64 if data else 1
            width = 1 + (len(data) % 64)
            feats = [
                int.from_bytes(h[4 * i : 4 * i + 4], "big") / float(1 << 31) - 1.0
                for i in range(dim)
            ]
            return height, width, feats

        for pdf in it:
            if decode == "strict":
                raise NotImplementedError(
                    "real image/audio codecs are not available in this "
                    "container; plug PIL/ffmpeg in here"
                )
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload]):
                data = bytes(b) if b is not None else b""
                height, width, feats = fake_decode(data)
                hexs = data[:4].hex().upper()
                rows.append(
                    {
                        "doc_id": i,
                        "media_type": magic.get(hexs, "application/octet-stream"),
                        "height": height,
                        "width": width,
                        "features": feats,
                    }
                )
            yield pd.DataFrame(rows, columns=out_columns)

    return pruned.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(
    df: DataFrame,
    payload: str = "payload",
    id_col: str = "doc_id",
    every_n_bytes: int = 64,
    max_frames: int = 8,
) -> DataFrame:
    """'Frame sampling' plumbing for video-ish payloads: emit up to
    max_frames byte-slices per payload (U4 one-row→many). Pure column ops:
    the slicing itself is substring on binary — a real frame sampler would
    replace the slice expression, the explode/partition shape stays."""
    # last full-or-partial frame starts at floor((len-1)/n): the old
    # floor(len/n) bound emitted one extra ZERO-LENGTH frame whenever the
    # payload length was an exact multiple of every_n_bytes; empty payloads
    # emit no frames at all
    n_bytes = F.length(F.col(payload))
    idx = F.when(
        n_bytes > 0,
        F.sequence(
            F.lit(0),
            F.least(
                F.lit(max_frames - 1),
                F.floor((n_bytes - 1) / every_n_bytes).cast("int"),
            ),
        ),
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.select(id_col, payload, F.explode(idx).alias("frame_no"))
        .select(
            id_col,
            "frame_no",
            F.substring(
                F.col(payload), F.col("frame_no") * every_n_bytes + 1, every_n_bytes
            ).alias("frame_bytes"),
        )
    )


def average_hash(
    df: DataFrame,
    features: str = "features",
    id_col: str = "doc_id",
    dim: int = 8,
) -> DataFrame:
    """Perceptual average-hash (aHash) over a decoded feature vector: bit i
    is set iff feature i exceeds the vector's mean — the classical
    image-dedup fingerprint, applied to whatever :func:`decode_features`
    (or a real codec) produced. Returns ``(id_col, ahash)``; equal hashes
    are near-dup candidates and :func:`dedup.hamming_distance` grades
    borderline pairs.

    The mean comparison is written as ``feature·dim > Σfeatures`` with an
    EXPLICIT left-associated sum (not a fold helper), so the float result
    is bit-identical across engines and the fingerprint — like simhash —
    is value-hashable. Pure narrow projection: zero shuffles."""
    total = " + ".join(
        f"CAST(element_at({features}, {i + 1}) AS DOUBLE)" for i in range(dim)
    )
    bits = " + ".join(
        f"(CASE WHEN CAST(element_at({features}, {i + 1}) AS DOUBLE) * {dim}"
        f" > ({total}) THEN CAST({1 << i} AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END)"
        for i in range(dim)
    )
    return df.selectExpr(f"{id_col} AS doc_id", f"{bits} AS ahash")


def write_binary_files(
    df: DataFrame, out_dir: str, id_col: str = "doc_id", payload: str = "payload"
) -> None:
    """Binary-file SINK: one ``<id>.bin`` per row, written executor-side
    (foreachPartition — no driver collect, so the write scales with
    partitions). Names are derived from the id column, so re-runs are
    idempotent overwrites. Requires ``out_dir`` on a filesystem all
    executors share (local mode / NFS / fuse-mounted object store); on
    HDFS/S3 proper, swap the ``open`` for an fsspec/Hadoop stream — the
    partitioning story is identical."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def dump(rows):
        for r in rows:
            # fail CLEAN on bad rows: bytes(None) inside foreachPartition
            # surfaces as an opaque pickled executor traceback otherwise
            if r[id_col] is None or r[payload] is None:
                raise ValueError(
                    f"write_binary_files: NULL {id_col if r[id_col] is None else payload}"
                    f" (id={r[id_col]!r}) — filter or fill before sinking"
                )
            with open(os.path.join(out_dir, f"{r[id_col]}.bin"), "wb") as fh:
                fh.write(bytes(r[payload]))

    df.select(id_col, payload).foreachPartition(dump)


def read_binary_files(spark, path: str, glob: str = "*.bin") -> DataFrame:
    """Binary-file SOURCE: Spark's built-in ``binaryFile`` format — the
    real ingestion shape for image/audio/video blobs at scale (one row per
    file: path, modificationTime, length, content). Files are split across
    tasks by Spark's file index, so a 100 TB blob store scans exactly like
    any other file source; pair with ``decode_features`` downstream."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
