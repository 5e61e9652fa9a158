"""Multimodal columns (X tier): image/audio/video as opaque ``binary``
columns with typed metadata, decoded/feature-extracted through Arrow-batched
``mapInPandas``.

The container has no real media libraries or media fixtures, so the
*content* transforms are deterministic fakes clearly marked below — but the
Spark-side plumbing is real and tested: binary column construction, schema
declaration, Arrow batch iteration, per-batch vectorized numpy work, and
partition-preserving flow (no shuffle: mapInPandas is a narrow
transformation, which is exactly what you want for a 100 TB decode pass —
each executor decodes its own split, nothing moves).

Real-decoder seam: ``_decode_image_batch`` gates on PIL import; with the
library absent it falls back to the deterministic byte-level fake. Swap in
a real decoder and nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from toy_map_reduce_spark.registry import register
from toy_map_reduce_spark.tables import load


_MULTIMODAL_META_ORACLE = """
SELECT doc_id,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       upper(substr(hex(CAST(text AS BLOB)), 1, 16)) AS head_hex,
       CAST(64 + doc_id % 512 AS INTEGER) AS fake_width,
       CAST(64 + (doc_id * 7) % 512 AS INTEGER) AS fake_height,
       3 AS channels
FROM documents
"""


@register("multimodal_meta", "X", oracle=_MULTIMODAL_META_ORACLE,
          doc="Opaque binary column + typed metadata: blob length, hex prefix, "
              "deterministic (doc_id-derived) media dimensions")
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text re-cast as the opaque payload blob (UTF-8 bytes); the
    width/height metadata is synthesized deterministically from doc_id —
    standing in for the typed sidecar a real ingest would carry."""
    docs = load(spark, sf_dir, "documents")
    blob = F.col("text").cast("binary")
    return docs.select(
        "doc_id",
        F.octet_length("text").cast("bigint").alias("n_bytes"),
        F.upper(F.substring(F.hex(blob), 1, 16)).alias("head_hex"),
        (64 + F.col("doc_id") % 512).cast("int").alias("fake_width"),
        (64 + (F.col("doc_id") * 7) % 512).cast("int").alias("fake_height"),
        F.lit(3).alias("channels"),
    )


_FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, byte_sum long, byte_mean double, "
    "head_bytes string, thumb_width int, thumb_height int, n_frames int"
)


def _decode_image_batch(payloads: pd.Series) -> pd.DataFrame:
    """The decode seam, gated like the lakehouse connectors: with PIL on
    the path, any payload that parses as a real image gets REAL decode
    (true width/height/frame count from the codec); everything else — and
    everything when PIL is absent, as in this container — falls back to the
    deterministic byte-level fake (byte stats + fake geometry). Swap-in is
    therefore automatic: drop Pillow into the image and real media columns
    light up with no code change, while text-derived fixtures keep their
    pinned fake outputs either way.
    """
    try:  # pragma: no cover - exercised only when a real decoder exists
        import io

        import PIL.Image

        have_pil = True
    except ImportError:
        have_pil = False

    rows = []
    for payload in payloads:
        b = np.frombuffer(payload, dtype=np.uint8)
        if have_pil:  # pragma: no cover - needs Pillow in the image
            try:
                with PIL.Image.open(io.BytesIO(payload)) as img:
                    rows.append(
                        {
                            "n_bytes": int(b.size),
                            "byte_sum": int(b.sum()),
                            "byte_mean": round(float(b.mean()) if b.size else 0.0, 6),
                            "head_bytes": ",".join(str(int(x)) for x in b[:8]),
                            "thumb_width": int(img.width),
                            "thumb_height": int(img.height),
                            "n_frames": int(getattr(img, "n_frames", 1)),
                        }
                    )
                    continue
            except Exception:
                pass  # not an image payload — deterministic fake below
        rows.append(
            {
                "n_bytes": int(b.size),
                "byte_sum": int(b.sum()),
                "byte_mean": round(float(b.mean()) if b.size else 0.0, 6),
                # CSV string, not array<int>: the driver's canonicalizer
                # hashes cells and cannot hash list values
                "head_bytes": ",".join(str(int(x)) for x in b[:8]),
                "thumb_width": int(32 + (b.size % 32)),
                "thumb_height": int(32 + ((b.size * 3) % 32)),
                "n_frames": int(1 + b.size % 4),
            }
        )
    return pd.DataFrame(rows)


@register("multimodal_features", "X", oracle=None, bench=True,
          doc="mapInPandas decode/feature-extract pass over binary payloads: "
              "Arrow-batched, partition-preserving (narrow — no shuffle). "
              "Decode step is a deterministic fake (no media libs in env); "
              "plumbing (schema, batching, vectorized numpy) is real. "
              "Rows-only + pytest determinism check")
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _decode_image_batch(pdf["payload"])
            feats.insert(0, "doc_id", pdf["doc_id"].values)
            yield feats

    return docs.mapInPandas(extract, schema=_FEATURE_SCHEMA)


@register("multimodal_frame_sample", "X", oracle=None, bench=False,
          doc="Frame-sampling plumbing for video-like payloads: mapInPandas "
              "emits one row per sampled 'frame' (1 row in → N rows out, the "
              "UDTF shape). Deterministic fake frames; rows-only")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(payload, dtype=np.uint8)
                n_frames = int(1 + b.size % 4)
                stride = max(b.size // n_frames, 1)
                for f in range(n_frames):
                    chunk = b[f * stride : (f + 1) * stride]
                    out.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_idx": f,
                            "frame_bytes": int(chunk.size),
                            "frame_checksum": int(chunk.sum()),
                        }
                    )
            yield pd.DataFrame(out)

    return docs.mapInPandas(
        sample, schema="doc_id long, frame_idx int, frame_bytes long, frame_checksum long"
    )


@register("multimodal_resize", "X", oracle=None, bench=False,
          doc="Resize pass plumbing: mapInPandas re-samples each payload to "
              "a fixed 64-'pixel' thumbnail (deterministic stride resample "
              "standing in for a real image resize — no media libs in env); "
              "Arrow-batched, narrow (no shuffle). Rows-only + determinism "
              "pytest")
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real resize would decode → PIL.resize → re-encode inside the same
    batch loop; the stride resample below has the identical dataflow shape
    (bytes in, fixed-size bytes out, 1:1 rows) so the Spark-side plumbing —
    schema, batching, partition-preservation — is fully exercised."""
    TARGET = 64
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(payload, dtype=np.uint8)
                if b.size == 0:
                    thumb = np.zeros(TARGET, dtype=np.uint8)
                else:
                    idx = (np.arange(TARGET) * b.size) // TARGET
                    thumb = b[idx]
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "thumb_len": int(thumb.size),
                        "thumb_checksum": int(thumb.sum()),
                        "thumb_head": ",".join(str(int(x)) for x in thumb[:8]),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        resize,
        schema="doc_id long, thumb_len int, thumb_checksum long, thumb_head string",
    )


_MM_DEDUP_ORACLE = """
SELECT md5(hex(CAST(text AS BLOB))) AS blob_digest,
       CAST(MIN(doc_id) AS BIGINT) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS dup_count,
       CAST(MIN(octet_length(CAST(text AS BLOB))) AS BIGINT) AS n_bytes
FROM documents
GROUP BY 1
"""


@register("multimodal_dedup_blob", "X", oracle=_MM_DEDUP_ORACLE,
          doc="Binary-payload exact dedup: digest over the opaque blob "
              "(hex-normalized so both engines hash identical strings), "
              "min-doc_id survivorship — dedup_exact's contract applied "
              "to the media column instead of text")
def multimodal_dedup_blob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identical media files are the dominant duplicate class in crawled
    image/audio corpora (same CDN asset under many URLs), and blob-digest
    groupBy is the first pass before any perceptual hashing — same
    uniform-key shuffle properties as dedup_exact. Hashing the HEX of
    the blob pins a byte-identical cross-engine input (DuckDB's md5
    takes VARCHAR)."""
    docs = load(spark, sf_dir, "documents")
    blob = F.col("text").cast("binary")
    return (
        docs.select(
            "doc_id",
            F.md5(F.hex(blob)).alias("blob_digest"),
            F.length(blob).alias("nb"),
        )
        .groupBy("blob_digest")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
            F.min("nb").cast("bigint").alias("n_bytes"),
        )
    )


_PAIR_TABLE_ORACLE = """
SELECT d.lang, e.label,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(d.n_chars) AS BIGINT) AS total_chars
FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
GROUP BY d.lang, e.label
"""


@register("multimodal_pair_table", "X", oracle=_PAIR_TABLE_ORACLE,
          doc="Modality-pair assembly: text docs keyed to their embedding "
              "rows (doc_id = vec_id), per-(lang, label) pair counts — the "
              "manifest-building join that precedes contrastive-pair "
              "training exports")
def multimodal_pair_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pair table is a plain equi-join because both modalities carry
    the same content key — which is the design point: multimodal ingest
    should assign the shared key at crawl time so pairing never needs
    fuzzy matching. Both sides shuffle once on the id (or zero times if
    the lakehouse bucketed them — join_bucketed's layout)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    return (
        docs.join(emb, docs["doc_id"] == emb["vec_id"])
        .groupBy("lang", "label")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@register("multimodal_phash_pairs", "X", oracle=None, bench=False,
          doc="Perceptual-hash near-dup pairs over the opaque blobs: a "
              "deterministic 64-bit stand-in phash (the real DCT hash "
              "needs a decoder the image lacks) fed through the SAME "
              "pigeonhole block self-join as dedup_simhash_pairs — the "
              "pair-retrieval machinery is real and shared; only the "
              "hash function is a fake. Rows-only; determinism "
              "pytest-pinned")
def multimodal_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual dedup at scale is exactly simhash dedup with a
    different signature function: 64-bit hash, Hamming threshold,
    block-rotation retrieval. Reusing simhash_pairs proves the operator
    boundary: when a media lib lands, only the signature expression
    changes (sampled-byte xxhash → DCT phash), not the join machinery."""
    from toy_map_reduce_spark.operators.dedup import simhash_pairs

    docs = load(spark, sf_dir, "documents")
    blob = F.col("text").cast("binary")
    # deterministic fake: hash 4 sampled byte-ranges of the blob into the
    # signature (stands in for coarse image features)
    sig = docs.select(
        "doc_id",
        F.xxhash64(
            F.substring(F.hex(blob), 1, 16),
            F.substring(F.hex(blob), 33, 16),
            F.substring(F.hex(blob), 65, 16),
            F.length(blob),
        ).alias("simhash"),
    )
    return simhash_pairs(sig, max_hamming=3).withColumnRenamed("hamming", "phash_dist")


_ARROW_MAP_ORACLE = """
WITH b AS (
  SELECT octet_length(encode(text)) AS n_bytes FROM documents
)
SELECT CAST(n_bytes // 100 AS BIGINT) AS size_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_blobs,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes
FROM b GROUP BY 1
"""


@register("multimodal_arrow_map", "X", oracle=_ARROW_MAP_ORACLE,
          doc="mapInArrow surface: per-batch pyarrow RecordBatch transform "
              "computing blob byte sizes without pandas materialization, "
              "rolled up to a size histogram — the zero-copy path for "
              "byte-heavy multimodal batches")
def multimodal_arrow_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow hands the Python worker raw Arrow RecordBatches —
    no pandas conversion, no per-cell boxing — which is the right
    surface when the payload is large binary (a pandas object column of
    blobs copies every buffer). The Python stage only computes per-blob
    byte lengths; the histogram is a JVM-side aggregate after, so the
    Arrow boundary carries one int per blob back."""
    import pyarrow as pa

    docs = load(spark, sf_dir, "documents").select(
        F.col("text").cast("binary").alias("payload")
    )

    def blob_sizes(batches):
        for batch in batches:
            sizes = pa.array(
                [len(v.as_py()) for v in batch.column(0)], type=pa.int64()
            )
            yield pa.RecordBatch.from_arrays([sizes], names=["n_bytes"])

    sized = docs.mapInArrow(blob_sizes, "n_bytes long")
    return (
        sized.groupBy((F.col("n_bytes") / 100).cast("long").alias("size_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blobs"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
        )
    )
