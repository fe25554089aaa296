# PySpark `mapInPandas` parity sketch for graft.operators.Multimodal
# ------------------------------------------------------------------
# DOCUMENTATION ONLY — this file is not built or executed in this repo
# (the library is Scala; this container has no Python codec libraries).
# It records the exact migration path promised in the Multimodal
# scaladoc: replacing the JVM `mapPartitions` decode stub with a Python
# worker keeps the SAME schema, partitioning, and batch shape, so the
# surrounding plan (repartition → decode → drop payload → knn/aggregate)
# is unchanged.
#
# Correspondence:
#   Multimodal.decodeFeatures(media, featureDim)   <->  decode_features()
#   Multimodal.mediaFeatureTable(documents)        <->  media_feature_table()
#
# The Scala stub derives deterministic pseudo-features from raw bytes;
# a real deployment swaps `_decode_one` for PIL/torchvision/librosa and
# nothing else changes.

from typing import Iterator
import pandas as pd

# Output schema — MUST match graft.operators.Multimodal.MediaFeatures:
#   doc_id: long, n_bytes: long, features: array<float>
FEATURES_SCHEMA = "doc_id long, n_bytes long, features array<float>"


def _decode_one(payload: bytes, feature_dim: int) -> list:
    """STUB decode kernel — byte-fold pseudo-features, bit-compatible in
    shape with the Scala stub. Replace with a real codec, e.g.:

        img = PIL.Image.open(io.BytesIO(payload))
        return embed(img)  # any per-item feature extractor
    """
    acc = [0] * feature_dim
    for i, b in enumerate(payload):
        acc[i % feature_dim] = (acc[i % feature_dim] * 31 + b) % (2**31 - 1)
    n = max(len(payload), 1)
    return [float(a) / n for a in acc]


def decode_features(media_df, feature_dim: int = 8):
    """media_df: DataFrame(doc_id long, media binary, meta struct).

    Mirrors Multimodal.decodeFeatures:
      - repartition by id BEFORE the CPU-heavy stage (media rows are
        wide; the scan may yield few splits),
      - per-BATCH worker state (codec handles init once per iterator,
        exactly like mapPartitions' per-partition state),
      - payload column dropped in the output batches — bytes never
        shuffle past the decode.
    """
    spark = media_df.sparkSession
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-worker init happens HERE (decoder handles, model weights)
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["media"].map(len),
                "features": pdf["media"].map(
                    lambda b: _decode_one(b, feature_dim)),
            })

    return (media_df.repartition(parts, "doc_id")
            .select("doc_id", "media")
            .mapInPandas(run, schema=FEATURES_SCHEMA))


def media_feature_table(documents_df):
    """Mirror of Multimodal.mediaFeatureTable: synthetic payload attach →
    decode → feature table. `attach` is plain column projection in both
    languages."""
    from pyspark.sql import functions as F
    media = documents_df.select(
        "doc_id", F.col("text").cast("binary").alias("media"))
    return decode_features(media)
