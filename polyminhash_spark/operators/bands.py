"""LSH band explode — SURVEY.md O14 (hash-table build as group-by).

The reference builds `nmaps` explicit mutex-guarded hash tables
(src/query.cpp:343-481, src/util.h:169-210); in Spark the hash table IS
the shuffle: exploding to (band, band_key, id) rows and grouping by
(band, band_key) gives the same bucket structure with no locking, and
the bucket index the reference computes by dot-product-mod-10000
(src/util.cpp:153-184) becomes Spark's shuffle hash partitioning — free.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def explode_bands(signed: DataFrame) -> DataFrame:
    """signed (id, bands, ...) -> (id, band int, band_key bigint).

    Rows with an empty shingle set are excluded: the reference never
    indexes records it cannot hash.  (Filtering on n_shingles is safe
    because the signature stage is a mapInPandas NODE — a filter on a
    struct-returning column UDF would instead be pushed below the
    repartition and force a second UDF evaluation.)"""
    return (
        signed.filter(F.col("n_shingles") > 0)
        .select("id", F.posexplode("bands").alias("band", "band_key"))
    )
