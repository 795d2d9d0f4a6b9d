"""r6 instrumentation: isolate one pipeline stage's wall time with the
noop sink (guide §1.4), bypassing the StageCatalog persist+count path.

Builds the pipeline inputs up to the requested stage with the SAME
operators run_pipeline uses, persists them, then times the stage body
alone (optionally under variant flags).

Usage: python scripts/stage_isolate.py <corpus.parquet> [cores]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402


def main() -> int:
    corpus = sys.argv[1]
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from polyminhash_spark.config import default_config
    from polyminhash_spark.operators.bands import explode_bands
    from polyminhash_spark.operators.candidates import candidate_pairs
    from polyminhash_spark.operators.normalize import exact_groups, normalize
    from polyminhash_spark.operators.signatures import add_signatures
    from polyminhash_spark.operators.verify import verify_pairs
    from polyminhash_spark.session import build_session

    cfg = default_config()
    spark = build_session(app_name="stage-isolate", master=f"local[{cores}]",
                          shuffle_partitions=max(cores, 16))
    sc = spark.sparkContext
    src = spark.read.parquet(corpus)

    def mat(name, df):
        sc.setJobDescription(name)
        t0 = time.time()
        out = df.persist()
        out.count()
        print(f"{name}: {time.time()-t0:.2f}s")
        sc.setJobDescription(None)
        return out

    def noop(name, df):
        sc.setJobDescription(name)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        print(f"{name}: {time.time()-t0:.2f}s")
        sc.setJobDescription(None)

    normalized = mat("normalized", normalize(src, cfg))
    rep_map = mat("exact_groups", exact_groups(normalized))
    rep_ids = F.broadcast(
        rep_map.filter(F.col("id") == F.col("rep_id")).select("id"))
    signed = mat("signatures",
                 add_signatures(normalized.join(rep_ids, "id"), cfg,
                                repartition=False))

    for label, kw in [
        ("candidates base", {}),
        ("candidates singleton", {"singleton_prefilter": True}),
        ("candidates prefilter", {"min_band_matches": cfg.min_band_matches}),
        ("candidates singleton+prefilter",
         {"singleton_prefilter": True,
          "min_band_matches": cfg.min_band_matches}),
    ]:
        bands_df = explode_bands(signed)
        pairs, _ = candidate_pairs(bands_df, cfg.max_bucket_size,
                                   cfg.salt_buckets, **kw)
        noop(label, pairs)

    bands_df = explode_bands(signed)
    pairs, _ = candidate_pairs(bands_df, cfg.max_bucket_size,
                               cfg.salt_buckets)
    cands = mat("candidates persist", pairs)
    est = signed.count() < cfg.est_auto_threshold
    noop("verified", verify_pairs(
        cands, signed, cfg.with_(est_tier=est, verify_semi_filter=False),
        content=normalized.select("id", "norm_content")))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
