"""spark-submit entry point — the north_rule launch contract:

    spark-submit --py-files polyminhash_spark.zip \
        polyminhash_spark/cli.py run \
        --input /path/corpus.parquet --workdir /path/stages --out /path/out

Subcommands:
    run       full dedup pipeline (checkpointed + resumable via --workdir)
    knn       query-set vs data-set top-k (the reference's two-file entry
              shape: `spjoin data.wkt query.wkt k`, src/main.cpp:93-105)
    bench     synthetic-corpus throughput run (files/sec)
    gen       write a deterministic synthetic corpus parquet
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _cfg_from_args(args) -> "DedupConfig":
    from polyminhash_spark.config import DedupConfig

    return DedupConfig(
        shingle_k=args.k, num_perm=args.num_perm, bands=args.bands,
        rows_per_band=args.num_perm // args.bands, seed=args.seed,
        jaccard_threshold=args.threshold, max_bucket_size=args.max_bucket,
        presplit_slices=getattr(args, "presplit_slices", 0),
        # absent flag = None = auto-by-scale; flag = explicit off
        candidate_prefilter=(False if getattr(args, "no_prefilter", False)
                             else None),
        verify_semi_filter=(False if getattr(args, "no_verify_semi", False)
                            else None),
    )


def cmd_run(args) -> int:
    from polyminhash_spark.pipeline import dedup_output, run_pipeline
    from polyminhash_spark.session import build_session

    spark = build_session(app_name="polyminhash-run", master=args.master)
    cfg = _cfg_from_args(args)
    if args.input_format == "text":
        from polyminhash_spark.sources.text_source import read_text_records

        src = read_text_records(spark, args.input,
                                delimiter=args.text_delimiter,
                                with_id=not args.no_record_ids)
    elif args.input_format == "csv":
        from polyminhash_spark.sources.text_source import read_csv_wkt

        src = read_csv_wkt(spark, args.input,
                           delimiter=args.text_delimiter)
    else:
        src = spark.read.parquet(args.input)
    t0 = time.time()
    res = run_pipeline(spark, src, cfg, workdir=args.workdir)
    out = dedup_output(res)
    out.write.mode("overwrite").parquet(args.out)
    if args.neighbors_out:
        import pyspark.sql.functions as F

        res.neighbors.select(
            F.lower(F.hex("query_id")).alias("query_id"),
            F.lower(F.hex("neighbor_id")).alias("neighbor_id"),
            "distance", "rank",
        ).write.mode("overwrite").parquet(args.neighbors_out)
    res.metrics["wall_sec"] = round(time.time() - t0, 3)
    print(json.dumps(res.metrics))
    spark.stop()
    return 0


def cmd_knn(args) -> int:
    """Reference entry shape A: `spjoin data.wkt query.wkt k`."""
    from polyminhash_spark.operators.knn import knn_query
    from polyminhash_spark.session import build_session

    spark = build_session(app_name="polyminhash-knn", master=args.master)
    cfg = _cfg_from_args(args).with_(top_k=args.k)
    data = spark.read.parquet(args.data)
    queries = spark.read.parquet(args.queries)
    t0 = time.time()
    out = knn_query(data, queries, cfg)
    out.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"neighbor_rows": n, "k": args.k,
                      "wall_sec": round(time.time() - t0, 3)}))
    spark.stop()
    return 0


def cmd_gen(args) -> int:
    from polyminhash_spark.corpus import CorpusParams, write_corpus_parquet

    write_corpus_parquet(args.out, CorpusParams(
        n_files=args.n_files, dup_frac=args.dup_frac, seed=args.seed))
    print(json.dumps({"written": args.out, "n_files": args.n_files}))
    return 0


def cmd_bench(args) -> int:
    import os

    os.environ.setdefault("SPARK_GRAFT_SF_DIR", args.sf_dir)
    if args.n_files:
        os.environ["POLYMINHASH_BENCH_FILES"] = str(args.n_files)
    # bench.py lives at the repo root, one level above this package;
    # under `spark-submit polyminhash_spark/cli.py` sys.path[0] is the
    # package dir, so the root must be added explicitly
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    import bench

    bench.main()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="polyminhash_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--master", default=None)
        sp.add_argument("--k", type=int, default=7)
        sp.add_argument("--num-perm", dest="num_perm", type=int, default=128)
        sp.add_argument("--bands", type=int, default=32)
        sp.add_argument("--seed", type=int, default=100)
        sp.add_argument("--threshold", type=float, default=0.8)
        sp.add_argument("--max-bucket", dest="max_bucket", type=int, default=1000)
        sp.add_argument("--presplit-slices", dest="presplit_slices",
                        type=int, default=0,
                        help="megabucket pre-split: 0=auto, 1=exact, "
                             ">1=forced slice count")
        sp.add_argument("--no-prefilter", dest="no_prefilter",
                        action="store_true",
                        help="disable the tier-0 hash-count prefilter "
                             "(for survivor sets beyond broadcast size)")
        sp.add_argument("--no-verify-semi", dest="no_verify_semi",
                        action="store_true",
                        help="disable the verify content semi-filter "
                             "(for survivor id sets beyond broadcast size)")

    r = sub.add_parser("run", help="full dedup pipeline")
    r.add_argument("--input", required=True)
    r.add_argument("--input-format", dest="input_format", default="parquet",
                   choices=("parquet", "text", "csv"),
                   help="text = one record per line, '<id>\\t<payload>' "
                        "(the reference's native WKT/TSV input); csv = "
                        "header line skipped per file, payload = first "
                        "column before the delimiter (the reference's "
                        "read_csv shape, parse_geodata.cpp:68-128)")
    r.add_argument("--text-delimiter", dest="text_delimiter", default="\t")
    r.add_argument("--no-record-ids", dest="no_record_ids",
                   action="store_true",
                   help="text lines carry no id field; use line numbers")
    r.add_argument("--out", required=True)
    r.add_argument("--workdir", default=None)
    r.add_argument("--neighbors-out", dest="neighbors_out", default=None)
    common(r)
    r.set_defaults(fn=cmd_run)

    kq = sub.add_parser("knn", help="query set vs data set top-k "
                                    "(reference two-file entry shape)")
    kq.add_argument("--data", required=True)
    kq.add_argument("--queries", required=True)
    kq.add_argument("--out", required=True)
    kq.add_argument("-k", "--topk", dest="k", type=int, default=10)
    common(kq)
    kq.set_defaults(fn=cmd_knn)

    g = sub.add_parser("gen", help="generate synthetic corpus parquet")
    g.add_argument("--out", required=True)
    g.add_argument("--n-files", dest="n_files", type=int, default=10000)
    g.add_argument("--dup-frac", dest="dup_frac", type=float, default=0.2)
    g.add_argument("--seed", type=int, default=42)
    g.set_defaults(fn=cmd_gen)

    b = sub.add_parser("bench", help="throughput bench")
    b.add_argument("--sf-dir", dest="sf_dir", default="/root/testdata/sf0.1")
    b.add_argument("--n-files", dest="n_files", type=int, default=None)
    b.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
