"""The production numpy-kernel pipeline vs the generated DuckDB kernel
mirror (plans/kernel_mirror.py) — the same check the driver runs via
the pipeline_clusters / pipeline_neighbors oracle entries, locked in CI
at sf0.001.  Bit-exact: the mirror renders the kernels' uint64
arithmetic (rolling FNV + fmix64, (x^seed)*odd MinHash, band folds,
SimHash majority, tier cuts, exact Jaccard, CC) via 32-bit limb
multiplication in DuckDB."""

import duckdb
import pyspark.sql.functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_pipeline_matches_kernel_mirror(spark):
    import __spark_entry__ as e

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/documents.parquet')")
    q = e.queries()
    osql = e.oracle_sql()
    for name in ("pipeline_clusters", "pipeline_clusters_oph",
                 "pipeline_neighbors", "pipeline_neighbors_oph"):
        srows = sorted(tuple(r) for r in q[name](spark, SF_DIR).collect())
        orows = sorted(tuple(r) for r in con.execute(osql[name]).fetchall())
        assert srows == orows, (name, len(srows), len(orows))
        assert len(srows) > 0


def test_every_query_has_an_oracle():
    """The driver contract carries ZERO rows-only entries: every
    queries() key has an oracle_sql() mirror."""
    import __spark_entry__ as e

    assert set(e.queries()) == set(e.oracle_sql())
