"""r5 verdict "What's wrong #3" / "Next round #4": quantify candidate-
pair RECALL on a MIXED (heterogeneous, non-crowd) bucket under the
megabucket pre-split, and pin the auto-engagement scale.

Under presplit_slices > 1 the under-cap all-pairs guarantee holds
within a slice only: a cross-slice pair is proposed only when both
members are their slices' minima (the linked-minima construction).
Because the slice function is id-derived, the SAME split recurs in
every band, so band multiplicity does not recover cross-slice pairs —
the documented trade.  What IS guaranteed is connectivity: every
bucket remains one component through the minima links.  This test
measures both on an engineered mixed bucket and records the numbers.
"""

import pyspark.sql.functions as F

from polyminhash_spark.config import DedupConfig
from polyminhash_spark.operators.candidates import candidate_pairs

N = 40          # bucket members
BANDS = 3       # the same membership recurring across 3 bands
SLICES = 4


def _band_table(spark):
    rows = [(i, b, 100 + b) for i in range(N) for b in range(BANDS)]
    return spark.createDataFrame(rows, "id long, band int, band_key long")


def _pairs(df):
    return {(r.id_a, r.id_b) for r in df.collect()}


def test_presplit_mixed_bucket_recall_and_connectivity(spark):
    bt = _band_table(spark)
    exact, _ = candidate_pairs(bt, max_bucket_size=1000, salt_buckets=8)
    split, _ = candidate_pairs(bt, max_bucket_size=1000, salt_buckets=8,
                               presplit_slices=SLICES)
    e, s = _pairs(exact), _pairs(split)
    assert s <= e                      # pre-split never invents pairs
    recall = len(s) / len(e)

    # analytic expectation: within-slice all-pairs (4 slices of 10 ->
    # 4*C(10,2) = 180 of C(40,2) = 780) + C(4,2) = 6 cross-slice
    # minima-link pairs = 186/780 ~ 0.238.  Measured and pinned here
    # so the documented bound has an executable witness.
    slice_sizes = {}
    for i in range(N):
        slice_sizes[i % SLICES] = slice_sizes.get(i % SLICES, 0) + 1
    within = sum(n * (n - 1) // 2 for n in slice_sizes.values())
    links = SLICES * (SLICES - 1) // 2
    expected = (within + links) / (N * (N - 1) // 2)
    assert abs(recall - expected) < 1e-9, (recall, expected)
    assert 0.2 < recall < 0.3          # the trade is real and bounded

    # connectivity: the proposed pairs keep the bucket ONE component
    parent = {i: i for i in range(N)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in s:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    assert len({find(i) for i in range(N)}) == 1

    # n_shared_bands stays exact for the pairs that ARE proposed: the
    # same split recurs per band, so every proposed pair is proposed in
    # all BANDS bands
    assert {r.n_shared_bands for r in split.collect()} == {BANDS}


def test_presplit_auto_cannot_engage_below_megabucket_scale():
    """The AUTO threshold must keep the exact all-pairs path for every
    corpus where the recall trade is unjustified — template crowds
    beyond task memory become plausible only at ~1e8+ representatives
    (operators/candidates.py module docstring)."""
    cfg = DedupConfig()
    assert cfg.presplit_slices == 0            # AUTO by default
    assert cfg.presplit_auto_threshold >= 100_000_000
