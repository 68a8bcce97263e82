"""Executor-storage hygiene: persisted/localCheckpoint blocks must be
deterministically releasable between queries.

Iterative operators persist intermediates (edge lists, streaming state,
banded signatures) and release the ``persisted_intermediates`` handles
themselves; the returned frame's own storage is released by the harness
terminal ``release_all_pinned`` (bench.py / tools/check_oracle.py call
it between queries). This test pins the contract on representative
known-persisting queries from three families — iterative graph
(pagerank), LSH banding (minhash), and driver-looped streaming state
(cdc apply): after consuming the result and releasing, NOTHING stays in
``getPersistentRDDs`` — the round-3/4 leak class (blocks lingering for
the driver-GC → ContextCleaner lag, accumulating into eviction churn
over a 188-query bench) stays dead.
"""

import pytest

from panelsplit_spark.utils.storage import pinned_rdd_ids, release_all_pinned
from tests.conftest import SF_DIR


@pytest.mark.parametrize(
    "qname", ["rel_pagerank", "dedup_minhash_lsh", "stream_cdc_apply"]
)
def test_release_all_pinned_clears_query_storage(spark, qname):
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[qname]
    before = set(pinned_rdd_ids(spark))
    df = fn(spark, SF_DIR)
    assert df.count() >= 0
    del df
    release_all_pinned(spark)
    after = set(pinned_rdd_ids(spark))
    leaked = after - before
    assert not leaked, f"{qname} left pinned RDDs after release: {leaked}"


def test_release_all_pinned_counts_and_idempotent(spark):
    from pyspark.sql import functions as F

    df = spark.range(1000).select("id", (F.col("id") * 2).alias("x"))
    p = df.persist()
    p.count()
    ck = df.localCheckpoint(eager=True)
    ck.count()
    assert len(pinned_rdd_ids(spark)) >= 2
    n = release_all_pinned(spark)
    assert n >= 2
    assert pinned_rdd_ids(spark) == []
    # idempotent on an empty map
    assert release_all_pinned(spark) == 0
