"""Sequence packing: budget respect, token conservation, determinism
across physical layout, oversize handling, and fill stats."""

import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.operators.packing import (
    pack_chunked,
    pack_greedy,
    packing_stats,
)

BUDGET = 100


@pytest.fixture(scope="module")
def docs(spark):
    # token lengths chosen to exercise: exact fit (100), oversize (250),
    # zero-length (skipped), and a tail of small docs
    rows = [(i, 10 + (i * 37) % 90) for i in range(40)]
    rows += [(100, 100), (101, 250), (102, 0)]
    return spark.createDataFrame(rows, ["doc_id", "n_tokens"])


def _pack_fills(packed):
    return {
        (r["pack_group"], r["pack_id"]): r["fill"]
        for r in packed.groupBy("pack_group", "pack_id")
        .agg(F.sum("tokens").alias("fill"))
        .collect()
    }


def test_greedy_respects_budget_and_covers_all(docs):
    packed = pack_greedy(docs, BUDGET, num_groups=4)
    rows = packed.collect()
    # every positive-token doc assigned exactly once; zero-token skipped
    assert sorted(r["id"] for r in rows) == sorted(
        r["doc_id"] for r in docs.filter("n_tokens > 0").collect()
    )
    for (grp, pid), fill in _pack_fills(packed).items():
        assert fill <= BUDGET or fill == 250, (grp, pid, fill)


def test_greedy_oversize_own_pack_is_alone(docs):
    packed = pack_greedy(docs, BUDGET, num_groups=4)
    by_pack = {}
    for r in packed.collect():
        by_pack.setdefault((r["pack_group"], r["pack_id"]), []).append(r)
    home = next(k for k, v in by_pack.items() if any(x["id"] == 101 for x in v))
    assert len(by_pack[home]) == 1  # the 250-token doc shares with nobody


def test_greedy_oversize_drop_and_error(docs):
    dropped = pack_greedy(docs, BUDGET, num_groups=4, oversize="drop")
    assert 101 not in {r["id"] for r in dropped.collect()}
    with pytest.raises(Exception, match="more than budget"):
        pack_greedy(docs, BUDGET, num_groups=4, oversize="error").collect()


def test_greedy_deterministic_across_layout(docs):
    a = sorted(map(tuple, pack_greedy(docs, BUDGET, num_groups=4).collect()))
    b = sorted(
        map(tuple, pack_greedy(docs.repartition(7), BUDGET, num_groups=4).collect())
    )
    assert a == b


def test_greedy_stable_order_differs_but_valid(docs):
    packed = pack_greedy(docs, BUDGET, num_groups=4, order="stable")
    for (grp, pid), fill in _pack_fills(packed).items():
        assert fill <= BUDGET or fill == 250


def test_greedy_rejects_bad_params(docs):
    with pytest.raises(ValueError, match="budget"):
        pack_greedy(docs, 0)
    with pytest.raises(ValueError, match="order"):
        pack_greedy(docs, BUDGET, order="lifo")
    with pytest.raises(ValueError, match="oversize"):
        pack_greedy(docs, BUDGET, oversize="truncate")


def test_chunked_conserves_tokens_and_fills_packs(docs):
    packed = pack_chunked(docs, BUDGET, num_groups=4)
    rows = packed.collect()
    # per-doc: tokens_in_pack across its packs sums to its token count
    per_doc = {}
    for r in rows:
        per_doc[r["id"]] = per_doc.get(r["id"], 0) + r["tokens_in_pack"]
    expected = {
        r["doc_id"]: r["n_tokens"]
        for r in docs.filter("n_tokens > 0").collect()
    }
    assert per_doc == expected
    # per-group: every pack but the last holds exactly BUDGET tokens
    by_group = {}
    for r in rows:
        key = (r["pack_group"], r["pack_id"])
        by_group.setdefault(key, 0)
        by_group[key] += r["tokens_in_pack"]
    last_pack = {}
    for (grp, pid) in by_group:
        last_pack[grp] = max(last_pack.get(grp, -1), pid)
    for (grp, pid), fill in by_group.items():
        if pid < last_pack[grp]:
            assert fill == BUDGET, (grp, pid, fill)
        else:
            assert 0 < fill <= BUDGET


def test_chunked_sep_tokens_count(spark):
    docs = spark.createDataFrame([(1, 7), (2, 5)], ["doc_id", "n_tokens"])
    packed = pack_chunked(docs, 100, num_groups=1, sep_tokens=1)
    assert {r["tokens"] for r in packed.collect()} == {8, 6}


def test_chunked_doc_spans_contiguous_packs(spark):
    docs = spark.createDataFrame(
        [(1, 30), (2, 250), (3, 20)], ["doc_id", "n_tokens"]
    )
    packed = pack_chunked(docs, 100, num_groups=1)
    spans = sorted(
        r["pack_id"] for r in packed.collect() if r["id"] == 2
    )
    assert spans == list(range(spans[0], spans[0] + len(spans)))
    assert len(spans) >= 3  # 250 tokens cross at least two cuts


def test_packing_stats_shapes(docs):
    g = packing_stats(pack_greedy(docs, BUDGET, num_groups=4), BUDGET)
    row = g.collect()[0]
    assert row["overflow_packs"] == 1  # only the 250-token own_pack
    assert 0 < row["mean_fill_frac"] <= 2.5
    c = packing_stats(pack_chunked(docs, BUDGET, num_groups=4), BUDGET)
    crow = c.collect()[0]
    assert crow["overflow_packs"] == 0
    assert crow["mean_fill_frac"] <= 1.0


def test_greedy_only_ids_ride_the_python_channel(docs):
    """The Arrow/Python stage must see only (id, tokens, group, order) —
    text never shuffles through the worker."""
    wide = docs.withColumn("text", F.lit("x" * 1000))
    packed = pack_greedy(wide, BUDGET, num_groups=4)
    assert set(packed.columns) == {"id", "tokens", "pack_group", "pack_id"}
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "text" not in plan.split("FlatMapGroupsInPandas")[0].split("Exchange")[-1]
