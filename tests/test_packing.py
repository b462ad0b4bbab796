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


# ---------------------------------------------------------------------------
# RAG chunking
# ---------------------------------------------------------------------------


def test_chunk_documents_coverage_and_overlap(spark):
    from sparvi_core_spark.operators.packing import chunk_documents

    words = " ".join(f"w{i}" for i in range(25))
    df = spark.createDataFrame([(1, words)], ["doc_id", "text"])
    out = (
        chunk_documents(df, chunk_tokens=10, overlap_tokens=3)
        .orderBy("chunk_id")
        .collect()
    )
    # stride 7: starts at 0,7,14 cover tokens up to 24 → 1+ceil(15/7)=4
    assert [r.chunk_id for r in out] == [0, 1, 2, 3]
    assert out[0].chunk_text.split() == [f"w{i}" for i in range(10)]
    assert out[1].chunk_text.split() == [f"w{i}" for i in range(7, 17)]
    # consecutive chunks share exactly overlap_tokens tokens
    assert out[0].chunk_text.split()[-3:] == out[1].chunk_text.split()[:3]
    # full coverage, short tail allowed
    assert out[-1].chunk_text.split()[-1] == "w24"
    assert out[-1].n_tokens == 25 - 3 * 7
    assert all(r.n_tokens <= 10 for r in out)


def test_chunk_documents_short_and_empty(spark):
    from sparvi_core_spark.operators.packing import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, "   "), (4, "single")],
        ["doc_id", "text"],
    )
    out = chunk_documents(df, chunk_tokens=10, overlap_tokens=3).collect()
    got = {r.id: r for r in out}
    assert set(got) == {1, 4}  # empty/blank docs → no chunks
    assert got[1].chunk_text == "a b c" and got[1].n_tokens == 3
    assert got[4].chunk_id == 0


def test_chunk_documents_matches_duckdb_oracle(spark):
    import duckdb

    from sparvi_core_spark.operators.packing import chunk_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = (
        chunk_documents(docs, chunk_tokens=20, overlap_tokens=5)
        .toPandas()
        .sort_values(["id", "chunk_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    want = con.execute(
        r"""
        WITH t AS (
          SELECT doc_id AS id,
                 string_split_regex(trim(text), '\s+') AS toks
          FROM documents WHERE trim(text) <> ''
        ),
        n AS (
          SELECT id, toks, len(toks) AS n,
                 1 + CAST(ceil(greatest(len(toks) - 20, 0) / 15.0) AS INT)
                   AS nc
          FROM t
        ),
        c AS (
          SELECT id, unnest(range(0, nc)) AS chunk_id, toks FROM n
        )
        SELECT id, chunk_id,
               array_to_string(toks[chunk_id*15 + 1 : chunk_id*15 + 20], ' ')
                 AS chunk_text,
               CAST(len(toks[chunk_id*15 + 1 : chunk_id*15 + 20]) AS INT)
                 AS n_tokens
        FROM c ORDER BY id, chunk_id
        """
    ).df()
    assert len(got) == len(want)
    assert got["chunk_text"].tolist() == want["chunk_text"].tolist()
    assert got["n_tokens"].tolist() == want["n_tokens"].tolist()


def test_chunk_documents_validates(spark):
    import pytest as _pytest

    from sparvi_core_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with _pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(df, chunk_tokens=0)
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=10, overlap_tokens=10)


def test_chunk_documents_is_shuffle_free(spark):
    from sparvi_core_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    plan = (
        chunk_documents(df, chunk_tokens=3, overlap_tokens=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # map-only
