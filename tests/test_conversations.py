"""Conversation (chat/SFT) data prep: parse / stats / validate /
render (operators/conversations.py). No reference analog — the
training-data extension surface (SURVEY.md §2.8). The documents-table
parity check against DuckDB's JSON machinery lives in
tests/test_oracle_parity.py (pinned pair ``conversation_stats``)."""

import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.operators.conversations import (
    CHAT_TURNS_TYPE,
    conversation_report,
    conversation_stats,
    parse_conversations,
    render_conversations,
    validate_conversations,
)

ROWS = [
    (1, '[{"role":"user","content":"hi there"},'
        '{"role":"assistant","content":"hello"}]'),
    (2, '[{"role":"system","content":"be nice"},'
        '{"role":"user","content":"a b c"},'
        '{"role":"assistant","content":" "}]'),
    (3, '[{"role":"user","content":"one"},{"role":"user","content":"two"}]'),
    (4, "not json"),
    (5, '{"role":"user","content":"object not array"}'),
    (6, None),
    (7, "[]"),
    (8, '[{"role":"tool","content":"x"},{"role":"assistant","content":null}]'),
]


@pytest.fixture(scope="module")
def parsed(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, messages string")
    return parse_conversations(df).cache()


def test_parse_behaviors(parsed):
    rows = {r["doc_id"]: r for r in parsed.collect()}
    assert rows[1]["parse_ok"] and len(rows[1]["turns"]) == 2
    assert rows[1]["turns"][0]["role"] == "user"
    # malformed and NULL input → NULL turns, parse_ok false
    assert not rows[4]["parse_ok"] and rows[4]["turns"] is None
    assert not rows[6]["parse_ok"] and rows[6]["turns"] is None
    # the pinned Spark quirk: a bare object wraps to a singleton list
    assert rows[5]["parse_ok"] and len(rows[5]["turns"]) == 1
    # empty list parses ok (validator's has_turns is the gate)
    assert rows[7]["parse_ok"] and rows[7]["turns"] == []
    # null content survives the typed parse
    assert rows[8]["turns"][1]["content"] is None
    assert "messages" not in parsed.columns  # drop_raw default


def test_stats_values(parsed):
    got = {
        r["doc_id"]: r.asDict()
        for r in conversation_stats(parsed).collect()
    }
    assert got[1] == {
        "doc_id": 1, "n_turns": 2, "n_system": 0, "n_user": 1,
        "n_assistant": 1, "n_other": 0, "first_role": "user",
        "last_role": "assistant", "alternates_ok": True, "n_empty": 0,
        "total_chars": 13, "user_tokens": 2, "assistant_tokens": 1,
    }
    # leading system prompt does not break alternation; whitespace-only
    # assistant turn counts as empty and as 0 tokens
    assert got[2]["alternates_ok"] and got[2]["n_system"] == 1
    assert got[2]["n_empty"] == 1 and got[2]["assistant_tokens"] == 0
    # consecutive same-role turns fail alternation
    assert got[3]["alternates_ok"] is False
    # parse failure → NULL stats, not zeros
    assert got[4]["n_turns"] is None and got[4]["total_chars"] is None
    # empty conversation: all-zero, trivially alternating, NULL roles
    assert got[7]["n_turns"] == 0 and got[7]["alternates_ok"] is True
    assert got[7]["first_role"] is None and got[7]["last_role"] is None
    # unknown role counted in n_other; NULL content → 0 chars, 1 empty
    assert got[8]["n_other"] == 1 and got[8]["n_empty"] == 1
    assert got[8]["total_chars"] == 1


def test_validate_and_report(parsed):
    flags = validate_conversations(parsed)
    got = {r["doc_id"]: r.asDict() for r in flags.collect()}
    assert got[1]["valid"] is True
    assert got[2]["valid"] is False and got[2]["nonempty_ok"] is False
    assert got[3]["alternates_ok"] is False and got[3]["last_role_ok"] is False
    # parse failure fails every rule — valid is false, never NULL
    assert got[4] == {
        "doc_id": 4, "parse_ok": False, "has_turns": False,
        "roles_known": False, "first_role_ok": False,
        "alternates_ok": False, "nonempty_ok": False,
        "last_role_ok": False, "valid": False,
    }
    assert got[7]["has_turns"] is False and got[7]["valid"] is False
    assert got[8]["roles_known"] is False
    rep = conversation_report(flags).first().asDict()
    assert rep["n_conversations"] == 8 and rep["n_valid"] == 1
    assert rep["fail_parse_ok"] == 2 and rep["fail_has_turns"] == 3
    assert rep["fail_last_role_ok"] == 5
    # last_role=None drops that rule entirely
    no_last = validate_conversations(parsed, last_role=None)
    assert "last_role_ok" not in no_last.columns
    # dropping the closing-role rule admits doc 5 (singleton user turn)
    assert no_last.filter("valid").count() == 2


def test_render_deterministic(parsed):
    tags = {
        r["doc_id"]: r["text"]
        for r in render_conversations(parsed).collect()
    }
    assert tags[1] == "<|user|>\nhi there\n<|assistant|>\nhello"
    assert tags[7] == ""  # empty conversation renders empty, not NULL
    assert tags[4] is None  # parse failure renders NULL
    # NULL content renders as empty string, the turn is kept
    assert tags[8] == "<|tool|>\nx\n<|assistant|>\n"
    plain = {
        r["doc_id"]: r["text"]
        for r in render_conversations(parsed, style="plain").collect()
    }
    assert plain[1] == "user: hi there\nassistant: hello"
    with pytest.raises(ValueError, match="style"):
        render_conversations(parsed, style="xml")


def test_map_only_plans(parsed):
    """The whole module must stay shuffle-free: stats, validation and
    rendering are per-row expression work (conversation_report's single
    agg is the only exchange in the family)."""
    for df in (
        conversation_stats(parsed),
        validate_conversations(parsed),
        render_conversations(parsed),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


def test_roundtrip_render_reparse(spark):
    """Render → a rendered corpus is exact-dedup-able: identical
    conversations render to identical strings, different ones differ."""
    df = spark.createDataFrame(
        [(1, ROWS[0][1]), (2, ROWS[0][1]), (3, ROWS[2][1])],
        "doc_id long, messages string",
    )
    out = render_conversations(parse_conversations(df))
    texts = [r["text"] for r in out.orderBy("doc_id").collect()]
    assert texts[0] == texts[1] != texts[2]


def test_schema_constant_matches(spark):
    df = spark.range(1).select(
        F.from_json(
            F.lit('[{"role":"user","content":"x","extra":1}]'),
            CHAT_TURNS_TYPE,
        ).alias("turns")
    )
    row = df.first()["turns"]
    # extra JSON keys are ignored by the typed parse
    assert row[0].asDict() == {"role": "user", "content": "x"}


def test_streaming_validation_twin(spark, tmp_path):
    """The whole parse→validate path is map-only expressions, so it
    runs UNCHANGED on a readStream frame — the live ingest-gate use
    (flag/filter malformed conversations as they arrive). Stream
    result == batch result on the same files."""
    from sparvi_core_spark.streaming.profile_stream import (
        run_stream_to_memory,
    )

    d = tmp_path / "chat_stream"
    batch = spark.createDataFrame(
        [(i,) + (ROWS[i % len(ROWS)][1],) for i in range(20)],
        "doc_id long, messages string",
    )
    batch.write.mode("overwrite").parquet(str(d))
    batch = spark.read.parquet(str(d))

    want = {
        (r["doc_id"], r["valid"])
        for r in validate_conversations(parse_conversations(batch)).collect()
    }

    stream = spark.readStream.schema(batch.schema).parquet(str(d))
    out = validate_conversations(parse_conversations(stream))
    assert out.isStreaming
    run_stream_to_memory(out, "chat_flags_t", output_mode="append")
    got = {
        (r["doc_id"], r["valid"])
        for r in spark.table("chat_flags_t").collect()
    }
    assert got == want and len(got) == 20
