"""End-to-end SFT (instruction-tuning) corpus preparation — the
conversation-shaped half of the pipeline, composed in production order:

    raw chat JSON
      → typed parse                   (from_json; corrupt rows flagged,
                                       never fatal)
      → schema validation + report    (independent rule flags: roles,
                                       alternation, emptiness, closing
                                       role — attrition per rule)
      → deterministic rendering       (tags template: one training
                                       string per conversation)
      → exact dedup on rendered text  (identical conversations render
                                       identically — by construction)
      → token accounting              (per-speaker token mass feeds the
                                       packing budget)
      → contamination-safe splits     (xxhash64, append-invariant)
      → atomic greedy packing         (conversations are never split
                                       across packs)

The chat corpus is synthesized deterministically from the documents
table (this sandbox ships no real SFT set): three-turn conversations
whose roles vary by doc_id — so the validator has real work — plus an
injected slice of corrupt JSON, the failure mode every real ingest has.

Run: python examples/sft_pipeline.py [sf_dir]   (default sf0.001)
Prints one JSON report of per-stage attrition.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sparvi_core_spark import get_spark, register_views  # noqa: E402
from sparvi_core_spark.operators.conversations import (  # noqa: E402
    conversation_report,
    conversation_stats,
    parse_conversations,
    render_conversations,
    validate_conversations,
)
from sparvi_core_spark.operators.dedup import exact_dedup  # noqa: E402
from sparvi_core_spark.operators.packing import pack_greedy  # noqa: E402
from sparvi_core_spark.operators.sampling import hash_split  # noqa: E402


def synthesize_chat(docs):
    """Chat JSON per document: the healthy shape is
    ``[user|system, assistant]`` (every 7th row extends to four
    alternating turns); injected failure slices exercise each
    validator rule — every 11th row repeats the user turn
    (alternation), every 13th is truncated JSON (parse), every 17th
    NULL (parse)."""

    def seg(a):
        return F.regexp_replace(
            F.substring(F.coalesce(F.col("text"), F.lit("")), a, 48),
            '[^A-Za-z0-9 ]',
            "",
        )

    def turn(role, content):
        return F.concat(
            F.lit('{"role":"'), role, F.lit('","content":"'),
            content, F.lit('"}'),
        )

    r1 = F.when(F.col("doc_id") % 5 == 0, F.lit("system")).otherwise(
        F.lit("user")
    )
    r2 = F.when(F.col("doc_id") % 11 == 0, F.lit("user")).otherwise(
        F.lit("assistant")
    )
    tail = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.lit(","), turn(F.lit("user"), seg(97)),
            F.lit(","), turn(F.lit("assistant"), seg(145)),
        ),
    ).otherwise(F.lit(""))
    j = F.concat(
        F.lit("["), turn(r1, seg(1)), F.lit(","), turn(r2, seg(49)),
        tail, F.lit("]"),
    )
    j = (
        F.when(F.col("doc_id") % 17 == 0, F.lit(None).cast("string"))
        .when(F.col("doc_id") % 13 == 0, F.substring(j, 1, 20))
        .otherwise(j)
    )
    return docs.select("doc_id", j.alias("messages"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    register_views(spark, sf_dir)
    report: dict = {"sf_dir": sf_dir}

    # 1. ingest + typed parse (corrupt rows survive as parse_ok=false)
    raw = synthesize_chat(spark.table("documents"))
    parsed = parse_conversations(raw).localCheckpoint()
    report["ingested"] = parsed.count()

    # 2. validation: independent rule flags; the report is the
    # attrition ledger a data card needs
    flags = validate_conversations(parsed, last_role="assistant")
    report["validation"] = {
        k: v
        for k, v in conversation_report(flags).first().asDict().items()
    }
    valid = parsed.join(
        flags.filter("valid").select("doc_id"), "doc_id"
    ).localCheckpoint()
    report["valid"] = valid.count()

    # 3. render to training text — deterministic, so exact dedup on the
    # rendered string collapses re-ingested conversations
    rendered = render_conversations(valid)
    deduped = exact_dedup(rendered, ["text"]).localCheckpoint()
    report["after_exact_dedup"] = deduped.count()

    # 4. token accounting feeds the packing budget
    stats = conversation_stats(valid).join(
        deduped.select("doc_id"), "doc_id"
    )
    totals = stats.agg(
        F.sum("user_tokens").alias("user"),
        F.sum("assistant_tokens").alias("assistant"),
        F.sum(F.col("user_tokens") + F.col("assistant_tokens")).alias(
            "total"
        ),
    ).first()
    report["tokens"] = {
        "user": totals["user"],
        "assistant": totals["assistant"],
        "total": totals["total"],
    }

    # 5. contamination-safe splits, then pack train atomically
    with_tokens = deduped.join(
        stats.select(
            "doc_id",
            (F.col("user_tokens") + F.col("assistant_tokens")).alias(
                "n_tokens"
            ),
        ),
        "doc_id",
    )
    splits = hash_split(with_tokens, {"train": 0.9, "val": 0.1})
    packed = pack_greedy(
        splits["train"], budget=256, tokens_col="n_tokens", num_groups=8
    )
    report["splits"] = {k: df.count() for k, df in splits.items()}
    report["train_packs"] = packed.select("pack_id").distinct().count()

    print(json.dumps(report, default=int))
    spark.stop()


if __name__ == "__main__":
    main()
