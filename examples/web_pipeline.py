"""End-to-end web-crawl pipeline: CommonCrawl-shaped WARC segments in,
training-ready text out — the crawl-side counterpart of
``corpus_pipeline.py`` (which starts from already-extracted text).

    .warc.gz segments
      → WARC ingest                   (streaming-capable binary parse)
      → response/text dissection      (HTTP envelope, non-2xx dropped)
      → robots compliance audit       (RFC 9309 rules as a join)
      → canonical-URL recrawl dedup   (tracker/case variants collapse)
      → main-content extraction       (block-level link density:
                                       nav/footer chrome drops)
      → C4 line + page rules          (terminal punct, javascript,
                                       lorem ipsum, sentence minimum)
      → Gopher quality + repetition   (the published document gates)
      → PII scan + redaction          (release gate)
      → MinHash near-dup dedup        (boilerplate page variants)
      → shard export                  (hash shards + manifest)

The crawl itself is SYNTHESIZED here (seeded, spec-conformant WARC
bytes via ``sources.warc.make_warc_record``) because this sandbox has
no network: ~120 pages of punctuated English article text with planted
crawl pathologies — tracker-decorated refetches, near-duplicate page
variants, javascript/boilerplate lines, lorem-ipsum stubs, PII, spam
repetition, a 404 and an image (dropped at ingest).

Run: python examples/web_pipeline.py   Prints one JSON attrition report.
"""

from __future__ import annotations

import json
import os
import random
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SUBJECTS = ["The committee", "A local researcher", "The city council",
            "One senior editor", "The survey team", "A visiting professor",
            "The review board", "Our correspondent"]
VERBS = ["reported", "confirmed", "suggested", "noted", "found",
         "argued", "explained", "observed"]
ADJECTIVES = ["revised", "annual", "updated", "original", "joint",
              "regional", "public", "final"]
NOUNS = ["budget", "policy", "dataset", "schedule", "contract",
         "proposal", "review", "estimate"]
ACTIONS = ["change", "expand", "improve", "shrink", "stabilise",
           "continue", "lapse", "recover"]


def _page(rng: random.Random, kind: str, i: int) -> str:
    """One HTML page of punctuated English prose, with a planted
    pathology per kind. Sentences are COMPOSED (subject × verb × noun ×
    action) with a unique mid-sentence token, so ordinary pages have
    real variety and do not trip the duplicate-n-gram repetition gate —
    which is exactly what the planted "spam" pages DO trip."""
    body = " ".join(
        "{} {} in case {}-{} that the {} {} would {} by point {}-{}.".format(
            rng.choice(SUBJECTS), rng.choice(VERBS), i, j,
            rng.choice(ADJECTIVES), rng.choice(NOUNS),
            rng.choice(ACTIONS), i, j + 100,
        )
        for j in range(rng.randint(8, 14))
    )
    paras = [body[: len(body) // 2], body[len(body) // 2 :]]
    extra = ""
    if kind == "js":
        extra = "<p>Please enable javascript to continue reading now.</p>"
    elif kind == "lorem":
        extra = "<p>Lorem ipsum dolor sit amet, consectetur elit.</p>"
    elif kind == "pii":
        extra = "<p>Contact editor{} at tips{}@example.com today.</p>".format(i, i)
    elif kind == "spam":
        extra = "<p>" + "Buy now best price. " * 40 + "</p>"
    return (
        "<html><head><title>Article {}</title>"
        "<script>var x = 1;</script></head><body>"
        "<p>{}</p><p>{}</p>{}"
        "<div>About us. Privacy policy. Terms of service apply here always.</div>"
        "</body></html>".format(i, paras[0], paras[1], extra)
    )


def synthesize_crawl(segment_dir: str, n_pages: int = 120) -> None:
    """Write two .warc.gz segments of seeded synthetic pages."""
    from sparvi_core_spark.sources.warc import (
        make_warc_bytes,
        make_warc_record,
    )

    rng = random.Random(7)
    records = []
    for i in range(n_pages):
        kind = ["clean", "clean", "clean", "js", "lorem", "pii", "spam"][i % 7]
        html = _page(rng, kind, i)
        url = f"https://Site{i % 9}.Example.COM/articles/{i}"
        if i % 20 == 1:  # publisher opt-out: robots META, not robots.txt
            html = html.replace(
                "<head>",
                '<head><meta name="robots" content="noindex, nofollow">',
                1,
            )
        records.append(
            make_warc_record(url, html.encode(), record_id=f"<urn:uuid:{i}>")
        )
        if i % 6 == 0:  # tracker-decorated refetch of the SAME page
            records.append(
                make_warc_record(
                    url.lower() + "/?utm_source=feed&fbclid=x",
                    html.encode(),
                    record_id=f"<urn:uuid:re-{i}>",
                )
            )
        if i % 10 == 3:  # near-duplicate page variant on another host,
            # declaring its origin via rel=canonical (mirrors often do)
            variant = html.replace("Article", "Story", 1).replace(
                "<head>",
                f'<head><link rel="canonical" href="{url.lower()}">',
                1,
            )
            records.append(
                make_warc_record(
                    f"https://mirror.example.net/copy/{i}",
                    variant.encode(),
                    record_id=f"<urn:uuid:mi-{i}>",
                )
            )
    records.append(
        make_warc_record(
            "https://gone.example.com/x", b"gone",
            record_id="<urn:uuid:404>", http_status=404,
            http_content_type="text/plain",
        )
    )
    records.append(
        make_warc_record(
            "https://img.example.com/a.png", b"\x89PNG...",
            record_id="<urn:uuid:img>", http_content_type="image/png",
        )
    )
    half = len(records) // 2
    for name, chunk in (("seg-00000", records[:half]), ("seg-00001", records[half:])):
        with open(os.path.join(segment_dir, f"{name}.warc.gz"), "wb") as fh:
            fh.write(make_warc_bytes(chunk, gzip_members=True))


def main() -> None:
    from sparvi_core_spark import get_spark
    from sparvi_core_spark.functions.text import (
        c4_clean,
        gopher_quality_flags,
        gopher_repetition_flags,
        main_content,
    )
    from sparvi_core_spark.functions.web import canonicalize_url
    from sparvi_core_spark.operators.dedup import (
        dedup_clusters,
        minhash_dedup_pairs,
    )
    from sparvi_core_spark.operators.ingest import latest_by_key
    from sparvi_core_spark.operators.pii import pii_summary, redact_pii
    from sparvi_core_spark.sources.warc import read_warc, warc_to_documents
    from sparvi_core_spark.sources.writers import write_training_shards

    spark = get_spark(app_name="web-pipeline-example", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    report: dict = {}
    workdir = tempfile.mkdtemp(prefix="webcrawl_")
    seg_dir = os.path.join(workdir, "segments")
    os.makedirs(seg_dir)
    synthesize_crawl(seg_dir)

    # 1. WARC ingest: binary parse, HTTP dissection, non-2xx/non-text drop
    raw = read_warc(spark, seg_dir)
    report["warc_records"] = raw.count()
    docs = warc_to_documents(raw).localCheckpoint()
    report["text_responses"] = docs.count()

    # 1b. robots compliance audit (RFC 9309): each host's robots.txt
    #     is config data; whether a fetched URL was fetchable is a
    #     broadcast join. Site0 disallows its /articles/ section for
    #     everyone except "goodbot" — our crawler ("sparvibot") must
    #     flag those fetches and drop them before any processing.
    from sparvi_core_spark.functions.web import (
        filter_robots_disallowed,
        parse_robots_txt,
    )

    robots_bodies = spark.createDataFrame(
        [(
            "site0.example.com",
            "User-agent: goodbot\nAllow: /\n\n"
            "User-agent: *\nDisallow: /articles/\n",
        )],
        "host string, robots_txt string",
    )
    rules = parse_robots_txt(robots_bodies)
    fetchable, disallowed = filter_robots_disallowed(
        docs, rules, agent="sparvibot"
    )
    report["robots_screen"] = {
        "fetched": docs.count(),
        "disallowed": disallowed.count(),
    }
    docs = fetchable.localCheckpoint()

    # 1c. page-metadata compliance + canonical rewrite: the robots
    #     META is the in-page opt-out the fetch gate cannot see (RFC
    #     9309 gates the FETCH; noindex gates KEEPING a page already
    #     fetched), and a publisher-declared rel=canonical is the
    #     dedup key of record — mirrors pointing at their origin
    #     collapse at the URL tier, before any content dedup runs.
    from sparvi_core_spark.functions.web import html_metadata

    meta = html_metadata(docs, id_col="doc_id").localCheckpoint()
    n_noindex = meta.filter("noindex").count()
    n_canon = meta.filter(F.col("canonical_url").isNotNull()).count()
    docs = (
        docs.join(
            meta.select(
                F.col("id").alias("doc_id"), "noindex", "canonical_url"
            ),
            "doc_id",
        )
        .filter(~F.col("noindex"))
        .withColumn("url", F.coalesce("canonical_url", "url"))
        .drop("noindex", "canonical_url")
        .localCheckpoint()
    )
    report["meta_screen"] = {
        "noindexed_dropped": n_noindex,
        "canonical_rewrites": n_canon,
    }

    # 2a. the recrawl screen IN-STREAM: a live crawl tail dedups
    #     recrawls before they land (dropDuplicatesWithinWatermark on
    #     the canonical key — state bounded by the watermark horizon;
    #     stage 2 below is the corpus-wide batch compaction, this is
    #     the ingest-time gate the frontier runs continuously)
    from sparvi_core_spark.streaming.dedup_stream import dedup_stream_by_url

    tail_dir = os.path.join(workdir, "live_tail")
    # WARC-Date is an ISO-8601 string; the watermark needs a timestamp
    docs.select(
        "doc_id", "url", F.to_timestamp("fetched_at").alias("fetched_at")
    ).write.parquet(tail_dir)
    tail = (
        spark.readStream.schema(spark.read.parquet(tail_dir).schema)
        .parquet(tail_dir)
    )
    screened = dedup_stream_by_url(tail, ts_col="fetched_at", delay="1 hour")
    q = (
        screened.writeStream.format("memory").queryName("live_screen")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    report["stream_url_screen"] = {
        "raw": spark.read.parquet(tail_dir).count(),
        "kept": spark.table("live_screen").count(),
    }

    # 2. recrawl compaction on the CANONICAL url (tracker variants merge)
    docs = latest_by_key(
        docs.withColumn("canon_url", canonicalize_url("url", strip_www=True)),
        ["canon_url"], "fetched_at", tie_col="doc_id",
    ).localCheckpoint()
    report["after_url_dedup"] = docs.count()

    # 3. main-content extraction (precision-first: link-dense nav /
    #    footer chrome drops at the block level; strip_markup is the
    #    recall-first alternative when losing content is worse than
    #    keeping chrome). Block-per-line output is exactly the line
    #    structure the C4 rules in stage 4 expect — collapse only
    #    intra-line whitespace so it survives.
    docs = docs.select(
        "doc_id", "canon_url",
        F.regexp_replace(
            main_content("text"), r"[ \t]+", " "
        ).alias("text"),
    ).localCheckpoint()

    # 4. C4: line rules rewrite the text (javascript/boilerplate lines
    #    drop), page rules gate it
    pre_gate = docs  # (doc_id, canon_url, text) — host feedback needs it
    c4 = c4_clean(docs, id_col="doc_id")
    report["c4_line_attrition"] = {
        k: v
        for k, v in c4.agg(
            F.sum("n_lines_kept").alias("lines_kept"),
            F.sum("n_lines_dropped").alias("lines_dropped"),
        ).first().asDict().items()
    }
    docs = (
        docs.drop("text")
        .join(
            c4.filter("passes_c4").select(F.col("id").alias("doc_id"), "text"),
            "doc_id",
        )
        .localCheckpoint()
    )
    report["after_c4"] = docs.count()

    # 5. Gopher quality + repetition gates
    gq = gopher_quality_flags(docs).filter("passes_gopher").select(
        F.col("id").alias("doc_id"))
    gr = gopher_repetition_flags(docs).filter("passes_repetition").select(
        F.col("id").alias("doc_id"))
    docs = docs.join(gq, "doc_id").join(gr, "doc_id").localCheckpoint()
    report["after_gopher"] = docs.count()

    # 6. PII: measure, then redact in place
    before = pii_summary(docs).first()
    docs = redact_pii(docs).localCheckpoint()
    after = pii_summary(docs).first()
    report["pii_gate"] = {
        "before_docs_with_pii": before["docs_with_pii"],
        "after_docs_with_pii": after["docs_with_pii"],
    }

    # 7. near-dup dedup (mirror-host page variants collapse onto the
    #    min-id survivor)
    pairs = minhash_dedup_pairs(docs, threshold=0.6)
    clusters = dedup_clusters(pairs)
    losers = clusters.filter(F.col("id") != F.col("cluster")).select(
        F.col("id").alias("doc_id")
    )
    docs = docs.join(losers, "doc_id", "left_anti").localCheckpoint()
    report["after_near_dup"] = docs.count()

    # 8. crawl feedback: per-host gate pass rates over everything that
    #    survived URL dedup — the frontier-priority table the next
    #    crawl consumes (hosts that keep failing get de-prioritized)
    from sparvi_core_spark.functions.web import host_quality_stats

    gated = pre_gate.join(
        c4.select(F.col("id").alias("doc_id"), "passes_c4"), "doc_id"
    )
    hq = host_quality_stats(gated, ["passes_c4"], url_col="canon_url")
    report["host_quality"] = {
        r["host"]: {"n_docs": r["n_docs"], "c4_frac": r["passes_c4_frac"]}
        for r in hq.orderBy(F.desc("n_docs")).limit(5).collect()
    }

    # 9. shard export
    shard_dir = os.path.join(workdir, "shards")
    manifest = write_training_shards(
        docs.select("doc_id", "text"), shard_dir, n_shards=2,
        id_col="doc_id",
    )
    report["shards"] = {
        "n_shards": manifest["n_shards"],
        "rows": manifest["rows"],
        "path": shard_dir,
    }

    # 10. the NEXT crawl's increment: persist this corpus's dedup
    #     state ONCE (sources.minhash_index — band buckets + signature
    #     side-store at rest), then screen a later recrawl against the
    #     whole admitted corpus without ever re-signing history. The
    #     second crawl here re-fetches the first 60 pages (the
    #     synthesizer is seeded), so recrawls of ADMITTED pages drop;
    #     what survives is pages the gates rejected last time (the
    #     index only knows what was admitted — re-filtering those is
    #     the gates' job, exactly as in a real frontier loop).
    from sparvi_core_spark.sources.minhash_index import (
        filter_new_against_index,
        write_minhash_index,
    )

    idx_dir = os.path.join(workdir, "dedup_index")
    man = write_minhash_index(
        docs.select("doc_id", "text"), idx_dir,
        num_hashes=16, threshold=0.6, n_buckets=64,
    )
    seg2 = os.path.join(workdir, "segments2")
    os.makedirs(seg2)
    synthesize_crawl(seg2, n_pages=60)
    # screen at the SAME pipeline point the index was built at: the
    # indexed text is post-extraction AND post-C4-line-rewrite, so the
    # recrawl runs the same extract + C4 rewrite before probing —
    # otherwise lines the cleaner drops (e.g. the mid-paragraph split
    # without terminal punctuation) push true recrawls below the
    # jaccard threshold
    extracted2 = warc_to_documents(read_warc(spark, seg2)).select(
        F.concat(F.lit("recrawl-"), F.col("doc_id")).alias("doc_id"),
        F.regexp_replace(
            main_content("text"), r"[ \t]+", " "
        ).alias("text"),
    )
    docs2 = c4_clean(extracted2, id_col="doc_id").select(
        F.col("id").alias("doc_id"), "text"
    ).localCheckpoint()
    novel = filter_new_against_index(
        spark, idx_dir, docs2, threshold=0.6
    ).localCheckpoint()
    report["incremental_crawl"] = {
        "indexed_docs": man["n_docs"],
        "recrawl_batch": docs2.count(),
        "novel_after_screen": novel.count(),
    }

    # the admitted survivors join the index the micro-batch way: a
    # STAGED append (exactly two file creations, vs one per touched
    # bucket of both stores — the streaming-grain ingest path), then
    # the auto-compaction trigger folds staging into the bucket
    # partitions once the debt passes the knob (forced low here so the
    # example exercises the fold; production uses ~16)
    from sparvi_core_spark.sources.minhash_index import (
        append_minhash_index,
        compact_minhash_index_if,
    )

    man2 = append_minhash_index(spark, idx_dir, novel, staged=True)
    fold = compact_minhash_index_if(spark, idx_dir, max_files_per_bucket=1)
    report["incremental_crawl"]["admitted_appended"] = (
        man2["n_docs"] - man["n_docs"]
    )
    report["incremental_crawl"]["staged_fold_ran"] = fold["compacted"]

    # 11. takedown: a removal request arrives for an ADMITTED doc.
    #     delete_from_minhash_index tombstones it (the very next
    #     screen stops treating recrawls of it as duplicates — they
    #     surface again, for the frontier to refetch-or-skip by
    #     policy) and the next compaction purges it physically.
    from sparvi_core_spark.sources.minhash_index import (
        compact_minhash_index,
        delete_from_minhash_index,
    )

    victim = docs.select("doc_id").first()["doc_id"]
    del_stats = delete_from_minhash_index(spark, idx_dir, [victim])
    cstats = compact_minhash_index(spark, idx_dir)
    report["takedown"] = {
        "deleted_id": victim,
        "pending_before_compact": del_stats["pending_purge"],
        "purged_rows": cstats["purge"]["sigs"]["rows_dropped"],
        "docs_after": man2["n_docs"] - del_stats["pending_purge"],
    }

    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
