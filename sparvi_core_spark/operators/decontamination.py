"""n-gram collision decontamination against a reference (eval) set.

The GPT-3 / PaLM-style benchmark-contamination screen: a training
document is contaminated when it shares at least one word n-gram
(canonically n = 13) with any document in a held-out reference set.
This complements the MinHash cross-split screen
(:func:`~sparvi_core_spark.operators.sampling.cross_split_contamination`):
MinHash finds whole-document near-duplicates; the n-gram screen
catches a benchmark question quoted verbatim inside an otherwise
unrelated 10k-word page, which whole-document similarity never flags.

No analog in the reference engine (its dedup surface stops at the
full-row duplicate-group count, profile_engine.py:100-123) — this is
part of the training-data-pipeline extension surface.

Scale design (the part that matters at 100 TB):

- The reference side is an EVAL SET — benchmarks are MBs, not TBs. Its
  distinct n-gram keys are hashed to 8-byte ``xxhash64`` values and
  **broadcast**, so the corpus side is scanned exactly once with no
  shuffle for the membership test (a broadcast hash join the corpus
  streams through inside codegen).
- The corpus side is deliberately **not** ``distinct()``-ed by default:
  counting n-gram OCCURRENCES instead of unique n-grams avoids a
  corpus-wide shuffle of every exploded shingle — the only shuffle in
  the default plan is the one-row-per-doc count aggregation, which
  map-side partials make negligible. ``distinct=True`` restores
  set-based fractions when the corpus is small enough to afford it.
- Joining on 64-bit hashes instead of shingle strings keeps the
  broadcast table small (8 bytes/key); a hash collision can only ADD a
  spurious collision at ~2^-64 per pair — harmless for a screen whose
  action is "drop the doc".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from sparvi_core_spark.operators.dedup import shingles


def _keys(sh: DataFrame, hash_ngrams: bool) -> DataFrame:
    k = F.xxhash64(F.col("shingle")) if hash_ngrams else F.col("shingle")
    return sh.select(F.col("id"), k.alias("__k"))


def reference_ngram_keys(
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    hash_ngrams: bool = True,
) -> DataFrame:
    """Distinct n-gram keys of the reference set — the (small) frame the
    corpus is screened against. Computed once; pass to
    :func:`ngram_collisions` via ``reference_keys=`` when screening
    several corpora against the same benchmark suite."""
    return (
        _keys(shingles(reference, id_col, text_col, n), hash_ngrams)
        .select("__k")
        .distinct()
    )


def ngram_collisions(
    corpus: DataFrame,
    reference: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    hash_ngrams: bool = True,
    broadcast_reference: bool = True,
    distinct: bool = False,
    reference_keys: DataFrame | None = None,
) -> DataFrame:
    """Per-document collision report: corpus docs sharing ≥1 word
    n-gram with the reference set.

    Returns ``(id, n_ngrams, n_collisions, collision_frac)`` — one row
    per CONTAMINATED doc (docs with zero collisions, or fewer than
    ``n`` words, are absent). With the default ``distinct=False`` the
    counts are n-gram occurrences (no corpus-wide shuffle — see module
    docstring); ``distinct=True`` counts unique n-grams instead.

    ``broadcast_reference`` should stay True whenever the reference is
    a benchmark/eval set (the normal case); set it False only when
    screening against a reference too large to broadcast, which turns
    the membership test into a shuffle join on the 8-byte keys.
    """
    if (reference is None) == (reference_keys is None):
        raise ValueError("pass exactly one of reference / reference_keys")
    if reference_keys is None:
        reference_keys = reference_ngram_keys(
            reference, id_col, text_col, n, hash_ngrams
        )
    refk = reference_keys.withColumn("__hit", F.lit(1))
    if broadcast_reference:
        refk = F.broadcast(refk)

    corp = _keys(shingles(corpus, id_col, text_col, n), hash_ngrams)
    if distinct:
        corp = corp.distinct()
    joined = corp.join(refk, "__k", "left")
    return (
        joined.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.count("__hit").alias("n_collisions"),
        )
        .filter(F.col("n_collisions") > 0)
        .select(
            "id",
            "n_ngrams",
            "n_collisions",
            F.round(F.col("n_collisions") / F.col("n_ngrams"), 4).alias(
                "collision_frac"
            ),
        )
    )


def filter_ngram_contaminated(
    corpus: DataFrame,
    reference: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    min_collisions: int = 1,
    min_collision_frac: float = 0.0,
    hash_ngrams: bool = True,
    broadcast_reference: bool = True,
    reference_keys: DataFrame | None = None,
) -> DataFrame:
    """Corpus minus contaminated docs (the decontamination action).

    A doc is dropped when it has ≥ ``min_collisions`` colliding n-gram
    occurrences AND its collision fraction is ≥ ``min_collision_frac``.
    The contaminated-id frame is one row per dropped doc, so the
    anti-join's build side stays tiny relative to the corpus.
    """
    bad = ngram_collisions(
        corpus,
        reference,
        id_col=id_col,
        text_col=text_col,
        n=n,
        hash_ngrams=hash_ngrams,
        broadcast_reference=broadcast_reference,
        reference_keys=reference_keys,
    ).filter(
        (F.col("n_collisions") >= min_collisions)
        & (F.col("collision_frac") >= min_collision_frac)
    )
    return corpus.join(
        bad.select(F.col("id").alias("__bad_id")),
        corpus[id_col] == F.col("__bad_id"),
        "left_anti",
    )


def eval_contamination_report(
    corpus: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    hash_ngrams: bool = True,
) -> DataFrame:
    """The EVAL-side audit: per reference (benchmark) item, how much of
    it the training corpus has seen — the report used to mark
    benchmark items "dirty" and drop them from scoring (the complement
    of ``ngram_collisions``, which reports per CORPUS doc).

    Returns one row per reference item, including clean ones::

        (id, n_ngrams, n_hit_ngrams, hit_frac, corpus_occurrences)

    ``n_hit_ngrams`` = how many of the item's distinct n-grams appear
    anywhere in the corpus; ``corpus_occurrences`` = total corpus-side
    occurrences of those n-grams (a popularity signal: 1 hit in one
    doc vs a boilerplate phrase in millions reads very differently).

    Scale shape: the reference side is the SMALL side by definition,
    so everything that shuffles is reference-bounded — the corpus is
    scanned once, its shingles semi-joined against the BROADCAST
    reference key set, and the per-key hit counts (≤ |reference
    n-grams| rows, map-side combined) join back to the reference
    items. The corpus never shuffles itself.
    """
    ref_sh = _keys(
        shingles(reference, id_col, text_col, n), hash_ngrams
    ).dropDuplicates(["id", "__k"])
    ref_keys = F.broadcast(ref_sh.select("__k").distinct())

    corp = _keys(shingles(corpus, id_col, text_col, n), hash_ngrams)
    key_hits = (
        corp.join(ref_keys, "__k")  # broadcast semi-shape: corpus scan only
        .groupBy("__k")
        .agg(F.count(F.lit(1)).alias("__occ"))
    )
    return (
        ref_sh.join(key_hits, "__k", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.count("__occ").alias("n_hit_ngrams"),
            F.coalesce(F.sum("__occ"), F.lit(0)).alias("corpus_occurrences"),
        )
        .select(
            "id",
            "n_ngrams",
            "n_hit_ngrams",
            F.round(F.col("n_hit_ngrams") / F.col("n_ngrams"), 4).alias(
                "hit_frac"
            ),
            "corpus_occurrences",
        )
    )
