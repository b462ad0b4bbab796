"""Text-analysis functions for training-data pipelines.

Language ID (two tiers: a cheap 5-language stopword gate, and a
char-n-gram Naive Bayes identifier over 12 seeded languages that sees
unsegmented scripts), quality scoring, token counting, document
fingerprinting — all built-in expressions (split / filter / regexp),
no Python UDFs, so they run inside whole-stage codegen and are
DuckDB-oracle comparable. Word tokenization throughout is
any-whitespace (``\\s+``) splitting, the published Gopher/C4 contract.
"""

from __future__ import annotations

import os.path as _osp

from pyspark.sql import DataFrame, Window, functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
# Order matters: ties break toward the earlier language.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "du", "est", "dans"],
    "es": ["el", "la", "de", "los", "las", "un", "una", "es", "en", "que"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "den", "von", "mit"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "他", "这", "不"],
}

PUNCT_PATTERN = r"[.,!?;:]"
# BPE-ish tokenization: word pieces, digit runs, single non-space symbols
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _tokens(text_col: str) -> F.Column:
    """Whitespace words: split on any whitespace run (``\\s+``), empties
    dropped — the published Gopher/C4 tokenization. (Until round 8 this
    split on a single space, silently merging words across newlines and
    tabs; every consumer and its DuckDB oracle moved together.)"""
    return F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")


def _stop_hits(tokens: F.Column, words: list[str]) -> F.Column:
    """Occurrence count (dups counted) of tokens in a stopword list."""
    stops = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(stops, t)))


def language_scores(text_col: str = "text") -> dict[str, F.Column]:
    toks = _tokens(text_col)
    return {lang: _stop_hits(toks, words) for lang, words in STOPWORDS.items()}


def predicted_language(text_col: str = "text") -> F.Column:
    """Argmax of stopword-hit scores; unscored docs → 'und'.

    Expressed as a greatest-of chain so it stays a single projection.
    """
    scores = language_scores(text_col)
    langs = list(scores)
    best = F.greatest(*[scores[lang] for lang in langs])
    expr = F.lit("und")
    # build the CASE in reverse so earlier languages win ties
    for lang in reversed(langs):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best > 0, expr).otherwise(F.lit("und"))


def quality_score_expr(text_col: str = "text") -> F.Column:
    """The composite quality score as a single column expression:
    0.4·min(1, n_tokens/100) + 0.3·stopword_ratio + 0.3·(1 − punct_ratio),
    rounded to 4. Shared by ``quality_features`` and
    ``operators.pipeline.prepare_corpus`` (which attaches it with
    ``withColumn`` — a projection, no join)."""
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    punct = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(PUNCT_PATTERN), F.lit(0))
    )
    stop_hits = _stop_hits(toks, STOPWORDS["en"])
    tok_d = F.greatest(n_tokens, F.lit(1))
    chr_d = F.greatest(F.length(F.col(text_col)), F.lit(1))
    return F.round(
        0.4 * F.least(F.lit(1.0), n_tokens / F.lit(100.0))
        + 0.3 * (stop_hits / tok_d)
        + 0.3 * (1 - punct / chr_d),
        4,
    )


def quality_features(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc quality features + composite score (rounded, deterministic):

    - n_tokens: whitespace tokens
    - avg_token_len: chars-without-whitespace / tokens
    - punct_ratio: punctuation chars / total chars
    - stopword_ratio: en-stopword occurrences / tokens
    - quality_score: 0.4·min(1, n_tokens/100) + 0.3·stopword_ratio
      + 0.3·(1 − punct_ratio)
    """
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    no_space = F.length(F.regexp_replace(F.col(text_col), r"\s", ""))
    punct = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(PUNCT_PATTERN), F.lit(0))
    )
    stop_hits = _stop_hits(toks, STOPWORDS["en"])
    # empty-doc guard: clamp denominators to 1 so empty/whitespace-only
    # documents get zeroed features instead of a divide-by-zero error
    tok_d = F.greatest(n_tokens, F.lit(1))
    chr_d = F.greatest(F.length(F.col(text_col)), F.lit(1))
    avg_token_len = F.round(no_space / tok_d, 4)
    punct_ratio = F.round(punct / chr_d, 4)
    stop_ratio = F.round(stop_hits / tok_d, 4)
    score = quality_score_expr(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        n_tokens.cast("bigint").alias("n_tokens"),
        avg_token_len.alias("avg_token_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per doc."""
    ws = F.size(_tokens(text_col))
    bpe = F.size(
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(BPE_ISH_PATTERN), F.lit(0)
        )
    )
    return df.select(
        F.col(id_col).alias("id"),
        ws.cast("bigint").alias("ws_tokens"),
        bpe.cast("bigint").alias("bpe_ish_tokens"),
    )


def fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
) -> DataFrame:
    """Content fingerprint per doc: lexicographic-min md5 over word
    n-gram shingles (a 1-hash MinHash — robust to reordering of a small
    fraction of the doc, cheap to compute in one explode+groupBy)."""
    from sparvi_core_spark.operators.dedup import shingles

    sh = shingles(df, id_col, text_col, n)
    return sh.groupBy("id").agg(
        F.min(F.md5(F.concat(F.lit("fp|"), F.col("shingle")))).alias("fingerprint")
    )


# Ordered PII redaction rules. Patterns are kept in the common subset of
# Java regex (Spark) and RE2 (DuckDB/Go): no lookaround, no
# backreferences — which is what makes redaction oracle-checkable and
# portable to other engines. Order matters: emails first (so their
# digit runs are never half-eaten by the phone rules), then the
# dotted/dashed numeric shapes from most to least specific.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # E.164-style international numbers, then separator-style local ones
    ("phone_intl", r"\+\d{7,15}\b", "<PHONE>"),
    ("phone_us", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
]


def redact_pii(text_col: str = "text") -> F.Column:
    """Replace common PII shapes (emails, IPv4s, SSNs, phone numbers)
    with typed placeholder tokens — the standard scrubbing pass before
    corpus text is used for training.

    A chain of ``regexp_replace`` calls (one per :data:`PII_PATTERNS`
    rule, applied in order) — a single codegen projection, no shuffle,
    no Python. Heuristic by design: it redacts the unambiguous textual
    shapes; entity-level NER is out of scope for an expression.
    """
    c = F.col(text_col)
    for _, pattern, replacement in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, replacement)
    return c


def redact_documents(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc redacted text: (id, text) with :func:`redact_pii` applied."""
    return df.select(
        F.col(id_col).alias("id"), redact_pii(text_col).alias("text")
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_n: int = 2,
) -> DataFrame:
    """Within-document repetition signals, per the published quality
    filters for LLM training corpora (duplicate-line and top-n-gram
    character fractions, as used by the Gopher/MassiveText and C4
    cleaning rules):

    - ``n_lines``: non-empty (after trim) newline-separated lines.
    - ``dup_line_frac``: line occurrences beyond the first occurrence
      of their text, over all line occurrences.
    - ``dup_line_char_frac``: characters in those beyond-first
      occurrences, over characters in all line occurrences.
    - ``top_gram``: the most frequent word ``gram_n``-gram (ties break
      to the lexicographically greatest gram — deterministic).
    - ``top_gram_count``: its occurrence count.
    - ``top_gram_char_frac``: count × len(gram) over total text chars —
      the fraction of the document spent repeating its favourite
      phrase.

    High values of any fraction mark boilerplate/spam for the quality
    filter. All ratios are rounded to 4 for engine-portable comparison.

    Plan shape (scales linearly — no per-doc quadratic work, no
    all-pairs): two explodes (lines, grams) each followed by a
    two-level aggregation with map-side partials, then one equi-join on
    the doc id. Docs with no qualifying lines/grams keep a row with
    zeroed fractions (left joins from the id spine).
    """
    from sparvi_core_spark.operators.dedup import shingles

    ids = df.select(F.col(id_col).alias("id"), F.length(F.col(text_col)).alias("__chars"))

    # NB: the explicit lambda matters — F.trim has an optional second
    # parameter, so passing it bare makes transform() feed the element
    # INDEX into it as the trim-character set
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    line_stats = (
        df.select(F.col(id_col).alias("id"), F.explode(lines).alias("line"))
        .groupBy("id", "line")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("len", F.length("line"))
        .groupBy("id")
        .agg(
            F.sum("cnt").alias("n_lines"),
            F.sum(F.col("cnt") - 1).alias("dup_occ"),
            F.sum((F.col("cnt") - 1) * F.col("len")).alias("dup_chars"),
            F.sum(F.col("cnt") * F.col("len")).alias("line_chars"),
        )
    )

    gram_counts = (
        shingles(df, id_col, text_col, gram_n)
        .groupBy("id", "shingle")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    gram_stats = gram_counts.groupBy("id").agg(
        F.max(
            F.struct(
                F.col("cnt").alias("c"),
                (F.col("cnt") * F.length("shingle")).alias("chars"),
                F.col("shingle").alias("g"),
            )
        ).alias("top")
    )

    out = (
        ids.join(line_stats, "id", "left")
        .join(gram_stats, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_lines"), F.lit(0)).cast("bigint").alias("n_lines"),
            F.round(
                F.coalesce(
                    F.col("dup_occ") / F.greatest(F.col("n_lines"), F.lit(1)),
                    F.lit(0.0),
                ),
                4,
            ).alias("dup_line_frac"),
            F.round(
                F.coalesce(
                    F.col("dup_chars") / F.greatest(F.col("line_chars"), F.lit(1)),
                    F.lit(0.0),
                ),
                4,
            ).alias("dup_line_char_frac"),
            F.col("top.g").alias("top_gram"),
            F.coalesce(F.col("top.c"), F.lit(0)).cast("bigint").alias("top_gram_count"),
            F.round(
                F.coalesce(
                    F.col("top.chars") / F.greatest(F.col("__chars"), F.lit(1)),
                    F.lit(0.0),
                ),
                4,
            ).alias("top_gram_char_frac"),
        )
    )
    return out


def strip_markup(text_col: str = "text") -> F.Column:
    """Plain text from HTML-ish markup: drop script/style blocks whole,
    strip tags, decode the common entities, collapse whitespace — the
    pre-tokenization extraction step of a web-corpus pipeline.

    Deliberately regex-based, not a DOM parse: a real HTML parser is a
    per-row Python library call (the slow path, and no lxml in minimal
    clusters); the regex chain runs inside whole-stage codegen and
    covers the overwhelmingly common cases. Patterns stay in the
    Java-regex ∩ RE2 ∩ POSIX subset so an identical chain runs in the
    DuckDB oracle (same contract as ``redact_pii``). Malformed nesting
    degrades to leaving text in place — extraction bias is "keep too
    much", never "drop content silently".
    """
    c = F.col(text_col)
    # script/style: content is code, not text — remove block + payload
    # ((?s) so . crosses newlines; non-greedy to the matching close tag)
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    # comments, then any remaining tag
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"</?[a-zA-Z][^>]*>", " ")
    c = _decode_entities(c)
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


# the five XML predefined entities + nbsp are the bulk of real-web
# entity mass (shared by strip_markup and main_content)
_ENTITIES = (
    ("&nbsp;", " "),
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
)


def _decode_entities(c: F.Column) -> F.Column:
    for ent, rep in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return c


# block-level boundaries for main_content: tags that visually break
# text flow; inline tags (a, b, span, em, …) stay inside their block
_BLOCK_TAG_RE = (
    r"(?i)</?(?:p|div|td|th|li|h[1-6]|article|section|main|header|"
    r"footer|nav|aside|br|tr|table|ul|ol|dl|blockquote|pre|form|"
    r"figure|figcaption)\b[^>]*>"
)
_ANCHOR_RE = r"(?is)<a\b[^>]*>(.*?)</a>"


def main_content(
    text_col: str = "text",
    min_chars: int = 25,
    max_link_density: float = 0.3,
) -> F.Column:
    """Main-content extraction from raw HTML by block-level link
    density — the expression-tier cousin of trafilatura/readability
    (the extractor step of RefinedWeb-style pipelines), for clusters
    where a per-row Python HTML parser is the slow path.

    The classic signal (Kohlschütter et al., WSDM'10 boilerplate
    detection — public): navigation chrome, footers, and link farms
    are SHORT blocks whose characters mostly live inside anchors;
    article prose is long and link-sparse. So: drop script/style/
    comments whole, split on block-level tags, and keep blocks whose
    visible text has ≥ ``min_chars`` characters AND whose
    anchor-enclosed character fraction is ≤ ``max_link_density``; the
    kept blocks' visible text joins with newlines (one block per
    line — ready for the C4 line rules, which expect exactly that).

    All Java-regex ∩ RE2 patterns and higher-order functions —
    JVM-side, no Python, and re-derivable in the DuckDB oracle.
    ``strip_markup`` is the recall-first sibling (keeps everything);
    this is the precision-first extractor (drops chrome). Input is
    HTML by contract: plain text with short lines will lose them —
    run it on pages, not on already-extracted text.
    """
    c = F.col(text_col)
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    # collapse pre-existing whitespace FIRST: literal newlines in the
    # source (hard-wrapped prose, pretty-printed markup) are rendering
    # whitespace, not block boundaries — without this, wrapped
    # paragraph lines shorter than min_chars were silently dropped
    # mid-paragraph (round-9 ADVICE).  \x1e is folded into the same
    # collapse so the record-separator sentinel below cannot pre-exist
    # in the input.
    c = F.regexp_replace(c, "[\\s\x1e]+", " ")
    blocks = F.split(F.regexp_replace(c, _BLOCK_TAG_RE, "\x1e"), "\x1e")

    def _plain(b):
        t = F.regexp_replace(b, r"</?[a-zA-Z][^>]*>", " ")
        t = _decode_entities(t)
        return F.trim(F.regexp_replace(t, r"\s+", " "))

    def _link_chars(b):
        return F.aggregate(
            F.regexp_extract_all(b, F.lit(_ANCHOR_RE), F.lit(1)),
            F.lit(0),
            lambda acc, x: acc + F.length(_plain(x)),
        )

    scored = F.transform(
        blocks,
        lambda b: F.struct(
            _plain(b).alias("t"), _link_chars(b).alias("l")
        ),
    )
    kept = F.filter(
        scored,
        lambda s: (F.length(s["t"]) >= min_chars)
        & (s["l"] <= F.lit(float(max_link_density)) * F.length(s["t"])),
    )
    return F.array_join(F.transform(kept, lambda s: s["t"]), "\n")


def extract_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, extracted) — :func:`strip_markup` over a corpus."""
    return df.select(
        F.col(id_col).alias("id"), strip_markup(text_col).alias("extracted")
    )


def normalize_text(text_col: str = "text") -> F.Column:
    """Canonical text form for exact-dup detection across formatting
    noise: lowercase, punctuation stripped, whitespace collapsed+trimmed.
    Pure built-ins — runs inside codegen."""
    c = F.lower(F.col(text_col))
    c = F.regexp_replace(c, r"[.,!?;:'\"()\[\]{}]", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


# Built-in seed corpus for the char-n-gram language identifier: a few
# ordinary sentences per language, authored for this package (public
# knowledge — no external dataset). All lowercase so engine-specific
# Unicode case-folding can never differ; no apostrophes so the seeds
# inline safely into oracle SQL. Twelve languages across five scripts;
# extend/replace via train_langid(seeds=...) for a real deployment
# (the model is just NB counts — train on any labeled corpus).
LANGID_SEEDS: dict[str, list[str]] = {
    "en": [
        "the weather was cold and the children stayed inside the house",
        "she walked to the market and bought bread with her last coins",
        "this is a simple sentence that should be easy to identify",
        "many people believe that reading books makes life better",
        "the train arrived late because of the heavy snow last night",
        "we should meet again tomorrow after work if you have time",
        "nothing in the garden was growing because it had not rained",
        "he asked whether they would come back before the end of the week",
        "the old man sat by the window and watched the street below",
        "there are always more questions than answers in this world",
        "the cars were moving too fast along the wet city street",
        "when we reached the beach there was nowhere left to sit down",
        "the doctor said that he needed to rest for a few days",
        "before the meeting starts we have to prepare the documents",
        "that afternoon the neighbours went out together to walk in the park",
    ],
    "fr": [
        "le temps était froid et les enfants sont restés dans la maison",
        "elle est allée au marché pour acheter du pain et du fromage",
        "ceci est une phrase simple qui devrait être facile à reconnaître",
        "beaucoup de gens pensent que lire des livres rend la vie meilleure",
        "le train est arrivé en retard à cause de la neige cette nuit",
        "nous devrions nous revoir demain après le travail si tu as le temps",
        "rien ne poussait dans le jardin parce quil navait pas plu",
        "il a demandé si elles reviendraient avant la fin de la semaine",
        "le vieil homme était assis près de la fenêtre et regardait la rue",
        "il y a toujours plus de questions que de réponses dans ce monde",
        "les voitures passaient trop vite dans la rue mouillée de la ville",
        "quand nous sommes arrivés à la plage il ne restait plus de place",
        "le médecin a dit quil devait se reposer pendant quelques jours",
        "avant que la réunion commence nous devons préparer les documents",
        "cet après midi les voisins sont sortis ensemble se promener au parc",
    ],
    "es": [
        "el tiempo estaba frío y los niños se quedaron dentro de la casa",
        "ella fue al mercado y compró pan con sus últimas monedas",
        "esta es una frase sencilla que debería ser fácil de identificar",
        "mucha gente cree que leer libros hace la vida mejor",
        "el tren llegó tarde por la nieve fuerte de anoche",
        "deberíamos vernos otra vez mañana después del trabajo si tienes tiempo",
        "nada crecía en el jardín porque no había llovido en semanas",
        "él preguntó si ellas volverían antes del fin de la semana",
        "el hombre viejo estaba sentado junto a la ventana mirando la calle",
        "siempre hay más preguntas que respuestas en este mundo nuestro",
        "los coches pasaban muy deprisa por la calle mojada de la ciudad",
        "cuando llegamos a la playa ya no quedaba sitio para sentarse",
        "el médico dijo que necesitaba descansar durante algunos días",
        "antes de que empiece la reunión tenemos que preparar los papeles",
        "aquella tarde los vecinos salieron juntos a pasear por el parque",
    ],
    "de": [
        "das wetter war kalt und die kinder blieben im haus",
        "sie ging zum markt und kaufte brot mit ihren letzten münzen",
        "dies ist ein einfacher satz der leicht zu erkennen sein sollte",
        "viele menschen glauben dass lesen das leben besser macht",
        "der zug kam wegen des starken schnees letzte nacht zu spät",
        "wir sollten uns morgen nach der arbeit wieder treffen wenn du zeit hast",
        "nichts wuchs im garten weil es seit wochen nicht geregnet hatte",
        "er fragte ob sie vor dem ende der woche zurückkommen würden",
        "der alte mann sass am fenster und schaute auf die strasse hinunter",
        "es gibt immer mehr fragen als antworten auf dieser welt",
        "die autos fuhren viel zu schnell über die nasse strasse der stadt",
        "als wir am strand ankamen gab es keinen platz mehr zum sitzen",
        "der arzt sagte dass er sich einige tage ausruhen müsse",
        "bevor die besprechung beginnt müssen wir die unterlagen vorbereiten",
        "an jenem nachmittag gingen die nachbarn zusammen im park spazieren",
    ],
    "it": [
        "il tempo era freddo e i bambini sono rimasti dentro casa",
        "lei è andata al mercato e ha comprato il pane con le ultime monete",
        "questa è una frase semplice che dovrebbe essere facile da riconoscere",
        "molte persone credono che leggere libri renda la vita migliore",
        "il treno è arrivato in ritardo per la neve forte di stanotte",
        "dovremmo vederci di nuovo domani dopo il lavoro se hai tempo",
        "niente cresceva nel giardino perché non pioveva da settimane",
        "lui ha chiesto se sarebbero tornate prima della fine della settimana",
        "il vecchio era seduto vicino alla finestra e guardava la strada",
        "ci sono sempre più domande che risposte in questo mondo",
        "le macchine passavano troppo veloci sulla strada bagnata della città",
        "quando siamo arrivati alla spiaggia non era rimasto posto per sedersi",
        "il medico ha detto che doveva riposare per qualche giorno",
        "prima che cominci la riunione dobbiamo preparare i documenti",
        "quel pomeriggio i vicini sono usciti insieme a passeggiare nel parco",
    ],
    "pt": [
        "o tempo estava frio e as crianças ficaram dentro de casa",
        "ela foi ao mercado e comprou pão com as últimas moedas",
        "esta é uma frase simples que deveria ser fácil de identificar",
        "muitas pessoas acreditam que ler livros torna a vida melhor",
        "o trem chegou atrasado por causa da neve forte de ontem à noite",
        "deveríamos nos ver de novo amanhã depois do trabalho se você tiver tempo",
        "nada crescia no jardim porque não chovia há várias semanas",
        "ele perguntou se elas voltariam antes do fim da semana",
        "o velho estava sentado junto à janela olhando para a rua",
        "há sempre mais perguntas do que respostas neste mundo",
        "os carros passavam depressa demais pela rua molhada da cidade",
        "quando chegamos à praia já não havia lugar para nos sentarmos",
        "o médico disse que ele precisava descansar durante alguns dias",
        "antes de começar a reunião temos que preparar os documentos",
        "naquela tarde os vizinhos saíram juntos para passear no parque",
    ],
    "nl": [
        "het weer was koud en de kinderen bleven binnen in het huis",
        "zij liep naar de markt en kocht brood met haar laatste munten",
        "dit is een eenvoudige zin die makkelijk te herkennen zou moeten zijn",
        "veel mensen geloven dat boeken lezen het leven beter maakt",
        "de trein kwam te laat door de zware sneeuw van afgelopen nacht",
        "we zouden elkaar morgen na het werk weer moeten zien als je tijd hebt",
        "niets groeide in de tuin omdat het al weken niet had geregend",
        "hij vroeg of ze voor het einde van de week terug zouden komen",
        "de oude man zat bij het raam en keek naar de straat beneden",
        "er zijn altijd meer vragen dan antwoorden in deze wereld",
        "de autos reden veel te hard over de natte straat van de stad",
        "toen we bij het strand aankwamen was er geen plek meer om te zitten",
        "de dokter zei dat hij een paar dagen moest uitrusten",
        "voordat de vergadering begint moeten we de stukken voorbereiden",
        "die middag gingen de buren samen wandelen in het park",
    ],
    "ru": [
        "погода была холодная и дети остались дома весь день",
        "она пошла на рынок и купила хлеб на последние деньги",
        "это простое предложение которое легко узнать по буквам",
        "многие люди считают что чтение книг делает жизнь лучше",
        "поезд пришел поздно из за сильного снега прошлой ночью",
        "мы должны встретиться снова завтра после работы если у тебя есть время",
        "ничего не росло в саду потому что давно не было дождя",
        "он спросил вернутся ли они до конца этой недели",
        "старик сидел у окна и смотрел на улицу внизу",
        "в этом мире всегда больше вопросов чем ответов",
    ],
    "ar": [
        "كان الطقس باردا وبقي الاطفال داخل المنزل طوال اليوم",
        "ذهبت الى السوق واشترت الخبز بما تبقى من النقود",
        "هذه جملة بسيطة يجب ان يكون من السهل التعرف عليها",
        "يعتقد كثير من الناس ان قراءة الكتب تجعل الحياة افضل",
        "وصل القطار متاخرا بسبب الثلوج الكثيفة الليلة الماضية",
        "يجب ان نلتقي مرة اخرى غدا بعد العمل اذا كان لديك وقت",
        "لم ينمو شيء في الحديقة لانها لم تمطر منذ اسابيع",
        "سال الرجل هل سيعودون قبل نهاية هذا الاسبوع",
        "جلس الرجل العجوز قرب النافذة ينظر الى الشارع",
        "في هذا العالم توجد دائما اسئلة اكثر من الاجوبة",
    ],
    "zh": [
        "天气很冷孩子们整天都待在家里没有出门",
        "她去市场用最后的钱买了一些面包和蔬菜",
        "这是一个应该很容易识别出来的简单句子",
        "很多人认为读书可以让生活变得更加美好",
        "因为昨晚下了大雪火车到站的时间晚了很多",
        "如果你明天下班以后有时间我们应该再见一面",
        "花园里什么都没有长出来因为好几个星期没有下雨了",
        "他问她们会不会在这个星期结束之前回来",
        "老人坐在窗户旁边看着下面街道上来往的行人",
        "这个世界上的问题总是比答案要多得多",
    ],
    "ja": [
        "天気が寒かったので子供たちは一日中家の中にいました",
        "彼女は市場へ行って最後のお金でパンを買いました",
        "これは簡単に見分けられるはずの単純な文です",
        "多くの人は本を読むことで生活が良くなると信じています",
        "昨夜の大雪のせいで電車はとても遅れて到着しました",
        "もし明日仕事の後に時間があればまた会いましょう",
        "何週間も雨が降らなかったので庭には何も育ちませんでした",
        "彼は彼女たちが今週の終わりまでに戻るかどうか尋ねました",
        "老人は窓のそばに座って下の通りを眺めていました",
        "この世界にはいつも答えよりも質問のほうが多いのです",
    ],
    "ko": [
        "날씨가 추워서 아이들은 하루 종일 집 안에 있었다",
        "그녀는 시장에 가서 마지막 돈으로 빵을 샀다",
        "이것은 쉽게 알아볼 수 있는 간단한 문장입니다",
        "많은 사람들은 책을 읽으면 삶이 더 좋아진다고 믿는다",
        "어젯밤 폭설 때문에 기차가 많이 늦게 도착했다",
        "내일 퇴근 후에 시간이 있으면 우리 다시 만나요",
        "몇 주 동안 비가 오지 않아서 정원에는 아무것도 자라지 않았다",
        "그는 그들이 이번 주말 전에 돌아올지 물어보았다",
        "노인은 창가에 앉아 아래 거리를 내려다보고 있었다",
        "이 세상에는 언제나 대답보다 질문이 더 많다",
    ],
}

# Held-out evaluation corpus: authored sentences per language that do
# NOT appear in LANGID_SEEDS (same authorship rules: lowercase, no
# apostrophes), deliberately weighted toward the CLOSE pairs (pt/es,
# nl/de, es/it) where a char-n-gram identifier actually fails. This is
# the acceptance bar for seed/model changes — langid_eval() measures
# the confusion matrix over it, and a test pins the macro accuracy.
LANGID_HELDOUT: dict[str, list[str]] = {
    "en": [
        "a small dog ran across the road before the cars could stop",
        "my sister always drinks her coffee black in the early morning",
        "they finished the project two days before anyone expected it",
        "the library closes early on sundays during the summer months",
    ],
    "fr": [
        "un petit chien a traversé la route avant que les voitures arrivent",
        "ma soeur boit toujours son café noir très tôt le matin",
        "ils ont fini le projet deux jours plus tôt que prévu",
        "la bibliothèque ferme plus tôt le dimanche pendant les mois dété",
    ],
    "es": [
        "un perro pequeño cruzó la calle antes de que pasaran los coches",
        "mi hermana siempre toma su café solo por la mañana temprano",
        "terminaron el proyecto dos días antes de lo que nadie esperaba",
        "la biblioteca cierra temprano los domingos durante el verano",
    ],
    "de": [
        "ein kleiner hund lief über die strasse bevor die autos kamen",
        "meine schwester trinkt ihren kaffee morgens immer schwarz",
        "sie beendeten das projekt zwei tage früher als erwartet",
        "die bibliothek schliesst sonntags im sommer früher als sonst",
    ],
    "it": [
        "un piccolo cane ha attraversato la strada prima delle macchine",
        "mia sorella beve sempre il suo caffè nero la mattina presto",
        "hanno finito il progetto due giorni prima del previsto",
        "la biblioteca chiude presto la domenica durante i mesi estivi",
    ],
    "pt": [
        "um cachorro pequeno atravessou a rua antes dos carros chegarem",
        "minha irmã sempre bebe o café dela puro de manhã cedo",
        "eles terminaram o projeto dois dias antes do que todos esperavam",
        "a biblioteca fecha cedo aos domingos durante os meses de verão",
    ],
    "nl": [
        "een kleine hond rende de weg over voordat de autos eraan kwamen",
        "mijn zus drinkt haar koffie altijd zwart in de vroege ochtend",
        "ze maakten het project twee dagen eerder af dan iedereen dacht",
        "de bibliotheek sluit op zondag vroeger tijdens de zomermaanden",
    ],
    "ru": [
        "маленькая собака перебежала дорогу перед самыми машинами",
        "моя сестра всегда пьет черный кофе рано утром перед работой",
        "они закончили проект на два дня раньше чем все ожидали",
        "библиотека закрывается рано по воскресеньям летом",
    ],
    "ar": [
        "ركض كلب صغير عبر الطريق قبل ان تصل السيارات",
        "اختي تشرب قهوتها دائما بدون سكر في الصباح الباكر",
        "انهوا المشروع قبل يومين مما كان يتوقعه الجميع",
        "تغلق المكتبة ابوابها مبكرا ايام الاحد في الصيف",
    ],
    "zh": [
        "一只小狗在汽车开过来之前跑过了那条马路",
        "我姐姐每天清早都喝不加糖的黑咖啡",
        "他们比所有人预计的提前两天完成了这个项目",
        "图书馆在夏天的每个星期天都会提前关门",
    ],
    "ja": [
        "小さな犬が車が来る前に道路を走って渡りました",
        "私の姉は毎朝早くブラックコーヒーを飲みます",
        "彼らは誰の予想よりも二日早くその計画を終えました",
        "図書館は夏の日曜日にはいつもより早く閉まります",
    ],
    "ko": [
        "작은 개 한 마리가 차들이 오기 전에 길을 건너 뛰어갔다",
        "우리 언니는 아침 일찍 항상 블랙 커피를 마신다",
        "그들은 모두가 예상한 것보다 이틀 일찍 프로젝트를 끝냈다",
        "도서관은 여름 동안 일요일마다 일찍 문을 닫는다",
    ],
}


def train_langid(
    spark,
    seeds: dict[str, list[str]] | None = None,
    char_n: int | tuple[int, ...] = (1, 2, 3),
    num_features: int | None = None,
    min_count: int = 1,
):
    """Train the char-n-gram NB language identifier on ``seeds``
    (default: the built-in :data:`LANGID_SEEDS`) → an
    ``operators.classify.NBModel``. The seed frame is tiny, so the
    model is a labels × seed-vocabulary counts table — broadcastable;
    scoring any corpus with it is one map-side pass + one aggregate.
    For a production identifier, pass your own labeled seeds (e.g. a
    Wikipedia sample per language) — quality scales with the seeds,
    the machinery is identical."""
    from sparvi_core_spark.operators.classify import train_nb

    seeds = LANGID_SEEDS if seeds is None else seeds
    rows = [
        (lang, s)
        for lang in sorted(seeds)
        for s in seeds[lang]
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    return train_nb(
        df, "lang", text_col="text", num_features=num_features,
        min_count=min_count, analyzer="char", char_n=char_n,
    )


# Checked-in demonstration corpus for the public-data training recipe:
# one file per language (stem = label) under train/ and heldout/, 28
# languages across 9 scripts, parallel content so close-pair eval is
# honest. See its README.md for authorship/provenance.
LANGID_SAMPLE_DIR = _osp.join(
    _osp.dirname(_osp.dirname(_osp.abspath(__file__))),
    "data", "langid_sample",
)


def load_langid_corpus(path: str) -> dict[str, list[str]]:
    """Read a one-file-per-language seed directory into the
    ``{lang: [sentences]}`` shape :func:`train_langid` and
    :func:`langid_eval` take: every ``*.txt`` file's stem is the
    label; one sentence per line; blank lines and ``#`` comments
    skipped; text lowercased (the featurizer's authorship rule, so a
    corpus with original casing trains identically to authored seeds).

    Driver-side by design: seed corpora for an NB char-n-gram model
    are small (the MODEL is labels × seed-vocabulary — it must stay
    broadcastable), so plain file reads are the right tool. For seeds
    living on a cluster filesystem, read them with ``spark.read.text``
    and pass the dict to ``train_langid(seeds=...)`` yourself."""
    import os

    out: dict[str, list[str]] = {}
    for name in sorted(os.listdir(path)):
        if not name.endswith(".txt"):
            continue
        with open(os.path.join(path, name), encoding="utf-8") as f:
            lines = [
                ln.strip().lower()
                for ln in f
                if ln.strip() and not ln.lstrip().startswith("#")
            ]
        if lines:
            out[name[: -len(".txt")]] = lines
    if not out:
        raise ValueError(f"no *.txt language files found under {path!r}")
    return out


def train_langid_from_dir(spark, path: str, **train_kw):
    """The public-corpus training recipe: point at a directory of
    ``{lang}.txt`` files (UDHR translations, a Wikipedia sample per
    language, or the checked-in :data:`LANGID_SAMPLE_DIR`/train) and
    get a scoring-ready NB model. Pair it with
    ``langid_eval(heldout=load_langid_corpus(<heldout dir>), model=m)``
    as the acceptance gate — the regression test runs exactly that
    over the checked-in 28-language sample."""
    return train_langid(spark, seeds=load_langid_corpus(path), **train_kw)


def language_id(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    strategy: str = "ngram",
    model=None,
) -> DataFrame:
    """Per-doc language prediction → ``(id, predicted_lang)``.

    ``strategy="ngram"`` (default): the char-n-gram Naive Bayes
    identifier (``model`` defaults to :func:`train_langid_from_dir`
    on the packaged 28-language / 9-script sample corpus,
    :data:`LANGID_SAMPLE_DIR`; measured on its held-out split: macro
    accuracy 0.9955, worst cell da→de) — sees every script, including
    unsegmented Chinese/Japanese, because features are characters,
    not words.  Docs with no features (NULL/empty/whitespace-only)
    → ``und``.  Pass ``model=train_langid(spark)`` for the small
    authored 12-language seed model, or train on your own corpus with
    :func:`train_langid_from_dir`.

    ``strategy="stopword"``: the explicit opt-in fast path — a
    5-language whole-token stopword gate over whitespace words.  It is
    structurally blind to unsegmented scripts (zh/ja text without
    spaces scores 0 → ``und``), so it is NOT the default; use it only
    as a cheap pre-gate on corpora known to be space-segmented.
    """
    if strategy == "stopword":
        return df.select(
            F.col(id_col).alias("id"),
            predicted_language(text_col).alias("predicted_lang"),
        )
    if strategy != "ngram":
        raise ValueError(
            f"strategy must be 'stopword' or 'ngram', got {strategy!r}"
        )
    from sparvi_core_spark.operators.classify import classify_nb

    if model is None:
        # the packaged 28-language corpus (round 11; was the authored
        # 12-language LANGID_SEEDS) — a user who doesn't read the docs
        # now gets all nine scripts instead of `und` past the big 12
        model = train_langid_from_dir(
            df.sparkSession, _osp.join(LANGID_SAMPLE_DIR, "train")
        )
    # round-4 scores before the argmax (the cross-engine float rule:
    # libm/summation-order drift on long log-sums must not flip ties)
    preds = classify_nb(
        df, model, id_col=id_col, text_col=text_col,
        with_tokens=True, round_to=4,
    )
    return preds.select(
        F.col(id_col).alias("id"),
        F.when(F.col("n_tokens") == 0, F.lit("und"))
        .otherwise(F.col("label"))
        .alias("predicted_lang"),
    )


def langid_confusion(
    spark,
    heldout: dict[str, list[str]] | None = None,
    model=None,
) -> DataFrame:
    """Confusion matrix of the ngram language identifier over a
    labeled held-out corpus → ``(true_lang, predicted_lang, n)``.
    ``heldout`` defaults to the built-in :data:`LANGID_HELDOUT`
    (disjoint from the training seeds, weighted toward the close
    pairs pt/es, nl/de, es/it); pass your own ``{lang: [sentences]}``
    to evaluate a production seed set. The eval corpus is tiny by
    design — this runs in seconds and is the acceptance bar for any
    seed or featurizer change (see ``langid_eval`` for the scalar
    summary and the regression test that pins it)."""
    heldout = LANGID_HELDOUT if heldout is None else heldout
    rows = [
        (i, lang, s)
        for i, (lang, s) in enumerate(
            (lang, s) for lang in sorted(heldout) for s in heldout[lang]
        )
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, true_lang string, text string"
    )
    preds = language_id(df, strategy="ngram", model=model)
    return (
        df.select(F.col("doc_id").alias("id"), "true_lang")
        .join(preds, "id")
        .groupBy("true_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("true_lang", "predicted_lang")
    )


def langid_eval(
    spark,
    heldout: dict[str, list[str]] | None = None,
    model=None,
) -> dict:
    """Scalar summary of :func:`langid_confusion`:
    ``{"macro_accuracy", "micro_accuracy", "n", "per_lang": {lang:
    accuracy}, "confusions": [(true, predicted, n), ...]}`` (only
    off-diagonal cells listed in ``confusions``). Macro = unweighted
    mean of per-language accuracy — the number the regression test
    pins, so a seed change that silently breaks one language cannot
    hide behind the others."""
    cells = langid_confusion(spark, heldout, model).collect()
    per_lang_total: dict[str, int] = {}
    per_lang_hit: dict[str, int] = {}
    confusions = []
    for r in cells:
        t, p, n = r["true_lang"], r["predicted_lang"], int(r["n"])
        per_lang_total[t] = per_lang_total.get(t, 0) + n
        if t == p:
            per_lang_hit[t] = per_lang_hit.get(t, 0) + n
        else:
            confusions.append((t, p, n))
    per_lang = {
        t: round(per_lang_hit.get(t, 0) / per_lang_total[t], 4)
        for t in sorted(per_lang_total)
    }
    n = sum(per_lang_total.values())
    return {
        "macro_accuracy": round(
            sum(per_lang.values()) / len(per_lang), 4
        ) if per_lang else 0.0,
        "micro_accuracy": round(
            sum(per_lang_hit.values()) / n, 4
        ) if n else 0.0,
        "n": n,
        "per_lang": per_lang,
        "confusions": sorted(confusions),
    }


def vocab_coverage(
    df: DataFrame,
    k_values: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-coverage curve for vocabulary sizing: for each ``k``, what
    fraction of ALL token occurrences the ``k`` most frequent terms
    cover → (k, vocab_terms, covered_tokens, total_tokens, coverage).
    The standard question before fixing a tokenizer vocab ("does 32k
    cover 99.5%?"). ``vocab_terms`` ≤ k when the corpus has fewer
    distinct terms.

    Scale shape: term counts are one explode + map-side-combined
    groupBy (vocab-sized output); the top-``max(k)`` selection is
    ``orderBy(desc).limit`` — Catalyst plans TakeOrderedAndProject
    (per-partition heaps, merge of k×partitions rows), NEVER a full
    vocab sort; the cumulative sum then runs over a k-bounded frame
    (one small task), and the corpus total rides a broadcast 1-row agg.
    Driver/merge memory is O(max(k)) — fine for real vocab sizes
    (≤ ~1M); ties broken by term for cross-engine determinism.
    """
    if not k_values or any(k < 1 for k in k_values):
        raise ValueError(f"k_values must be positive ints, got {k_values}")
    ks = sorted(set(int(k) for k in k_values))
    toks = _tokens(text_col)
    counts = (
        df.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").alias("total_tokens"))
    top = counts.orderBy(F.desc("n"), F.asc("term")).limit(ks[-1])
    w = Window.orderBy(F.desc("n"), F.asc("term")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = top.select(
        F.row_number().over(w).alias("rank"), F.sum("n").over(w).alias("cum")
    )
    k_df = df.sparkSession.createDataFrame([(k,) for k in ks], "k int")
    # per k: the largest rank ≤ k (vocab may be smaller than k)
    per_k = (
        F.broadcast(k_df)
        .join(ranked, ranked["rank"] <= k_df["k"])
        .groupBy("k")
        .agg(
            F.max("rank").alias("vocab_terms"),
            F.max("cum").alias("covered_tokens"),
        )
    )
    return (
        per_k.crossJoin(F.broadcast(total))
        .select(
            "k",
            "vocab_terms",
            "covered_tokens",
            "total_tokens",
            F.round(
                F.col("covered_tokens") / F.col("total_tokens"), 6
            ).alias("coverage"),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# Gopher / MassiveText quality rules
# ---------------------------------------------------------------------------

# the 8 "must contain at least 2" words from the MassiveText filter
GOPHER_REQUIRED_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
# line-leading bullet glyphs (the published rule names the bullet
# point; ASCII list markers are included because plain-text corpora
# render bullets as - or *)
GOPHER_BULLETS = ["•", "‣", "▪", "-", "*"]


def gopher_quality_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.10,
    max_bullet_line_frac: float = 0.10,
    max_ellipsis_line_frac: float = 0.30,
    min_alpha_word_frac: float = 0.80,
    min_required_words: int = 2,
) -> DataFrame:
    """The named document-level quality rules of the Gopher /
    MassiveText cleaning recipe (Rae et al. 2021, Table A1 — also the
    rule set RefinedWeb/Dolma reuse), as one map-only projection:
    per-rule raw statistics, per-rule booleans, and the AND-composed
    ``passes_gopher``. Defaults are the published thresholds;
    every one is a keyword so corpora can re-tune without forking.

    Rules (ok_* True = document survives that rule):

    - ``ok_word_count``: whitespace-word count in [min_words,
      max_words].
    - ``ok_mean_word_len``: mean word length in [3, 10].
    - ``ok_symbol_ratio``: (# of ``#`` chars + non-overlapping ``...``
      or ``…`` occurrences) / words ≤ 0.1.
    - ``ok_bullet_lines``: fraction of non-empty lines starting with a
      bullet glyph ≤ 0.1 (the published "90% of lines must not start
      with a bullet").
    - ``ok_ellipsis_lines``: fraction of non-empty lines ending with
      ``...`` or ``…`` ≤ 0.3.
    - ``ok_alpha_words``: fraction of words containing ≥1 ASCII letter
      ≥ 0.8 (script-specific corpora should lower this).
    - ``ok_required_words``: ≥2 distinct hits among the 8 required
      English words (exact lowercase token match). English-specific by
      construction, as published.

    The within-document REPETITION rules of the same table (duplicate
    line / top-n-gram character fractions) live in
    :func:`repetition_stats` — they need per-doc grouping, so keeping
    them separate keeps THIS operator shuffle-free; join on ``id`` and
    threshold to compose the full filter.

    NULL text propagates NULL stats and flags — under
    ``.filter("passes_gopher")`` a NULL never survives (SQL three-
    valued logic), which is the right filter behaviour; count NULLs
    separately if they need their own report line.

    Scale shape: pure codegen expressions over two splits (words,
    lines) — no shuffle, no Python, no join; cost is one corpus scan.
    Fractions are rounded to 4 (the cross-engine float rule), and the
    thresholds are applied to the ROUNDED values so the booleans are
    exactly reproducible from the emitted stats.
    """
    text = F.col(text_col)
    words = _tokens(text_col)
    n_words = F.size(words)
    wd = F.greatest(n_words, F.lit(1))
    mean_wl = F.round(
        F.aggregate(words, F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w))
        / wd,
        4,
    )
    hashes = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    # both ASCII '...' and U+2026 '…' count (matching the line rule below)
    ellipses_doc = F.size(
        F.regexp_extract_all(text, F.lit(r"\.\.\.|…"), F.lit(0))
    )
    symbol_ratio = F.round((hashes + ellipses_doc) / wd, 4)

    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    n_lines = F.size(lines)
    ld = F.greatest(n_lines, F.lit(1))
    bullets = F.array(*[F.lit(b) for b in GOPHER_BULLETS])
    bullet_lines = F.size(
        F.filter(lines, lambda x: F.array_contains(bullets, F.substring(x, 1, 1)))
    )
    ellipsis_lines = F.size(
        F.filter(lines, lambda x: x.endswith("...") | x.endswith("…"))
    )
    bullet_frac = F.round(bullet_lines / ld, 4)
    ellipsis_frac = F.round(ellipsis_lines / ld, 4)

    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    alpha_frac = F.round(alpha_words / wd, 4)

    required = F.array(*[F.lit(w) for w in GOPHER_REQUIRED_WORDS])
    req_hits = F.size(
        F.array_intersect(F.transform(words, F.lower), required)
    )

    stats = {
        "n_words": n_words.cast("bigint"),
        "mean_word_len": mean_wl,
        "symbol_word_ratio": symbol_ratio,
        "bullet_line_frac": bullet_frac,
        "ellipsis_line_frac": ellipsis_frac,
        "alpha_word_frac": alpha_frac,
        "required_word_hits": req_hits.cast("bigint"),
    }
    flags = {
        "ok_word_count": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "ok_mean_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "ok_symbol_ratio": F.col("symbol_word_ratio") <= max_symbol_ratio,
        "ok_bullet_lines": F.col("bullet_line_frac") <= max_bullet_line_frac,
        "ok_ellipsis_lines": F.col("ellipsis_line_frac")
        <= max_ellipsis_line_frac,
        "ok_alpha_words": F.col("alpha_word_frac") >= min_alpha_word_frac,
        "ok_required_words": F.col("required_word_hits")
        >= min_required_words,
    }
    base = df.select(
        F.col(id_col).alias("id"),
        *[c.alias(name) for name, c in stats.items()],
    ).withColumns(flags)
    passes = None
    for name in flags:
        passes = F.col(name) if passes is None else passes & F.col(name)
    return base.withColumn("passes_gopher", passes)


# the published MassiveText repetition thresholds (Rae et al. 2021,
# Table A1): max allowed fraction per signal
GOPHER_REPETITION_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}


def _gopher_repetition_kernel(id_col: str, text_col: str):
    """mapInPandas kernel: per-document integer repetition statistics
    for all 11 Gopher granularities, computed entirely within the
    task — no explode, no shuffle. Only INTEGER counts/char-masses
    leave Python; every ratio, rounding and threshold stays in the
    JVM expressions of :func:`gopher_repetition_flags`, so float
    semantics are untouched.

    Exact Spark-semantics replication, verified empirically:
    ``_tokens`` splits on the Java-ASCII ``\\s`` class
    ``[ \\t\\n\\x0b\\f\\r]+`` with empties dropped; line/para units
    split on the literal separator, trim SPACES ONLY (``F.trim``
    trims 0x20, not tabs/newlines), drop empties. Gram identity is a
    64-bit mixed rolling hash over per-token hashes — the same
    ~2⁻⁶⁴-collision exactness class as the previous
    ``xxhash64``-chain (and MinHash/md5 operators); all other
    arithmetic is exact integers.
    """
    import re

    import numpy as np
    import pandas as pd

    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    mix = np.uint64(0x9E3779B97F4A7C15)
    gram_ns = range(2, 11)
    unit_stats = (
        "occ", "dup_occ", "dup_excess_chars", "all_chars",
    )
    cols = ["id", "__chars", "__isnull"]  # output name per declared schema
    for u in ("line", "para"):
        cols += [f"{u}_{s}" for s in unit_stats]
    for n in (2, 3, 4):
        cols += [f"g{n}_top_c", f"g{n}_top_chars"]
    for n in range(5, 11):
        cols.append(f"g{n}_dup_all_chars")

    def _unit_stats(units):
        occ = len(units)
        counts: dict[str, int] = {}
        for u in units:
            counts[u] = counts.get(u, 0) + 1
        dup_occ = occ - len(counts)
        dup_excess = 0
        all_chars = 0
        for u, c in counts.items():
            ln = len(u)
            all_chars += c * ln
            dup_excess += (c - 1) * ln
        return occ, dup_occ, dup_excess, all_chars

    def fn(batches):
        err = np.seterr(over="ignore")  # uint64 rolling hash wraps by design
        try:
            for pdf in batches:
                rows = []
                for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                    rec = [doc_id] + [0] * (len(cols) - 1)
                    if text is None:
                        rec[2] = 1  # __isnull: NULL-text marker
                    else:
                        rec[1] = len(text)  # __chars (codepoints)
                        # line / paragraph units: literal split, trim
                        # spaces only, drop empties (F.trim semantics)
                        for base, sep in ((3, "\n"), (7, "\n\n")):
                            units = [
                                u.strip(" ") for u in text.split(sep)
                            ]
                            units = [u for u in units if u != ""]
                            rec[base:base + 4] = _unit_stats(units)
                        toks = [t for t in ws.split(text) if t]
                        T = len(toks)
                        if T >= 2:
                            tl = np.fromiter(
                                (len(t) for t in toks), np.int64, count=T
                            )
                            th = np.fromiter(
                                (hash(t) for t in toks), np.int64, count=T
                            ).astype(np.uint64)
                            h, ln = th, tl
                            for n in gram_ns:
                                m = T - n + 1
                                if m <= 0:
                                    break
                                h = (h[:m] * mix) ^ th[n - 1:]
                                ln = ln[:m] + tl[n - 1:] + 1
                                uniq, first, cnt = np.unique(
                                    h, return_index=True, return_counts=True
                                )
                                glen = ln[first]
                                if n <= 4:
                                    chars = cnt * glen
                                    i = np.lexsort((chars, cnt))[-1]
                                    o = 11 + (n - 2) * 2
                                    rec[o] = int(cnt[i])
                                    rec[o + 1] = int(chars[i])
                                else:
                                    d = cnt > 1
                                    rec[17 + (n - 5)] = int(
                                        (cnt[d] * glen[d]).sum()
                                    )
                    rows.append(rec)
                yield pd.DataFrame(rows, columns=cols)
        finally:
            np.seterr(**err)

    return fn


def gopher_repetition_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """The COMPLETE within-document repetition table of the Gopher /
    MassiveText filter (Rae et al. 2021, Table A1) — the companion to
    :func:`gopher_quality_flags` (which covers the non-repetition
    rows): duplicate line / paragraph fractions (by unit count and by
    character mass), top-2/3/4-gram character fractions, and
    duplicate-5..10-gram character fractions, each with its published
    threshold flag and the AND-composed ``passes_repetition``.

    Contracts (deterministic, oracle-reproducible):

    - lines split on ``\\n``, paragraphs on ``\\n\\n``; units are
      trimmed and empties dropped.
    - ``dup_*_frac``: unit occurrences beyond the first occurrence of
      their text, over all unit occurrences. ``dup_*_char_frac``: the
      same, weighted by unit length.
    - ``top_{n}gram_char_frac``: occurrences×length of the most
      frequent word n-gram over total text chars, capped at 1.0 (ties
      break to the gram with the larger character mass, then
      lexicographically greatest — deterministic); 0 when no n-gram
      occurs twice (a gram appearing once is not repetition — the
      literal published wording would fail every short document of
      unique words on its longest bigram).
    - ``dup_{n}gram_char_frac``: characters across ALL occurrences of
      n-grams appearing more than once, over total text chars, capped
      at 1.0. Overlapping occurrences are NOT position-deduplicated —
      the standard approximation (exact position-union needs per-doc
      interval merging; every open reimplementation of this filter
      makes the same trade), stated here so the number is never read
      as the exact union.
    - docs with no units/grams at a granularity score 0 there (a
      2-word doc can't repeat 5-grams); NULL text → NULL flags.
    - fractions rounded to 4; flags applied to the ROUNDED values.

    ``thresholds`` overrides any subset of
    ``GOPHER_REPETITION_THRESHOLDS`` keys.

    Scale shape — ONE corpus scan, ZERO shuffles, for all 11
    granularities (round 11): every statistic here is per-document, so
    no exchange is fundamentally required; an Arrow-batched
    ``mapInPandas`` kernel (:func:`_gopher_repetition_kernel`) reduces
    each document to its 20 integer counts/char-masses in the task —
    rolling-hash gram identity over numpy arrays, Counter-folded
    line/para units — and ONLY those integers cross the Python
    boundary back. Every ratio, rounding and threshold stays in JVM
    expressions, so float semantics are identical to the previous
    all-expression form. History of this operator's shapes, measured
    at sf0.1: 13 separate queries rescan the corpus 13×; a map-only
    higher-order-expression formulation (per-row ``array_sort`` +
    adjacent-duplicate folds) measured 79 s — interpreted per-row
    folds lose badly outside codegen; one tagged explode of gram
    STRINGS through a (doc, granularity, hash, len) hash aggregate +
    pivot measured 16-18 s (rounds 7-10); chaining per-token hashes
    instead of building gram strings cut that to 6.3 s; this kernel
    removes the explode, both aggregates, the pivot and the exchange
    entirely — 2.5 s, and the per-doc work parallelizes embarrassingly
    at any scale. Gram identity is 64-bit hashed — two distinct grams
    colliding within a document is the same ~2⁻⁶⁴ exactness class as
    the previous ``xxhash64`` keys (and the MinHash/md5 operators);
    byte-identical output pinned on sf0.01 + edge fixtures vs the
    expression form.
    """
    th = dict(GOPHER_REPETITION_THRESHOLDS)
    if thresholds:
        unknown = set(thresholds) - set(th)
        if unknown:
            raise ValueError(f"unknown threshold keys: {sorted(unknown)}")
        th.update(thresholds)

    from sparvi_core_spark.plans.fanout import fan_out_compact

    # the kernel runs before any shuffle — fan a compact corpus out so
    # it parallelizes (no-op at scale)
    src = fan_out_compact(df).select(id_col, text_col)
    id_ddl = df.schema[id_col].dataType.simpleString()
    schema = (
        f"id {id_ddl}, __chars bigint, __isnull int, "
        + ", ".join(
            f"{u}_{s} bigint"
            for u in ("line", "para")
            for s in ("occ", "dup_occ", "dup_excess_chars", "all_chars")
        )
        + ", "
        + ", ".join(
            f"g{n}_top_c bigint, g{n}_top_chars bigint" for n in (2, 3, 4)
        )
        + ", "
        + ", ".join(f"g{n}_dup_all_chars bigint" for n in range(5, 11))
    )
    j = src.mapInPandas(
        _gopher_repetition_kernel(id_col, text_col), schema
    )

    def _ratio(num: F.Column, den: F.Column) -> F.Column:
        return F.round(
            F.coalesce(num / F.greatest(den, F.lit(1)), F.lit(0.0)), 4
        )

    stats: dict[str, F.Column] = {}
    for unit, name in (("line", "line"), ("para", "para")):
        stats[f"dup_{name}_frac"] = _ratio(
            F.col(f"{unit}_dup_occ"), F.col(f"{unit}_occ")
        )
        stats[f"dup_{name}_char_frac"] = _ratio(
            F.col(f"{unit}_dup_excess_chars"), F.col(f"{unit}_all_chars")
        )
    for n in (2, 3, 4):
        # a gram occurring ONCE is not repetition: the fraction is 0
        # unless the top gram repeats (otherwise every short document
        # of unique words fails the 0.2 gate on its longest bigram)
        stats[f"top_{n}gram_char_frac"] = F.least(
            F.when(
                F.col(f"g{n}_top_c") >= 2,
                _ratio(F.col(f"g{n}_top_chars"), F.col("__chars")),
            ).otherwise(F.lit(0.0)),
            F.lit(1.0),
        )
    for n in range(5, 11):
        stats[f"dup_{n}gram_char_frac"] = F.least(
            _ratio(F.col(f"g{n}_dup_all_chars"), F.col("__chars")),
            F.lit(1.0),
        )

    # NULL text must stay NULL (the zero-fill above is for "no units at
    # this granularity", not "no document") — __isnull marks NULL text
    base = j.select(
        "id",
        *[
            F.when(F.col("__isnull") == 1, F.lit(None).cast("double"))
            .otherwise(c)
            .alias(name)
            for name, c in stats.items()
        ],
    )
    flags = {
        f"ok_{name}": F.col(name) <= th[name] for name in stats
    }
    out = base.withColumns(flags)
    passes = None
    for name in flags:
        passes = F.col(name) if passes is None else passes & F.col(name)
    return out.withColumn("passes_repetition", passes)


# ---------------------------------------------------------------------------
# C4 cleaning rules
# ---------------------------------------------------------------------------

# terminal punctuation accepted by the C4 line rule (the T5 paper's
# "terminal punctuation mark" = . ! ? plus a closing quote after one)
C4_TERMINALS = (".", "!", "?", '."', '!"', '?"', ".'", "!'", "?'")


def c4_clean(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    banned_substrings: tuple[str, ...] = ("lorem ipsum", "{"),
    banned_line_words: tuple[str, ...] = ("javascript",),
    badwords: list[str] | None = None,
) -> DataFrame:
    """The C4 cleaning recipe (Raffel et al. 2020, §2.2 — the filter
    that produced C4 from Common Crawl; the other canonical named
    pipeline next to :func:`gopher_quality_flags`), as one map-only
    projection:

    line level — a line survives iff it ends in a terminal punctuation
    mark (``C4_TERMINALS``), has ≥ ``min_words_per_line`` words, and
    contains none of ``banned_line_words`` (case-insensitive word
    match; the paper's "any line with the word Javascript");

    page level — ``ok_sentences``: ≥ ``min_sentences`` sentences
    (terminal-mark occurrences in the KEPT text, the paper's proxy);
    ``ok_banned``: the ORIGINAL (pre-line-filter) text contains none
    of ``banned_substrings`` (case-insensitive; the paper's
    "lorem ipsum" and "{" rules abort the whole page wherever the
    string appears, even on a line the line filter would drop);
    ``ok_badwords``: no word from ``badwords`` in the kept text (the
    published filter
    uses the "List of Dirty, Naughty …" list — that is a DATA file,
    so the default here is None = rule passes vacuously; pass the
    list to enable). ``passes_c4`` ANDs the three.

    Returns ``(id, text, n_lines_kept, n_lines_dropped, ok_sentences,
    ok_banned, ok_badwords, passes_c4)`` where ``text`` is the kept
    lines re-joined with ``\\n``. NULL text → NULL everything. Docs
    whose every line is dropped have ``text = ''`` and fail
    ``ok_sentences``.

    Pure codegen expressions (split/filter/array ops) — no shuffle,
    no Python, one corpus scan; every rule is a keyword so corpora
    re-tune without forking.
    """
    text = F.col(text_col)
    lines = F.transform(F.split(text, r"\n"), lambda x: F.trim(x))
    lines = F.filter(lines, lambda x: x != "")

    def _line_ok(x: F.Column) -> F.Column:
        ends = None
        for t in C4_TERMINALS:
            e = x.endswith(t)
            ends = e if ends is None else (ends | e)
        words = F.size(F.filter(F.split(x, r"\s+"), lambda w: w != ""))
        ok = ends & (words >= min_words_per_line)
        if banned_line_words:
            # "contains the word" = whitespace-delimited token equality
            # on the lowered line (documented contract; punctuation-
            # attached variants are not matched — same trade the
            # published filter's word lists make)
            low_toks = F.filter(
                F.split(F.lower(x), r"\s+"), lambda t: t != ""
            )
            banned = F.array(
                *[F.lit(w.lower()) for w in banned_line_words]
            )
            ok = ok & (F.size(F.array_intersect(low_toks, banned)) == 0)
        return ok

    kept = F.filter(lines, _line_ok)
    cleaned = F.array_join(kept, "\n")
    n_kept = F.size(kept)
    n_dropped = F.size(lines) - n_kept

    sentences = F.size(
        F.regexp_extract_all(cleaned, F.lit(r"[.!?]"), F.lit(0))
    )
    ok_sent = sentences >= min_sentences
    low_clean = F.lower(cleaned)
    # banned substrings abort the page wherever they appear in the
    # ORIGINAL text (as published) — a brace on a dropped line still kills
    low_orig = F.lower(text)
    ok_banned = None
    for s in banned_substrings:
        c = ~low_orig.contains(s.lower())
        ok_banned = c if ok_banned is None else (ok_banned & c)
    if ok_banned is None:
        ok_banned = F.lit(True)
    if badwords:
        bad = F.array(*[F.lit(w.lower()) for w in badwords])
        toks = F.filter(
            F.split(low_clean, r"\s+"), lambda t: t != ""
        )
        ok_bad = F.size(F.array_intersect(toks, bad)) == 0
    else:
        ok_bad = F.lit(True)

    null_doc = text.isNull()

    def _guard(c: F.Column, typ: str) -> F.Column:
        return F.when(null_doc, F.lit(None).cast(typ)).otherwise(c)

    return df.select(
        F.col(id_col).alias("id"),
        _guard(cleaned, "string").alias("text"),
        _guard(n_kept.cast("bigint"), "bigint").alias("n_lines_kept"),
        _guard(n_dropped.cast("bigint"), "bigint").alias("n_lines_dropped"),
        _guard(ok_sent, "boolean").alias("ok_sentences"),
        _guard(ok_banned, "boolean").alias("ok_banned"),
        _guard(ok_bad, "boolean").alias("ok_badwords"),
        _guard(ok_sent & ok_banned & ok_bad, "boolean").alias("passes_c4"),
    )
