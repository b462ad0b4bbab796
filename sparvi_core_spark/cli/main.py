"""CLI — same command surface as the reference (`sparvi` entry point,
reference: sparvi/cli/main.py:18-41,79): ``profile``, ``validate``,
``info``, ``test-connection``. The connection string becomes a data
*source*: a directory of parquet files (each registered as a temp view)
or a single table file.

Three profile formats (table/json/minimal, mirroring
cli/profile.py:107-113); ``table`` renders aligned ASCII tables (the
reference uses rich-library tables, cli/profile.py:122-455 — same
content, dependency-free markup).
"""

from __future__ import annotations

import json
import platform
import re
import sys

import click

import sparvi_core_spark
from sparvi_core_spark import (
    export_rules,
    get_default_validations,
    get_spark,
    load_rules_from_file,
    profile_table,
    register_views,
    run_validations,
)
from sparvi_core_spark.session import read_table


def _session(cpus: str | None = None):
    s = get_spark(
        app_name="sparvi-cli",
        master=f"local[{cpus}]" if cpus else None,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def _resolve_source(source: str | None, table: str | None) -> tuple[str, str]:
    """Apply the reference's connection-from-env fallback (reference:
    ``sparvi/utils/env.py:88-112``, ``cli/profile.py:19-44``): with only
    one positional argument it is the TABLE and the source comes from
    ``SPARVI_SOURCE`` (or ``DATABASE_URL``)."""
    import os

    if source is not None and table is None:
        source, table = None, source
    if source is None:
        source = os.environ.get("SPARVI_SOURCE") or os.environ.get("DATABASE_URL")
    if not source:
        raise click.UsageError(
            "No source given and neither SPARVI_SOURCE nor DATABASE_URL is set"
        )
    if not table:
        raise click.UsageError("Missing argument 'TABLE'")
    return source, table


def _register_source(spark, source: str, table: str | None) -> str | None:
    """Register the source and return the temp-view name to query.

    JDBC tables are usually schema-qualified (``schema.orders``) —
    a dot is invalid in a temp-view name, so the view gets a sanitized
    name while the ORIGINAL name goes into the JDBC ``dbtable`` option.
    """
    import os

    if source.startswith("jdbc:"):
        if table:
            from sparvi_core_spark.session import read_jdbc

            view = re.sub(r"[^0-9A-Za-z_]", "_", table)
            read_jdbc(spark, source, table).createOrReplaceTempView(view)
            return view
    elif os.path.isdir(source) and not source.rstrip("/").endswith(".parquet"):
        register_views(spark, source)
    elif table:
        read_table(spark, source).createOrReplaceTempView(table)
    return table


# Severity → ANSI color, mirroring the reference's rich-library severity
# styling (reference: sparvi/cli/profile.py:122-455) without the rich
# dependency. click strips styles automatically when stdout is not a
# terminal, so piped/captured output stays plain.
_SEVERITY_COLORS = {
    "high": "red", "error": "red", "critical": "red",
    "medium": "yellow", "warning": "yellow",
    "low": "cyan", "info": "cyan",
}


def _sev(severity) -> str:
    return click.style(
        str(severity),
        fg=_SEVERITY_COLORS.get(str(severity).lower(), "white"),
        bold=True,
    )


def _header(text: str) -> str:
    return click.style(text, bold=True)


_ANSI_RE = re.compile(r"\x1b\[[0-9;]*m")


def _render_table(headers: list[str], rows: list[list]) -> str:
    """Dependency-free aligned table (the reference renders these
    sections with rich tables; content is identical). Widths are
    measured on ANSI-stripped text so styled cells (severity colors)
    keep the columns aligned."""
    cells = [["" if v is None else str(v) for v in r] for r in rows]

    def vis(s: str) -> int:
        return len(_ANSI_RE.sub("", s))

    widths = [
        max([len(h)] + [vis(r[i]) for r in cells]) for i, h in enumerate(headers)
    ]
    rule = "+" + "+".join("-" * (w + 2) for w in widths) + "+"

    def fmt(vals):
        return (
            "| "
            + " | ".join(v + " " * (w - vis(v)) for v, w in zip(vals, widths))
            + " |"
        )

    lines = [rule, fmt(headers), rule]
    lines += [fmt(r) for r in cells]
    lines.append(rule)
    return "\n".join(lines)


@click.group()
@click.version_option(version=sparvi_core_spark.__version__, prog_name="sparvi-spark")
def cli():
    """sparvi-core-spark: data profiling and validation on PySpark."""


@cli.command()
@click.argument("source", required=False)
@click.argument("table", required=False)
@click.option("--format", "fmt", default="table", type=click.Choice(["table", "json", "minimal"]))
@click.option("--output", default=None, help="Write profile JSON to this path")
@click.option("--compare", default=None, help="Historical profile JSON for anomaly detection")
@click.option("--history-dir", default=None,
              help="Snapshot store: compare vs last run, populate trends, append this run")
@click.option("--no-samples", is_flag=True, default=False)
@click.option("--approx", is_flag=True, default=False,
              help="HLL distincts + sketch percentiles (the large-scale mode)")
@click.option("--sample-fraction", default=None, type=float,
              help="Profile a Bernoulli sample instead of the full table; "
                   "estimates come with 95%% bounds (profiler.approx)")
@click.option("--cpus", default=None, help="local[N] cores")
def profile(source, table, fmt, output, compare, history_dir, no_samples,
            approx, sample_fraction, cpus):
    """Profile TABLE from SOURCE (a directory of parquet files, a file
    path, or a ``jdbc:`` URL). With one argument, SOURCE falls back to
    $SPARVI_SOURCE / $DATABASE_URL."""
    source, table = _resolve_source(source, table)
    spark = _session(cpus)
    table = _register_source(spark, source, table)
    if sample_fraction is not None:
        from sparvi_core_spark.profiler.approx import sample_profile

        prof = sample_profile(spark.table(table), fraction=sample_fraction)
        prof = {"table": table, **prof}
        if output:
            with open(output, "w") as f:
                json.dump(prof, f, indent=2, default=str)
            click.echo(f"Profile written to {output}")
        if fmt == "json":
            click.echo(json.dumps(prof, indent=2, default=str))
            return
        click.echo(f"Table: {table} (sampled {sample_fraction:g})")
        click.echo(
            f"Row count: ~{prof['row_count_est']} "
            f"(+/- {prof['row_count_ci']}, from {prof['sampled_rows']} rows)"
        )
        if fmt == "minimal":
            return
        click.echo(_header("\nColumn estimates (95% bounds):"))
        click.echo(_render_table(
            ["column", "null frac", "+/-", "mean", "+/-", "stdev",
             "distinct seen (lower bound)"],
            [
                [c, s["null_fraction"], s["null_fraction_ci"],
                 s.get("mean"), s.get("mean_ci"), s.get("stddev"),
                 s["distinct_seen"]]
                for c, s in prof["columns"].items()
            ],
        ))
        return
    historical = None
    if compare:
        with open(compare) as f:
            historical = json.load(f)
    config = (
        {"profiling": {"approx_distinct": True, "approx_percentiles": True}}
        if approx
        else None
    )
    if history_dir:
        from sparvi_core_spark.profiler.history import profile_with_history

        prof = profile_with_history(
            spark, table, history_dir,
            include_samples=not no_samples, config=config,
        )
    else:
        prof = profile_table(
            spark, table, historical_data=historical,
            include_samples=not no_samples, config=config,
        )
    if output:
        with open(output, "w") as f:
            json.dump(prof, f, indent=2, default=str)
        click.echo(f"Profile written to {output}")
    if fmt == "json":
        click.echo(json.dumps(prof, indent=2, default=str))
        return
    click.echo(f"Table: {prof['table']}")
    click.echo(f"Row count: {prof['row_count']}")
    dup = prof["duplicate_count"]
    click.echo(
        "Duplicate row groups: "
        + ("(skipped: wide table)" if dup is None else str(dup))
    )
    if fmt == "minimal":
        return
    click.echo(_header("\nCompleteness:"))
    click.echo(_render_table(
        ["column", "nulls", "null %", "distinct", "distinct %"],
        [
            [col, c["nulls"], c["null_percentage"],
             c["distinct_count"], c["distinct_percentage"]]
            for col, c in prof["completeness"].items()
        ],
    ))
    if prof["numeric_stats"]:
        click.echo(_header("\nNumeric stats:"))
        click.echo(_render_table(
            ["column", "min", "max", "avg", "stdev", "q1", "median", "q3"],
            [
                [col, s["min"], s["max"], s["avg"], s["stdev"],
                 s["q1"], s["median"], s["q3"]]
                for col, s in prof["numeric_stats"].items()
            ],
        ))
    if prof["text_length_stats"]:
        click.echo(_header("\nText length stats:"))
        click.echo(_render_table(
            ["column", "min len", "max len", "avg len"],
            [
                [col, s["min_length"], s["max_length"], s["avg_length"]]
                for col, s in prof["text_length_stats"].items()
            ],
        ))
    if prof["date_stats"]:
        click.echo(_header("\nDate stats:"))
        click.echo(_render_table(
            ["column", "min", "max", "range days"],
            [
                [col, s["min_date"], s["max_date"], s["date_range_days"]]
                for col, s in prof["date_stats"].items()
            ],
        ))
    if prof["frequent_values"]:
        click.echo(_header("\nMost frequent values:"))
        click.echo(_render_table(
            ["column", "value", "frequency", "%"],
            [
                [col, f"(skipped: {s['skipped']})", "", ""]
                if "skipped" in s
                else [col, repr(s["value"]), s["frequency"], s["percentage"]]
                for col, s in prof["frequent_values"].items()
            ],
        ))
    if prof.get("anomalies"):
        click.echo(_header("\nAnomalies:"))
        for a in prof["anomalies"]:
            click.echo(f"  [{_sev(a['severity'])}] {a['type']}: {a['description']}")
    if prof.get("schema_shifts"):
        click.echo(_header("\nSchema shifts:"))
        for s in prof["schema_shifts"]:
            click.echo(f"  [{_sev(s['severity'])}] {s['type']}: {s['description']}")
    rc_trend = (prof.get("trends") or {}).get("row_counts") or []
    if len(rc_trend) > 1:
        series = " -> ".join(str(x["value"]) for x in rc_trend[-10:])
        click.echo(f"\nRow-count trend ({len(rc_trend)} runs): {series}")


@cli.command()
@click.argument("source", required=False)
@click.argument("table", required=False)
@click.option("--rules", "rules_file", default=None, help="YAML/JSON rules file")
@click.option("--generate-defaults", is_flag=True, default=False)
@click.option("--save-defaults", default=None, help="Write generated rules to this path")
@click.option("--primary-key", multiple=True, help="PK column hint (repeatable)")
@click.option("--max-length", "max_length", multiple=True,
              help="Column length hint col=N (repeatable) — restores the "
                   "reference's VARCHAR(n) max-length rules")
@click.option("--output", default=None, help="Write results JSON to this path")
@click.option("--fail-on-error", is_flag=True, default=False)
@click.option("--cpus", default=None)
def validate(source, table, rules_file, generate_defaults, save_defaults,
             primary_key, max_length, output, fail_on_error, cpus):
    """Run validation rules for TABLE from SOURCE (path or jdbc: URL;
    SOURCE falls back to $SPARVI_SOURCE / $DATABASE_URL)."""
    source, table = _resolve_source(source, table)
    spark = _session(cpus)
    table = _register_source(spark, source, table)
    # parse/validate --max-length unconditionally: malformed specs are
    # rejected even when defaults are not generated, and hints that
    # would be silently ignored (rules came solely from --rules-file)
    # get an explicit warning instead
    length_hints = {}
    for spec in max_length:
        col, _, n = spec.partition("=")
        if not n.isdigit():
            raise click.UsageError(f"--max-length expects col=N, got {spec!r}")
        length_hints[col] = int(n)
    rules = []
    if rules_file:
        rules += load_rules_from_file(rules_file)
    if generate_defaults or not rules:
        generated = get_default_validations(
            spark, table, primary_keys=list(primary_key) or None,
            column_length_hints=length_hints or None,
        )
        click.echo(f"Generated {len(generated)} default validation rules")
        rules += generated
        if save_defaults:
            fmt = "json" if save_defaults.endswith(".json") else "yaml"
            export_rules(generated, save_defaults, fmt)
            click.echo(f"Default rules saved to {save_defaults}")
    elif length_hints:
        click.echo(
            "Warning: --max-length only applies to generated default rules; "
            "hints ignored because rules came from --rules-file "
            "(add --generate-defaults to apply them)",
            err=True,
        )
    results = run_validations(spark, rules)
    n_pass = sum(1 for r in results if r["is_valid"])
    n_fail = len(results) - n_pass
    for r in results:
        status = (click.style("PASS", fg="green") if r["is_valid"]
                  else click.style("FAIL", fg="red", bold=True))
        detail = (
            f"actual={r.get('actual_value')!r} expected={r.get('expected_value')!r}"
            if "error" not in r
            else f"error={r['error']}"
        )
        click.echo(f"[{status}] {r['rule_name']}: {detail}")
    click.echo(f"\n{n_pass} passed, {n_fail} failed of {len(results)} rules")
    if output:
        with open(output, "w") as f:
            json.dump(results, f, indent=2, default=str)
        click.echo(f"Results written to {output}")
    if fail_on_error and n_fail:
        sys.exit(1)


def _load_table_df(spark, source: str, table: str):
    """One table from one source as a DataFrame (no temp view — the
    drift command loads the SAME table name from TWO sources, so view
    names would collide)."""
    import os

    if source.startswith("jdbc:"):
        from sparvi_core_spark.session import read_jdbc

        return read_jdbc(spark, source, table)
    if os.path.isdir(source) and not source.rstrip("/").endswith(".parquet"):
        return read_table(spark, os.path.join(source, f"{table}.parquet"))
    return read_table(spark, source)


@cli.command()
@click.argument("source_ref")
@click.argument("source_cur")
@click.argument("table")
@click.option("--columns", multiple=True,
              help="Numeric columns to check (repeatable; default: all)")
@click.option("--bins", default=10, show_default=True,
              help="Reference-quantile bins")
@click.option("--threshold", default=0.25, show_default=True,
              help="PSI above this renders as high severity (0.1 = medium)")
@click.option("--format", "fmt", default="table",
              type=click.Choice(["table", "json"]))
@click.option("--approx", is_flag=True, default=False,
              help="GK-sketch quantile boundaries (the at-scale path)")
@click.option("--ks", "with_ks", is_flag=True, default=False,
              help="Also compute the binned two-sample KS statistic "
                   "(one extra boundary+scan pair per column)")
@click.option("--cpus", default=None, help="local[N] cores")
def drift(source_ref, source_cur, table, columns, bins, threshold, fmt,
          approx, with_ks, cpus):
    """Per-column PSI drift of TABLE between two snapshots.

    SOURCE_REF is the baseline (its quantiles define the bins),
    SOURCE_CUR the snapshot under test. Extension command — the
    reference declares drift detection but stubs it
    (profile_engine.py:437-443); this is the distribution-level
    check next to ``profile --compare``'s stat-level anomalies.
    """
    from sparvi_core_spark.functions.stats import ks_drift, psi_drift_report

    spark = _session(cpus)
    ref = _load_table_df(spark, source_ref, table)
    cur = _load_table_df(spark, source_cur, table)
    cols = list(columns) or None
    rows = [
        r.asDict()
        for r in psi_drift_report(
            ref, cur, columns=cols, bins=bins, approx=approx
        ).orderBy("column").collect()
    ]
    if with_ks:
        for r in rows:
            k = ks_drift(ref, cur, r["column"], bins=max(bins, 20),
                         approx=approx).first()
            r["ks"] = k["ks"] if k is not None else None
    if fmt == "json":
        click.echo(json.dumps(
            {"table": table, "bins": bins, "columns": rows}, default=str))
        return
    click.echo(_header(f"Distribution drift: {table} "
                       f"({len(rows)} columns, {bins} bins)"))

    def reading(psi):
        if psi >= threshold:
            return "high"
        return "medium" if psi >= 0.1 else "low"

    headers = ["column", "psi"] + (["ks"] if with_ks else []) + [
        "n_ref", "n_cur", "severity"]
    click.echo(_render_table(
        headers,
        [[r["column"], r["psi"]] + ([r["ks"]] if with_ks else []) + [
            r["n_ref"], r["n_cur"], _sev(reading(r["psi"]))] for r in rows],
    ))


@cli.command()
@click.argument("source_a")
@click.argument("source_b")
@click.argument("table")
@click.option("--columns", multiple=True,
              help="Columns to compare (default: all)")
@click.option("--lg-k", default=12, show_default=True,
              help="Theta sketch nominal entries = 2^lg_k "
                   "(exact below that; estimates with bounds above)")
@click.option("--format", "fmt", default="table",
              type=click.Choice(["table", "json"]))
@click.option("--cpus", default=None)
def overlap(source_a, source_b, table, columns, lg_k, fmt, cpus):
    """Per-column value-set overlap of TABLE between two snapshots:
    shared / only-A / only-B distinct counts and jaccard, via theta
    sketches (exact below 2^lg_k distincts — the O(sketch) corpus
    version diff; `operators.mixing.corpus_diff` is the full-shuffle
    exact twin). Extension command — no reference analog."""
    from sparvi_core_spark.profiler.incremental import (
        theta_overlap,
        theta_summary,
    )

    spark = _session(cpus)
    a = _load_table_df(spark, source_a, table)
    b = _load_table_df(spark, source_b, table)
    cols = list(columns) or None
    rows = [
        r.asDict()
        for r in theta_overlap(
            theta_summary(a, cols, lg_k=lg_k, batch_id="a"),
            theta_summary(b, cols, lg_k=lg_k, batch_id="b"),
        ).orderBy("column").collect()
    ]
    if fmt == "json":
        click.echo(json.dumps(
            {"table": table, "lg_k": lg_k, "columns": rows}, default=str))
        return
    click.echo(_header(f"Value-set overlap: {table} ({len(rows)} columns)"))
    click.echo(_render_table(
        ["column", "n_a", "n_b", "shared", "only_a", "only_b", "jaccard"],
        [[r["column"], round(r["n_a"]), round(r["n_b"]),
          round(r["n_intersection"]), round(r["n_only_a"]),
          round(r["n_only_b"]), round(r["jaccard"], 4)] for r in rows],
    ))


@cli.command()
@click.argument("source", required=False)
@click.argument("table", required=False)
@click.option("--text-col", default="text", help="Text column to analyze")
@click.option("--zipf-top", default=10_000, type=int,
              help="Head size for the Zipf rank-frequency fit")
@click.option("--format", "fmt", default="table",
              type=click.Choice(["table", "json"]))
@click.option("--cpus", default=None, help="local[N] cores")
def diversity(source, table, text_col, zipf_top, fmt, cpus):
    """Corpus lexical-health report for TABLE's TEXT-COL: type/token
    ratio, distinct-bigram ratio, token entropy, head concentration,
    Zipf slope. The before/after check around every filtering round.
    Extension command — no reference analog."""
    from sparvi_core_spark.operators.diversity import corpus_diversity

    spark = _session(cpus)
    source, table = _resolve_source(source, table)
    df = _load_table_df(spark, source, table)
    row = corpus_diversity(
        df, text_col=text_col, zipf_top=zipf_top
    ).first().asDict()
    if fmt == "json":
        click.echo(json.dumps({"table": table, **row}, default=str))
        return
    click.echo(_header(f"Corpus diversity: {table}.{text_col}"))
    click.echo(_render_table(
        ["metric", "value"],
        [[k, row[k]] for k in row],
    ))


@cli.command()
@click.argument("source", required=False)
@click.argument("table", required=False)
@click.option("--text-col", default="text", help="Text column to scan")
@click.option("--types", default=None,
              help="Comma-separated PII types (default: all)")
@click.option("--redact-to", default=None,
              help="Write the redacted table as parquet to this path")
@click.option("--format", "fmt", default="table",
              type=click.Choice(["table", "json"]))
@click.option("--cpus", default=None, help="local[N] cores")
def pii(source, table, text_col, types, redact_to, fmt, cpus):
    """PII scan of TABLE's TEXT-COL: per-type verified counts (card
    candidates Luhn-checked) and the docs-with-pii release gate;
    ``--redact-to`` additionally writes the table with every candidate
    replaced by a typed placeholder. Extension command — no reference
    analog."""
    from sparvi_core_spark.operators.pii import pii_summary, redact_pii

    spark = _session(cpus)
    source, table = _resolve_source(source, table)
    df = _load_table_df(spark, source, table)
    tlist = [t.strip() for t in types.split(",")] if types else None
    row = pii_summary(df, text_col=text_col, types=tlist).first().asDict()
    if redact_to:
        redact_pii(df, text_col=text_col, types=tlist).write.mode(
            "overwrite"
        ).parquet(redact_to)
        row["redacted_to"] = redact_to
    if fmt == "json":
        click.echo(json.dumps({"table": table, **row}, default=str))
        return
    click.echo(_header(f"PII scan: {table}.{text_col}"))
    click.echo(_render_table(
        ["metric", "value"],
        [[k, row[k]] for k in row],
    ))


@cli.command()
@click.argument("source", required=False)
@click.argument("table", required=False)
@click.option("--json-col", default="messages",
              help="Column holding the chat-message-list JSON")
@click.option("--id-col", default="doc_id")
@click.option("--last-role", default="assistant",
              help="Required closing role ('' disables the rule)")
@click.option("--render-to", default=None,
              help="Write VALID conversations rendered to training "
                   "text (id, text) as parquet to this path")
@click.option("--format", "fmt", default="table",
              type=click.Choice(["table", "json"]))
@click.option("--cpus", default=None, help="local[N] cores")
def chat(source, table, json_col, id_col, last_role, render_to, fmt, cpus):
    """SFT/chat corpus report for TABLE's JSON-COL (message lists):
    parse + per-rule validation attrition (roles, alternation,
    emptiness, closing role) in one pass; ``--render-to`` additionally
    writes the VALID conversations flattened to deterministic training
    text. Extension command — no reference analog."""
    from sparvi_core_spark.operators.conversations import (
        conversation_report,
        parse_conversations,
        render_conversations,
        validate_conversations,
    )

    spark = _session(cpus)
    source, table = _resolve_source(source, table)
    df = _load_table_df(spark, source, table)
    parsed = parse_conversations(df, json_col=json_col)
    flags = validate_conversations(
        parsed,
        id_col=id_col,
        last_role=last_role or None,
    )
    row = conversation_report(flags, id_col=id_col).first().asDict()
    if render_to:
        valid = parsed.join(
            flags.filter("valid").select(id_col), id_col
        )
        render_conversations(valid, id_col=id_col).write.mode(
            "overwrite"
        ).parquet(render_to)
        row["rendered_to"] = render_to
    if fmt == "json":
        click.echo(json.dumps({"table": table, **row}, default=str))
        return
    click.echo(_header(f"Chat corpus report: {table}.{json_col}"))
    click.echo(_render_table(
        ["metric", "value"],
        [[k, row[k]] for k in row],
    ))


@cli.command()
@click.argument("store_path")
@click.option("--quantiles", default=None,
              help="Comma-separated quantiles (e.g. 0.1,0.5,0.9); "
                   "default p25/p50/p75")
@click.option("--format", "fmt", default="table",
              type=click.Choice(["table", "json"]))
@click.option("--cpus", default=None)
def summary(store_path, quantiles, fmt, cpus):
    """Merge an incremental-profile summary store (written by
    ``profiler.incremental.partition_profile`` /
    ``profile_stream_batches``) into corpus-wide per-column stats —
    counts, min/max, mean/stddev, HLL distincts, KLL quantiles — with
    ZERO rescans of the data. Extension command."""
    from sparvi_core_spark.profiler.incremental import merge_profiles

    spark = _session(cpus)
    qs = (
        [float(x) for x in quantiles.split(",")] if quantiles else None
    )
    merged = merge_profiles(
        spark.read.parquet(store_path), quantiles=qs
    ).orderBy("column")
    rows = [r.asDict() for r in merged.collect()]
    if fmt == "json":
        click.echo(json.dumps({"columns": rows}, default=str))
        return
    qcols = [c for c in (rows[0] if rows else {}) if c.startswith("p")]
    click.echo(_header(f"Merged profile ({len(rows)} columns)"))
    click.echo(_render_table(
        ["column", "rows", "nulls", "~distinct", "min", "max", "mean",
         "stddev"] + qcols,
        [
            [r["column"], r["n_rows"], r["n_nulls"],
             None if r["approx_distinct"] is None else round(r["approx_distinct"]),
             r["min"], r["max"],
             None if r["mean"] is None else round(r["mean"], 4),
             None if r["stddev"] is None else round(r["stddev"], 4)]
            + [r[q] for q in qcols]
            for r in rows
        ],
    ))


@cli.command()
@click.argument("source")
@click.argument("table")
@click.argument("dest")
@click.option("--n-shards", default=None, type=int,
              help="Exact shard count (or use --rows-per-shard)")
@click.option("--rows-per-shard", default=None, type=int,
              help="Derive the count from one scan")
@click.option("--id-col", default="doc_id", show_default=True)
@click.option("--tokens-col", default=None,
              help="Sum this column per shard into the manifest")
@click.option("--salt", default="shard", show_default=True)
@click.option("--cpus", default=None)
def shard(source, table, dest, n_shards, rows_per_shard, id_col,
          tokens_col, salt, cpus):
    """Export TABLE from SOURCE as loader-ready training shards at
    DEST (hive `shard=K/` dirs + `_manifest.json`). Membership is a
    pure hash of --id-col: re-exports and appends keep every existing
    row's shard. Extension command."""
    from sparvi_core_spark.sources.writers import write_training_shards

    spark = _session(cpus)
    register_views(spark, source)
    if (n_shards is None) == (rows_per_shard is None):
        raise click.UsageError(
            "pass exactly one of --n-shards / --rows-per-shard"
        )
    manifest = write_training_shards(
        spark.table(table), dest, n_shards=n_shards,
        rows_per_shard=rows_per_shard, id_col=id_col,
        tokens_col=tokens_col, salt=salt,
    )
    click.echo(json.dumps(manifest))


@cli.command()
@click.argument("metrics_path")
@click.option("--table", default=None, help="Restrict to one source table")
@click.option("--alpha", default=0.3, show_default=True,
              help="EWMA memory (smaller = longer memory)")
@click.option("--limit-sigma", "l_sigma", default=3.0, show_default=True,
              help="Control limit in sigma units")
@click.option("--min-points", default=5, show_default=True)
@click.option("--format", "fmt", default="table",
              type=click.Choice(["table", "json"]))
@click.option("--cpus", default=None)
def changepoints(metrics_path, table, alpha, l_sigma, min_points, fmt, cpus):
    """Flag metric change-points in the metrics warehouse written by
    ``profile --history-dir`` runs / ``append_metrics`` (EWMA control
    chart per series). Extension command — upgrades the reference's
    one-step-back anomaly thresholds to sequential detection."""
    from sparvi_core_spark.profiler.changepoint import (
        detect_metric_changepoints,
    )

    spark = _session(cpus)
    rows = [
        r.asDict()
        for r in detect_metric_changepoints(
            spark, metrics_path, table=table, alpha=alpha, L=l_sigma,
            min_points=min_points,
        ).collect()
    ]
    if fmt == "json":
        click.echo(json.dumps({"changepoints": rows}, default=str))
        return
    click.echo(_header(f"Metric change-points ({len(rows)})"))
    if rows:
        click.echo(_render_table(
            ["table", "metric", "column", "timestamp", "value", "ewma", "resid"],
            [[r["table"], r["metric"], r["column"], r["timestamp"],
              r["value"], round(r["ewma"], 3), round(r["resid"], 3)]
             for r in rows],
        ))


@cli.command()
@click.argument("source", required=False)
@click.argument("table", required=False)
@click.option("--text-col", default="text", help="Text column to gate")
@click.option("--id-col", default="doc_id", help="Document id column")
@click.option("--no-required-words", is_flag=True,
              help="Drop the English-specific required-words rule "
                   "(non-English / synthetic corpora)")
@click.option("--keep-to", default=None,
              help="Write the rows passing BOTH gates as parquet here")
@click.option("--format", "fmt", default="table",
              type=click.Choice(["table", "json"]))
@click.option("--cpus", default=None, help="local[N] cores")
def gopher(source, table, text_col, id_col, no_required_words, keep_to,
           fmt, cpus):
    """Gopher/MassiveText release gate on TABLE's TEXT-COL: per-rule
    attrition (how many documents EACH quality + repetition rule
    kills, independently) plus the composed pass counts — the numbers
    a corpus release reviews before committing the filter. Extension
    command — no reference analog."""
    from pyspark.sql import functions as F

    from sparvi_core_spark.functions.text import (
        GOPHER_REPETITION_THRESHOLDS,
        gopher_quality_flags,
        gopher_repetition_flags,
    )

    spark = _session(cpus)
    source, table = _resolve_source(source, table)
    df = _load_table_df(spark, source, table)
    qkw = {"min_required_words": 0} if no_required_words else {}
    q = gopher_quality_flags(df, id_col=id_col, text_col=text_col, **qkw)
    r = gopher_repetition_flags(df, id_col=id_col, text_col=text_col)
    joined = q.join(r, "id")
    flag_cols = [c for c in joined.columns if c.startswith("ok_")]
    # one aggregation: per-rule kill counts + the composed gates
    aggs = [
        F.sum((~F.coalesce(F.col(c), F.lit(False))).cast("long")).alias(c)
        for c in flag_cols
    ] + [
        F.count(F.lit(1)).alias("__total"),
        F.sum(F.coalesce(F.col("passes_gopher"), F.lit(False)).cast("long")
              ).alias("__pass_quality"),
        F.sum(F.coalesce(F.col("passes_repetition"), F.lit(False)).cast(
            "long")).alias("__pass_repetition"),
        F.sum((F.coalesce(F.col("passes_gopher"), F.lit(False))
               & F.coalesce(F.col("passes_repetition"), F.lit(False))
               ).cast("long")).alias("__pass_both"),
    ]
    row = joined.agg(*aggs).first().asDict()
    total = row.pop("__total")
    summary = {
        "total_docs": total,
        "pass_quality": row.pop("__pass_quality"),
        "pass_repetition": row.pop("__pass_repetition"),
        "pass_both": row.pop("__pass_both"),
    }
    kills = {k.removeprefix("ok_"): v for k, v in row.items()}
    if keep_to:
        kept = df.join(
            joined.filter("passes_gopher AND passes_repetition")
            .select(F.col("id").alias(id_col)),
            id_col,
        )
        kept.write.mode("overwrite").parquet(keep_to)
        summary["kept_to"] = keep_to
    if fmt == "json":
        click.echo(json.dumps(
            {"table": table, **summary, "rule_kills": kills}, default=str
        ))
        return
    click.echo(_header(f"Gopher release gate: {table}.{text_col}"))
    click.echo(_render_table(
        ["metric", "value"], [[k, v] for k, v in summary.items()]
    ))
    click.echo(_render_table(
        ["rule", "docs killed", "kill %"],
        [
            [k, v, f"{100.0 * v / max(total, 1):.1f}"]
            for k, v in sorted(kills.items(), key=lambda kv: -kv[1])
        ],
    ))


@cli.command()
@click.argument("source", required=False)
@click.argument("table", required=False)
@click.option("--text-col", default="text", help="Text column")
@click.option("--id-col", default="doc_id", help="Document id column")
@click.option("--lang-col", default=None,
              help="Existing language column (default: predict)")
@click.option("--lang-strategy", default="ngram",
              type=click.Choice(["stopword", "ngram"]),
              help="Prediction tier when --lang-col is absent: 'ngram' "
                   "(char-gram NB, sees unsegmented scripts) or "
                   "'stopword' (5-language cheap gate)")
@click.option("--no-required-words", is_flag=True,
              help="Drop the English-specific Gopher rule")
@click.option("--output", default=None, help="Write the JSON here")
@click.option("--format", "fmt", default="json",
              type=click.Choice(["table", "json"]))
@click.option("--cpus", default=None, help="local[N] cores")
def datacard(source, table, text_col, id_col, lang_col, lang_strategy,
             no_required_words, output, fmt, cpus):
    """One-command dataset card for TABLE: the statistics section a
    corpus release publishes — sizes, token totals and length
    quantiles, language distribution, quality/Gopher pass rates, PII
    exposure, lexical diversity, and exact-duplicate mass — composed
    from the engine's report operators. Several corpus scans by
    design (it is a release artifact, not a hot-path query).
    Extension command — no reference analog."""
    from pyspark.sql import functions as F

    from sparvi_core_spark.functions.text import (
        c4_clean,
        gopher_quality_flags,
        gopher_repetition_flags,
        language_id,
        normalize_text,
        quality_features,
        token_counts,
    )
    from sparvi_core_spark.operators.diversity import corpus_diversity
    from sparvi_core_spark.operators.pii import pii_summary

    spark = _session(cpus)
    source, table = _resolve_source(source, table)
    df = _load_table_df(spark, source, table)
    card: dict = {"table": table, "text_col": text_col}

    sizes = df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length(text_col)).alias("n_chars"),
        F.sum(F.col(text_col).isNull().cast("long")).alias("null_texts"),
    ).first()
    card["size"] = {k: sizes[k] for k in ("n_docs", "n_chars", "null_texts")}

    tc = token_counts(df, id_col=id_col, text_col=text_col)
    toks = tc.agg(
        F.sum("ws_tokens").alias("total"),
        F.expr("percentile_approx(ws_tokens, array(0.5, 0.9, 0.99))").alias(
            "q"
        ),
    ).first()
    card["tokens"] = {
        "total_ws_tokens": toks["total"],
        "doc_tokens_p50": toks["q"][0],
        "doc_tokens_p90": toks["q"][1],
        "doc_tokens_p99": toks["q"][2],
    }

    lang = (
        df.select(F.col(lang_col).alias("predicted_lang"))
        if lang_col
        else language_id(
            df, id_col=id_col, text_col=text_col, strategy=lang_strategy
        )
    )
    total = max(card["size"]["n_docs"], 1)
    card["languages"] = {
        r["predicted_lang"]: round(r["n"] / total, 4)
        for r in lang.groupBy("predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"))
        .limit(10)
        .collect()
    }

    q = quality_features(df, id_col=id_col, text_col=text_col).agg(
        F.round(F.avg("quality_score"), 4).alias("mean"),
        F.expr("percentile_approx(quality_score, 0.5)").alias("p50"),
    ).first()
    qkw = {"min_required_words": 0} if no_required_words else {}
    gq = gopher_quality_flags(df, id_col=id_col, text_col=text_col, **qkw)
    gr = gopher_repetition_flags(df, id_col=id_col, text_col=text_col)
    c4 = c4_clean(df, id_col=id_col, text_col=text_col)
    gates = gq.select("id", "passes_gopher").join(
        gr.select("id", "passes_repetition"), "id"
    ).join(c4.select("id", "passes_c4"), "id").agg(
        F.sum(F.coalesce(F.col("passes_gopher"), F.lit(False)).cast("long")
              ).alias("pq"),
        F.sum(F.coalesce(F.col("passes_repetition"), F.lit(False)).cast(
            "long")).alias("pr"),
        F.sum(F.coalesce(F.col("passes_c4"), F.lit(False)).cast("long")
              ).alias("pc"),
    ).first()
    card["quality"] = {
        "mean_quality_score": q["mean"],
        "p50_quality_score": q["p50"],
        "gopher_quality_pass_frac": round(gates["pq"] / total, 4),
        "gopher_repetition_pass_frac": round(gates["pr"] / total, 4),
        "c4_pass_frac": round(gates["pc"] / total, 4),
    }

    pii = pii_summary(df, text_col=text_col).first().asDict()
    card["pii"] = {
        "docs_with_pii": pii.get("docs_with_pii"),
        "docs_with_pii_frac": round(
            (pii.get("docs_with_pii") or 0) / total, 4
        ),
    }

    card["diversity"] = {
        k: v
        for k, v in corpus_diversity(
            df, text_col=text_col
        ).first().asDict().items()
        if k in ("vocab_size", "type_token_ratio", "token_entropy",
                 "top_token_frac", "distinct_2")
    }

    dupes = df.select(
        normalize_text(text_col).alias("__norm")
    ).agg(
        (F.count(F.lit(1)) - F.count_distinct("__norm")).alias("extra")
    ).first()
    card["exact_duplicates"] = {
        "duplicate_docs_beyond_first": dupes["extra"],
        "duplicate_frac": round(dupes["extra"] / total, 4),
    }

    payload = json.dumps(card, default=str, indent=2)
    if output:
        with open(output, "w") as fh:
            fh.write(payload + "\n")
        click.echo(f"datacard written to {output}")
    if fmt == "json":
        click.echo(json.dumps(card, default=str))
        return
    click.echo(_header(f"Dataset card: {table}"))
    for section, vals in card.items():
        if not isinstance(vals, dict):
            continue
        click.echo(_render_table(
            [section, "value"], [[k, v] for k, v in vals.items()]
        ))


@cli.command()
def info():
    """Version / platform info (reference: cli/main.py:39-76)."""
    import pyspark

    click.echo(f"sparvi-core-spark version: {sparvi_core_spark.__version__}")
    click.echo(f"pyspark version: {pyspark.__version__}")
    click.echo(f"python: {platform.python_version()} on {platform.system()}")


@cli.command(name="test-connection")
@click.argument("source")
@click.option("--cpus", default=None)
def test_connection(source, cpus):
    """Check SOURCE is readable and list its tables (cli/main.py:79-123)."""
    import os

    if not os.path.exists(source):
        click.echo(f"Connection failed: source does not exist: {source}")
        sys.exit(1)
    spark = _session(cpus)
    try:
        views = register_views(spark, source)
        if not views:
            click.echo("Connection OK, but no known tables found")
            return
        click.echo(f"Connection successful. {len(views)} tables:")
        for name, df in list(views.items())[:10]:
            click.echo(f"  {name}: {len(df.columns)} columns")
    except Exception as e:
        click.echo(f"Connection failed: {e}")
        sys.exit(1)


@cli.group(name="dedup-index")
def dedup_index():
    """Stored MinHash dedup index: build once, then screen every new
    crawl batch against the whole historical corpus reading only the
    band buckets the batch touches (sources/minhash_index.py).
    Extension command — no reference analog."""


@dedup_index.command("build")
@click.argument("source")
@click.argument("table")
@click.argument("index_path")
@click.option("--id-col", default="doc_id", help="Document id column")
@click.option("--text-col", default="text", help="Text column")
@click.option("--num-hashes", default=16, show_default=True)
@click.option("--threshold", default=0.8, show_default=True,
              help="Jaccard threshold the banding is solved for")
@click.option("--bands", default=None, type=int,
              help="Override the solved banding")
@click.option("--shingle-n", default=3, show_default=True)
@click.option("--n-buckets", default=256, show_default=True,
              help="Hive partition count per store (probe IN-list bound)")
@click.option("--cpus", default=None, help="local[N] cores")
def dedup_index_build(source, table, index_path, id_col, text_col,
                      num_hashes, threshold, bands, shingle_n, n_buckets,
                      cpus):
    """Sign TABLE once and write the band + signature stores."""
    from sparvi_core_spark.sources.minhash_index import write_minhash_index

    spark = _session(cpus)
    df = _load_table_df(spark, source, table)
    man = write_minhash_index(
        df, index_path, num_hashes=num_hashes, bands=bands,
        threshold=threshold, shingle_n=shingle_n, n_buckets=n_buckets,
        id_col=id_col, text_col=text_col,
    )
    click.echo(json.dumps(
        {k: man[k] for k in ("format", "n_docs", "dropped_short",
                             "num_hashes", "bands", "shingle_n",
                             "threshold", "n_buckets")}))


@dedup_index.command("append")
@click.argument("source")
@click.argument("table")
@click.argument("index_path")
@click.option("--auto-compact", default=None, type=int, metavar="N",
              help="After the append, compact if any bucket exceeds N "
                   "files (keeps probe latency flat across many small "
                   "appends; below N it costs one directory listing)")
@click.option("--staged", is_flag=True, default=False,
              help="Land the batch in the staging store (2 file "
                   "creations instead of one per touched bucket — the "
                   "micro-batch ingest path; fold with compact or "
                   "--auto-compact)")
@click.option("--cpus", default=None, help="local[N] cores")
def dedup_index_append(source, table, index_path, auto_compact, staged,
                       cpus):
    """Sign TABLE under the index's parameters and add it."""
    from sparvi_core_spark.sources.minhash_index import (
        append_minhash_index,
        compact_minhash_index_if,
    )

    spark = _session(cpus)
    df = _load_table_df(spark, source, table)
    man = append_minhash_index(spark, index_path, df, staged=staged)
    rep = {"n_docs": man["n_docs"], "dropped_short": man["dropped_short"]}
    if auto_compact is not None:
        out = compact_minhash_index_if(spark, index_path, auto_compact)
        rep["auto_compact"] = {
            "max_files_per_bucket": out["max_files_per_bucket"],
            "threshold": out["threshold"],
            "compacted": out["compacted"],
        }
    click.echo(json.dumps(rep))


@dedup_index.command("screen")
@click.argument("source")
@click.argument("table")
@click.argument("index_path")
@click.option("--threshold", default=None, type=float,
              help="Jaccard threshold (default: the index manifest's)")
@click.option("--max-bucket", default=1000, show_default=True,
              help="Degenerate stored-band-key cap")
@click.option("--keep-to", default=None,
              help="Write surviving (novel) rows as parquet here")
@click.option("--append-survivors", is_flag=True, default=False,
              help="Also add the survivors to the index")
@click.option("--format", "fmt", default="table",
              type=click.Choice(["table", "json"]))
@click.option("--cpus", default=None, help="local[N] cores")
def dedup_index_screen(source, table, index_path, threshold, max_bucket,
                       keep_to, append_survivors, fmt, cpus):
    """Drop TABLE rows near-duplicating the indexed corpus; report
    attrition (and optionally land + index the survivors)."""
    from sparvi_core_spark.sources.minhash_index import (
        append_minhash_index,
        filter_new_against_index,
    )

    spark = _session(cpus)
    df = _load_table_df(spark, source, table)
    survivors = filter_new_against_index(
        spark, index_path, df, threshold, max_bucket
    )
    if keep_to or append_survivors:
        survivors = survivors.localCheckpoint()
    n_in, n_kept = df.count(), survivors.count()
    if keep_to:
        survivors.write.mode("overwrite").parquet(keep_to)
    if append_survivors:
        append_minhash_index(spark, index_path, survivors)
    rep = {
        "rows_in": n_in,
        "rows_kept": n_kept,
        "rows_dropped": n_in - n_kept,
        "drop_rate": round((n_in - n_kept) / n_in, 4) if n_in else 0.0,
    }
    if fmt == "json":
        click.echo(json.dumps(rep))
        return
    click.echo(_header(f"Dedup screen: {table} vs {index_path}"))
    click.echo(_render_table(
        ["rows_in", "rows_kept", "rows_dropped", "drop_rate"],
        [[rep["rows_in"], rep["rows_kept"], rep["rows_dropped"],
          rep["drop_rate"]]],
    ))


@dedup_index.command("compact")
@click.argument("index_path")
@click.option("--if-over", default=None, type=int, metavar="N",
              help="Only compact when some bucket exceeds N files "
                   "(cheap no-op otherwise — cron-safe)")
@click.option("--cpus", default=None, help="local[N] cores")
def dedup_index_compact(index_path, if_over, cpus):
    """Fold pending deletes, then appended small files, back to one
    file per bucket (both stores; journaled, crash-healed). Run in
    the append maintenance window."""
    from sparvi_core_spark.sources.minhash_index import (
        compact_minhash_index,
        compact_minhash_index_if,
    )

    spark = _session(cpus)
    if if_over is not None:
        stats = compact_minhash_index_if(spark, index_path, if_over)
    else:
        stats = compact_minhash_index(spark, index_path)
    click.echo(json.dumps(stats))


@dedup_index.command("fold-staging")
@click.argument("index_path")
@click.option("--cpus", default=None, help="local[N] cores")
def dedup_index_fold_staging(index_path, cpus):
    """Fold the staging tier into both stores' bucket partitions
    WITHOUT rewriting any existing store file — the cheap,
    high-frequency maintenance verb (O(staged bytes); run the full
    ``compact`` on its own, rarer schedule)."""
    from sparvi_core_spark.sources.minhash_index import (
        fold_staging_minhash_index,
    )

    spark = _session(cpus)
    click.echo(json.dumps(fold_staging_minhash_index(spark, index_path)))


@dedup_index.command("delete")
@click.argument("index_path")
@click.option("--id", "ids", multiple=True, required=True,
              help="Document id to delete (repeatable)")
@click.option("--cpus", default=None, help="local[N] cores")
def dedup_index_delete(index_path, ids, cpus):
    """Takedown: tombstone ids (probes exclude them immediately);
    the next `dedup-index compact` purges them physically."""
    from sparvi_core_spark.sources.minhash_index import (
        delete_from_minhash_index,
    )

    spark = _session(cpus)
    stats = delete_from_minhash_index(spark, index_path, list(ids))
    click.echo(json.dumps(stats))


@dedup_index.command("vacuum")
@click.argument("index_path")
@click.option("--older-than", default=0.0, show_default=True,
              help="Retention seconds: delete only files unreferenced "
                   "for at least this long (size past the longest "
                   "probe; needs two passes unless 0)")
@click.option("--cpus", default=None, help="local[N] cores")
def dedup_index_vacuum(index_path, older_than, cpus):
    """Delete files referenced by NOTHING in the manifest — swap
    leftovers, folded staging files, purged tombstones, crashed-append
    orphans. Maintenance swaps never delete in place (a running probe
    may hold the files); this is the GC half of snapshot commits."""
    from sparvi_core_spark.sources.minhash_index import (
        vacuum_minhash_index,
    )

    spark = _session(cpus)
    click.echo(json.dumps(
        vacuum_minhash_index(spark, index_path, older_than_s=older_than)
    ))


@dedup_index.command("break-lock")
@click.argument("index_path")
@click.option("--cpus", default=None, help="local[N] cores")
def dedup_index_break_lock(index_path, cpus):
    """Remove a writer lock orphaned by a crash on ANOTHER host
    (same-host stale locks auto-break; live locks should be waited
    out — breaking one risks interleaving two writers)."""
    from sparvi_core_spark.sources.ann_index import break_writer_lock

    spark = _session(cpus)
    removed = break_writer_lock(spark, index_path)
    click.echo(json.dumps({"removed": removed}))


@dedup_index.command("health")
@click.argument("index_path")
@click.option("--cpus", default=None, help="local[N] cores")
def dedup_index_health_cmd(index_path, cpus):
    """Manifest vs on-disk bucket audit."""
    from sparvi_core_spark.sources.minhash_index import minhash_index_health

    spark = _session(cpus)
    rows = minhash_index_health(spark, index_path).collect()
    bad = [r for r in rows if not r["ok"]]
    click.echo(json.dumps(
        {"buckets": len(rows), "bad": len(bad),
         "bad_buckets": [r["bucket"] for r in bad[:20]]}))
    if bad:
        sys.exit(1)


# ---------------------------------------------------------------------------
# ann-index: stored embedding indexes (float IVF / binary / IVF-PQ)
# ---------------------------------------------------------------------------

_ANN_KINDS = click.Choice(["ivf", "binary", "ivfpq"])


@cli.group(name="ann-index")
def ann_index_grp():
    """Stored embedding ANN indexes: build once (float IVF, binary
    sketch, or IVF-PQ — sources/{ann,binary,ivfpq}_index.py), then
    append/search/compact/delete against vectors at rest. Extension
    command — no reference analog."""


@ann_index_grp.command("build")
@click.argument("source")
@click.argument("table")
@click.argument("index_path")
@click.option("--kind", type=_ANN_KINDS, default="ivf", show_default=True)
@click.option("--id-col", default="vec_id", show_default=True)
@click.option("--vec-col", default="embedding", show_default=True)
@click.option("--k", default=16, show_default=True,
              help="Coarse cells (ivf/ivfpq)")
@click.option("--m", default=4, show_default=True,
              help="PQ subspaces (ivfpq)")
@click.option("--ks", default=16, show_default=True,
              help="PQ codewords per subspace (ivfpq)")
@click.option("--bits", default=256, show_default=True,
              help="Sketch bits (binary)")
@click.option("--prefix-bits", default=12, show_default=True,
              help="Sign-prefix partition bits (binary)")
@click.option("--seed", default=42, show_default=True)
@click.option("--store-floats/--no-store-floats", default=True,
              show_default=True,
              help="Keep raw vectors for exact rerank (binary/ivfpq)")
@click.option("--files-per-bucket", default=1, show_default=True)
@click.option("--cpus", default=None, help="local[N] cores")
def ann_index_build(source, table, index_path, kind, id_col, vec_col, k,
                    m, ks, bits, prefix_bits, seed, store_floats,
                    files_per_bucket, cpus):
    """Fit the models on TABLE's vectors and write the index."""
    spark = _session(cpus)
    df = _load_table_df(spark, source, table)
    if kind == "binary":
        from sparvi_core_spark.sources.binary_index import (
            write_binary_index,
        )

        man = write_binary_index(
            df, index_path, bits=bits, seed=seed,
            prefix_bits=prefix_bits, id_col=id_col, vec_col=vec_col,
            store_vectors=store_floats, files_per_bucket=files_per_bucket,
        )
        keys = ("format", "n_vectors", "bits", "prefix_bits")
    else:
        from sparvi_core_spark.operators.similarity import kmeans_fit

        cents, _ = kmeans_fit(
            df, k=k, id_col=id_col, vec_col=vec_col, seed=seed
        )
        if kind == "ivf":
            from sparvi_core_spark.sources.ann_index import write_ivf_index

            man = write_ivf_index(
                df, cents, index_path, id_col=id_col, vec_col=vec_col,
                files_per_bucket=files_per_bucket,
            )
            keys = ("format", "n_vectors", "k", "dim")
        else:
            from sparvi_core_spark.operators.quantization import (
                ivf_residuals,
                pq_train,
            )
            from sparvi_core_spark.sources.ivfpq_index import (
                write_ivfpq_index,
            )

            res = ivf_residuals(df, cents, id_col=id_col, vec_col=vec_col)
            cb, _ = pq_train(
                res, m=m, ks=ks, id_col="id", vec_col="residual",
                seed=seed,
            )
            man = write_ivfpq_index(
                df, cents, cb, index_path, id_col=id_col, vec_col=vec_col,
                store_floats=store_floats,
                files_per_bucket=files_per_bucket,
            )
            keys = ("format", "n_vectors", "k", "m", "ks")
    click.echo(json.dumps({kk: man[kk] for kk in keys if kk in man}))


def _ann_compact_if(kind):
    if kind == "ivf":
        from sparvi_core_spark.sources.ann_index import compact_ivf_index_if

        return compact_ivf_index_if
    if kind == "binary":
        from sparvi_core_spark.sources.binary_index import (
            compact_binary_index_if,
        )

        return compact_binary_index_if
    from sparvi_core_spark.sources.ivfpq_index import compact_ivfpq_index_if

    return compact_ivfpq_index_if


@ann_index_grp.command("append")
@click.argument("source")
@click.argument("table")
@click.argument("index_path")
@click.option("--kind", type=_ANN_KINDS, default="ivf", show_default=True)
@click.option("--staged", is_flag=True, default=False,
              help="Land the batch in the staging store (one file per "
                   "store — the micro-batch ingest path)")
@click.option("--auto-compact", default=None, type=int, metavar="N",
              help="After the append, compact if any bucket (or the "
                   "staged-file count) exceeds N")
@click.option("--cpus", default=None, help="local[N] cores")
def ann_index_append(source, table, index_path, kind, staged,
                     auto_compact, cpus):
    """Encode TABLE's vectors under the stored models and add them."""
    spark = _session(cpus)
    df = _load_table_df(spark, source, table)
    if kind == "ivf":
        from sparvi_core_spark.sources.ann_index import append_ivf_index

        man = append_ivf_index(df, index_path, staged=staged)
    elif kind == "binary":
        from sparvi_core_spark.sources.binary_index import (
            append_binary_index,
        )

        man = append_binary_index(spark, index_path, df, staged=staged)
    else:
        from sparvi_core_spark.sources.ivfpq_index import append_ivfpq_index

        man = append_ivfpq_index(df, index_path, staged=staged)
    rep = {"n_vectors": man["n_vectors"]}
    if auto_compact is not None:
        out = _ann_compact_if(kind)(spark, index_path, auto_compact)
        rep["auto_compact"] = {
            "max_files_per_bucket": out["max_files_per_bucket"],
            "threshold": out["threshold"],
            "compacted": out["compacted"],
        }
    click.echo(json.dumps(rep))


@ann_index_grp.command("search")
@click.argument("source")
@click.argument("table")
@click.argument("index_path")
@click.option("--kind", type=_ANN_KINDS, default="ivf", show_default=True)
@click.option("--k", default=10, show_default=True)
@click.option("--nprobe", default=2, show_default=True,
              help="Probed cells (ivf/ivfpq)")
@click.option("--radius", default=2, show_default=True,
              help="Prefix bit-flip radius (binary)")
@click.option("--rerank", default=None, type=int,
              help="Exact-cosine rerank depth (binary/ivfpq)")
@click.option("--keep-to", default=None,
              help="Write the full result as parquet here")
@click.option("--limit", default=10, show_default=True,
              help="Rows echoed to stdout")
@click.option("--cpus", default=None, help="local[N] cores")
def ann_index_search(source, table, index_path, kind, k, nprobe, radius,
                     rerank, keep_to, limit, cpus):
    """Top-k neighbors of TABLE's vectors from the stored index."""
    spark = _session(cpus)
    queries = _load_table_df(spark, source, table)
    if kind == "ivf":
        from sparvi_core_spark.sources.ann_index import search_ivf_index

        res = search_ivf_index(spark, index_path, queries, k=k,
                               nprobe=nprobe)
    elif kind == "binary":
        from sparvi_core_spark.sources.binary_index import (
            search_binary_index,
        )

        res = search_binary_index(spark, index_path, queries, k=k,
                                  radius=radius, rerank=rerank)
    else:
        from sparvi_core_spark.sources.ivfpq_index import search_ivfpq_index

        res = search_ivfpq_index(spark, index_path, queries, k=k,
                                 nprobe=nprobe, rerank=rerank)
    res = res.localCheckpoint()  # counted, sampled, optionally written
    n = res.count()
    if keep_to:
        res.write.mode("overwrite").parquet(keep_to)
    sample = [r.asDict() for r in res.limit(limit).collect()]
    click.echo(json.dumps({"results": n, "sample": sample}, default=str))


@ann_index_grp.command("compact")
@click.argument("index_path")
@click.option("--kind", type=_ANN_KINDS, default="ivf", show_default=True)
@click.option("--if-over", default=None, type=int, metavar="N",
              help="Only compact when some bucket (or the staged-file "
                   "count) exceeds N — cron-safe no-op otherwise")
@click.option("--cpus", default=None, help="local[N] cores")
def ann_index_compact(index_path, kind, if_over, cpus):
    """Fold pending deletes, staged appends, and small files."""
    spark = _session(cpus)
    if if_over is not None:
        stats = _ann_compact_if(kind)(spark, index_path, if_over)
    elif kind == "ivf":
        from sparvi_core_spark.sources.ann_index import compact_ivf_index

        stats = compact_ivf_index(spark, index_path)
    elif kind == "binary":
        from sparvi_core_spark.sources.binary_index import (
            compact_binary_index,
        )

        stats = compact_binary_index(spark, index_path)
    else:
        from sparvi_core_spark.sources.ivfpq_index import (
            compact_ivfpq_index,
        )

        stats = compact_ivfpq_index(spark, index_path)
    click.echo(json.dumps(stats))


@ann_index_grp.command("fold-staging")
@click.argument("index_path")
@click.option("--kind", type=_ANN_KINDS, default="ivf", show_default=True)
@click.option("--cpus", default=None, help="local[N] cores")
def ann_index_fold_staging(index_path, kind, cpus):
    """Fold the staging tier into the cell partitions WITHOUT
    rewriting any existing store file — the cheap, high-frequency
    maintenance verb (O(staged bytes); run the full ``compact`` on
    its own, rarer schedule)."""
    spark = _session(cpus)
    if kind == "ivf":
        from sparvi_core_spark.sources.ann_index import (
            fold_staging_ivf_index as fold,
        )
    elif kind == "binary":
        from sparvi_core_spark.sources.binary_index import (
            fold_staging_binary_index as fold,
        )
    else:
        from sparvi_core_spark.sources.ivfpq_index import (
            fold_staging_ivfpq_index as fold,
        )
    click.echo(json.dumps(fold(spark, index_path)))


@ann_index_grp.command("delete")
@click.argument("index_path")
@click.option("--kind", type=_ANN_KINDS, default="ivf", show_default=True)
@click.option("--id", "ids", multiple=True, required=True,
              help="Vector id to delete (repeatable)")
@click.option("--cpus", default=None, help="local[N] cores")
def ann_index_delete(index_path, kind, ids, cpus):
    """Takedown: tombstone ids (searches exclude them immediately);
    the next compact purges them physically."""
    spark = _session(cpus)
    if kind == "ivf":
        from sparvi_core_spark.sources.ann_index import (
            delete_from_ivf_index,
        )

        stats = delete_from_ivf_index(spark, index_path, list(ids))
    elif kind == "binary":
        from sparvi_core_spark.sources.binary_index import (
            delete_from_binary_index,
        )

        stats = delete_from_binary_index(spark, index_path, list(ids))
    else:
        from sparvi_core_spark.sources.ivfpq_index import (
            delete_from_ivfpq_index,
        )

        stats = delete_from_ivfpq_index(spark, index_path, list(ids))
    click.echo(json.dumps(stats))


@ann_index_grp.command("vacuum")
@click.argument("index_path")
@click.option("--kind", type=_ANN_KINDS, default="ivf", show_default=True)
@click.option("--older-than", default=0.0, show_default=True,
              help="Retention seconds: delete only files unreferenced "
                   "for at least this long (size past the longest "
                   "search; needs two passes unless 0)")
@click.option("--cpus", default=None, help="local[N] cores")
def ann_index_vacuum(index_path, kind, older_than, cpus):
    """Delete files referenced by NOTHING in the manifest — swap
    leftovers, folded staging files, purged tombstones, crashed-append
    orphans. Maintenance swaps never delete in place (a running search
    may hold the files); this is the GC half of snapshot commits."""
    spark = _session(cpus)
    if kind == "ivf":
        from sparvi_core_spark.sources.ann_index import (
            vacuum_ivf_index as vac,
        )
    elif kind == "binary":
        from sparvi_core_spark.sources.binary_index import (
            vacuum_binary_index as vac,
        )
    else:
        from sparvi_core_spark.sources.ivfpq_index import (
            vacuum_ivfpq_index as vac,
        )
    click.echo(json.dumps(vac(spark, index_path, older_than_s=older_than)))


@ann_index_grp.command("break-lock")
@click.argument("index_path")
@click.option("--cpus", default=None, help="local[N] cores")
def ann_index_break_lock(index_path, cpus):
    """Remove a writer lock orphaned by a crash on another host."""
    from sparvi_core_spark.sources.ann_index import break_writer_lock

    spark = _session(cpus)
    removed = break_writer_lock(spark, index_path)
    click.echo(json.dumps({"removed": removed}))


@ann_index_grp.command("health")
@click.argument("index_path")
@click.option("--kind", type=_ANN_KINDS, default="ivf", show_default=True)
@click.option("--cpus", default=None, help="local[N] cores")
def ann_index_health(index_path, kind, cpus):
    """Index audit: per-cell stats (ivf) or manifest-vs-disk (binary)."""
    spark = _session(cpus)
    if kind == "binary":
        from sparvi_core_spark.sources.binary_index import (
            binary_index_health,
        )

        rows = binary_index_health(spark, index_path).collect()
        bad = [r for r in rows if not r["ok"]]
        click.echo(json.dumps(
            {"buckets": len(rows), "bad": len(bad),
             "bad_buckets": [r["bucket"] for r in bad[:20]]}))
        if bad:
            sys.exit(1)
        return
    if kind == "ivfpq":
        from sparvi_core_spark.sources.ivfpq_index import read_ivfpq_index

        coded, _, _, man = read_ivfpq_index(spark, index_path)
        actual = coded.count()
        click.echo(json.dumps(
            {"n_vectors_manifest": man["n_vectors"],
             "n_vectors_actual": actual,
             "ok": actual == man["n_vectors"]}))
        if actual != man["n_vectors"]:
            sys.exit(1)
        return
    from sparvi_core_spark.sources.ann_index import ivf_index_health

    rows = [r.asDict() for r in ivf_index_health(spark, index_path).collect()]
    click.echo(json.dumps({"cells": len(rows), "report": rows[:20]},
                          default=str))


if __name__ == "__main__":
    cli()
