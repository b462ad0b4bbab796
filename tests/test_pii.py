"""PII detection/redaction (`operators/pii.py`): hand-checked counts
on a planted fixture, full parity with an independent Python `re` +
Luhn twin over the real documents corpus (patterns are RE2/Java/PCRE
common-subset by design), and the redaction contracts — every pattern
gone after redaction, idempotent, NULL-preserving, over-removal of
Luhn-invalid card shapes."""

import re

import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.operators.pii import (
    PII_PATTERNS,
    REDACT_ORDER,
    detect_pii,
    pii_summary,
    redact_pii,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def planted(spark):
    rows = [
        (1, "mail jane.doe+x@example.co.uk and b@c.io, call 415-555-0134"),
        (2, "server 192.168.1.100 and 8.8.8.8; bogus 999.1.1.1 stays"),
        (3, "ssn 123-45-6789 card 4111 1111 1111 1111 ok"),
        (4, "bad card 1234 5678 9012 3456 is not counted"),
        (5, None),
        (6, "plain text with numbers 42 and 2024 but no pii"),
        (7, "amex 3782 822463 10005 and visa 4012-8888-8888-1881"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _luhn_ok(cand: str) -> bool:
    d = re.sub(r"[ \-]", "", cand)
    if len(d) < 13:
        return False
    total = 0
    for i, ch in enumerate(reversed(d), start=1):
        v = int(ch)
        if i % 2 == 0:
            v *= 2
            if v > 9:
                v -= 9
        total += v
    return total % 10 == 0


def _py_counts(text: str) -> dict:
    """The independent twin: same patterns via Python re, phone on
    card-stripped text, Luhn-verified cards."""
    t = text or ""
    out = {}
    for name, pat in PII_PATTERNS.items():
        src = (
            re.sub(PII_PATTERNS["credit_card"], " ", t)
            if name == "phone"
            else t
        )
        hits = re.findall(pat, src)
        if name == "credit_card":
            hits = [h for h in hits if _luhn_ok(h)]
        out[f"n_{name}"] = len(hits)
    out["pii_total"] = sum(out.values())
    return out


def test_hand_checked_counts(spark, planted):
    rows = {r["doc_id"]: r for r in detect_pii(planted).collect()}
    assert rows[1]["n_email"] == 2 and rows[1]["n_phone"] == 1
    assert rows[2]["n_ipv4"] == 2  # 999.1.1.1 is NOT an IP
    assert rows[3]["n_ssn"] == 1 and rows[3]["n_credit_card"] == 1
    assert rows[4]["n_credit_card"] == 0  # fails Luhn
    assert rows[4]["pii_total"] == 0
    assert rows[5]["pii_total"] == 0  # NULL text
    assert rows[6]["pii_total"] == 0
    assert rows[7]["n_credit_card"] == 2  # amex 15-digit + visa dashed
    # a card never double-counts as a phone
    assert rows[3]["n_phone"] == 0 and rows[7]["n_phone"] == 0


def test_python_twin_parity_on_corpus(spark, planted):
    """Spark counts == Python re twin, over the planted fixture AND
    the real documents corpus (500 docs of organic text — the
    false-positive surface)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    for frame in (planted, docs):
        got = {
            r["doc_id"]: {
                k: r[k]
                for k in r.asDict()
                if k.startswith("n_") or k == "pii_total"
            }
            for r in detect_pii(frame).collect()
        }
        for r in frame.collect():
            want = _py_counts(r["text"])
            assert got[r["doc_id"]] == want, (r["doc_id"], r["text"])


def test_redaction_removes_every_pattern(spark, planted):
    red = redact_pii(planted, out_col="clean")
    for r in red.collect():
        if r["clean"] is None:
            assert r["text"] is None
            continue
        for name, pat in PII_PATTERNS.items():
            # phone checked on card-stripped basis like detection
            src = (
                re.sub(PII_PATTERNS["credit_card"], " ", r["clean"])
                if name == "phone"
                else r["clean"]
            )
            assert not re.search(pat, src), (r["doc_id"], name, r["clean"])
    # typed placeholders present where expected; Luhn-INVALID card
    # shapes are redacted too (over-removal is the safe direction)
    rows = {r["doc_id"]: r["clean"] for r in red.collect()}
    assert "[EMAIL]" in rows[1] and "[PHONE]" in rows[1]
    assert rows[2].count("[IPV4]") == 2 and "999.1.1.1" in rows[2]
    assert "[SSN]" in rows[3] and "[CREDIT_CARD]" in rows[3]
    assert "[CREDIT_CARD]" in rows[4]
    assert rows[6] == planted.filter("doc_id = 6").first()["text"]


def test_redaction_idempotent_and_type_scoped(spark, planted):
    once = redact_pii(planted)
    twice = redact_pii(once)
    a = {r["doc_id"]: r["text"] for r in once.collect()}
    b = {r["doc_id"]: r["text"] for r in twice.collect()}
    assert a == b
    # scoping: redact only emails → phones survive
    scoped = redact_pii(planted, types=["email"], out_col="clean")
    r1 = scoped.filter("doc_id = 1").first()["clean"]
    assert "[EMAIL]" in r1 and "415-555-0134" in r1
    with pytest.raises(ValueError, match="unknown PII type"):
        detect_pii(planted, types=["nope"])
    with pytest.raises(ValueError, match="unknown PII type"):
        redact_pii(planted, types=["nope"])


def test_summary_and_plan_is_map_only(spark, planted):
    row = pii_summary(planted).first()
    assert row["n_docs"] == 7
    assert row["docs_with_pii"] == 4  # docs 1, 2, 3, 7
    assert row["total_email"] == 2 and row["total_ipv4"] == 2
    assert row["total_credit_card"] == 3
    # detect is map-only: no exchange in the plan
    plan = (
        detect_pii(planted)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert REDACT_ORDER[0] == "email" and "credit_card" in REDACT_ORDER
