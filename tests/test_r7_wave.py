"""Round-7 additions: NULL-parity contracts for the per-key recurrences
(ewma/holt — r6 ADVICE items 1-2), spearman null filtering, exact
percentile name-collision validation, and the q219 notes-NLP fixture's
closed-form extraction."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.operators.aggregates import (
    exact_percentiles,
    spearman_by_group,
)
from mimic_iv_data_pipeline_spark.operators.windows import ewma, holt_linear


def test_ewma_null_poisons_like_sql(spark):
    """A NULL value must emit NULL and poison every later row of the
    key — exactly what a recursive-CTE twin computes (NULL-absorbing
    arithmetic) — while other keys are untouched. This is the r6
    ADVICE finding: NaN-in-float64 used to surface as NaN, silently
    breaking the bitwise engine-portability contract on null inputs.
    """
    rows = [
        # key 'a': null at t=2 → rows 2,3,4 NULL
        ("a", 0, 10.0), ("a", 1, 20.0), ("a", 2, None), ("a", 3, 40.0), ("a", 4, 8.0),
        # key 'b': FIRST value null → whole key NULL
        ("b", 0, None), ("b", 1, 5.0),
        # key 'c': no nulls → plain recursion
        ("c", 0, 4.0), ("c", 1, 8.0),
    ]
    df = spark.createDataFrame(rows, "k string, t long, x double")
    got = {
        (r["k"], r["t"]): r["e"]
        for r in ewma(df, "k", "t", "x", 0.25, out_col="e").collect()
    }
    assert got[("a", 0)] == 10.0
    assert got[("a", 1)] == 0.25 * 20.0 + 0.75 * 10.0
    assert got[("a", 2)] is None and got[("a", 3)] is None and got[("a", 4)] is None
    assert got[("b", 0)] is None and got[("b", 1)] is None
    assert got[("c", 0)] == 4.0 and got[("c", 1)] == 0.25 * 8.0 + 0.75 * 4.0

    # engine cross-check: DuckDB's recursive CTE over the same rows
    con = duckdb.connect()
    con.execute(
        """
        CREATE TABLE s(k VARCHAR, t BIGINT, x DOUBLE);
        INSERT INTO s VALUES ('a',0,10.0),('a',1,20.0),('a',2,NULL),
          ('a',3,40.0),('a',4,8.0),('b',0,NULL),('b',1,5.0),
          ('c',0,4.0),('c',1,8.0);
        """
    )
    duck = {
        (k, t): e
        for k, t, e in con.execute(
            """
            WITH RECURSIVE r AS (
              SELECT k, t, x AS e FROM s WHERE t = 0
              UNION ALL
              SELECT s.k, s.t, 0.25 * s.x + 0.75 * r.e
              FROM s JOIN r ON s.k = r.k AND s.t = r.t + 1
            ) SELECT k, t, e FROM r
            """
        ).fetchall()
    }
    assert got == duck  # bitwise, including the NULL cells


def test_holt_null_parity(spark):
    """Holt's level/forecast go NULL from the first NULL value on;
    trend stays 0.0 on a key whose FIRST value is NULL (b_0 is the
    literal 0 in the recursion) and goes NULL one step later."""
    rows = [
        ("a", 0, 10.0), ("a", 1, None), ("a", 2, 30.0),
        ("b", 0, None), ("b", 1, 7.0),
    ]
    df = spark.createDataFrame(rows, "k string, t long, x double")
    got = {
        (r["k"], r["t"]): (r["level"], r["trend"], r["forecast"])
        for r in holt_linear(df, "k", "t", "x", 0.5, 0.25).collect()
    }
    assert got[("a", 0)] == (10.0, 0.0, 10.0)
    assert got[("a", 1)] == (None, None, None)
    assert got[("a", 2)] == (None, None, None)
    assert got[("b", 0)] == (None, 0.0, None)  # b_0 = 0 literal, l_0 = NULL
    assert got[("b", 1)] == (None, None, None)


def test_spearman_drops_null_pairs(spark):
    """Rows with NULL x or y are excluded before ranking (pairwise-
    complete Spearman) — r6 ADVICE: Spark ranks NULLS FIRST, DuckDB
    NULLS LAST, so unfiltered nulls silently desync engines."""
    rows = [
        ("g", 1.0, 2.0), ("g", 2.0, 4.0), ("g", 3.0, 6.0),
        ("g", None, 99.0), ("g", 50.0, None),  # must not shift ranks
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = spearman_by_group(df, "g", "x", "y").collect()
    assert len(out) == 1
    assert out[0]["n"] == 3  # null pairs dropped from n as well
    assert out[0]["rho"] == pytest.approx(1.0)


def test_exact_percentiles_rejects_colliding_names(spark):
    df = spark.createDataFrame([("g", 1.0, 1)], "g string, v double, i long")
    with pytest.raises(ValueError, match="collide"):
        exact_percentiles(df, "g", "v", [0.05, 0.052], tie_break="i")
    # non-colliding probs still work
    out = exact_percentiles(df, "g", "v", [0.05, 0.5], tie_break="i").collect()
    assert out[0]["p5"] == 1.0 and out[0]["p50"] == 1.0


def test_q219_fixture_extraction_is_the_closed_form(spark):
    """The q219 oracle hardcodes each template's expected entities; if
    anyone edits a template or the matcher, this pins the closed form
    locally before the driver does."""
    from mimic_iv_data_pipeline_spark.operators.nlp import (
        DEFAULT_TARGETS,
        _extract,
    )
    from mimic_iv_data_pipeline_spark.queries.llmops import _Q219_NOTE_TEMPLATES

    expected = {
        0: [("history of present illness", "fever", False, False, 44),
            ("history of present illness", "chest pain", False, False, 54),
            ("family history", "diabetes", False, True, 94)],
        1: [("history of present illness", "fever", True, False, 35),
            ("past medical history", "hypertension", False, False, 64)],
        2: [("history of present illness", "chest pain", False, False, 61),
            ("history of present illness", "heart failure", True, False, 43)],
        3: [("assessment and plan", "shortness of breath", False, False, 21),
            ("assessment and plan", "fever", True, False, 49)],
    }
    for m, text in enumerate(_Q219_NOTE_TEMPLATES):
        got = sorted(
            (e["section"], e["term"], e["negated"], e["family_context"], e["offset"])
            for e in _extract(text, DEFAULT_TARGETS)
        )
        assert got == sorted(expected[m]), f"template {m} drifted"


def test_canonical_url_is_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) over a seeded mess of
    composed URL variants — a canonical form that moves under its own
    map would break dedup group stability (RFC 3986 §6: normalization
    is a projection)."""
    import random

    from mimic_iv_data_pipeline_spark.functions.url import canonical_url

    rng = random.Random(7)
    schemes = ["http", "HTTP", "https", "HTTPS", "ftp", ""]
    hosts = ["Ex.COM", "www.ex.com", "a.b.co.uk", "localhost", "ex.com:80",
             "ex.com:443", "ex.com:8080", "user:pw@ex.com"]
    paths = ["", "/", "/a", "/a/", "/a/b.html", "/a//b/", "/%7Euser"]
    queries = ["", "?", "?a=1", "?utm_source=x", "?a=1&utm_medium=m&b=2",
               "?gclid=z", "?utm_source=x&utm_campaign=y"]
    frags = ["", "#f", "#a?b"]
    urls = ["not a url", "http://", "//ex.com/x", ""]
    for _ in range(400):
        s = rng.choice(schemes)
        u = (s + "://" if s else "") + rng.choice(hosts) + rng.choice(paths) \
            + rng.choice(queries) + rng.choice(frags)
        urls.append(u)
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        canonical_url(F.col("url")).alias("c1"),
        canonical_url(canonical_url(F.col("url"))).alias("c2"),
    ).collect()
    bad = [(r["c1"], r["c2"]) for r in rows if r["c1"] != r["c2"]]
    assert not bad, f"canonical form not idempotent: {bad[:5]}"


def test_ewma_holt_invariant_to_n_buckets(spark):
    """The hash-bucket count is a pure parallelism knob: every
    (key, t) output must be BITWISE identical for any n_buckets (all
    rows of a key land in one bucket by construction, and the loop
    resets at key boundaries)."""
    import random

    from mimic_iv_data_pipeline_spark.operators.windows import ewma, holt_linear

    rng = random.Random(11)
    rows = [
        (f"k{rng.randrange(17)}", t, rng.choice([None, rng.uniform(-5, 5)]))
        for t in range(600)
    ]
    df = spark.createDataFrame(rows, "k string, t long, x double")

    def emap(n):
        return {
            (r["k"], r["t"]): r["e"]
            for r in ewma(df, "k", "t", "x", 0.25, out_col="e", n_buckets=n).collect()
        }

    base = emap(1)
    assert emap(7) == base and emap(64) == base

    def hmap(n):
        return {
            (r["k"], r["t"]): (r["level"], r["trend"], r["forecast"])
            for r in holt_linear(df, "k", "t", "x", 0.5, 0.25, n_buckets=n).collect()
        }

    hbase = hmap(1)
    assert hmap(7) == hbase and hmap(64) == hbase
