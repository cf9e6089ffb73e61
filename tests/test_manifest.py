"""Driver-window manifest invariants (queries/__init__.py)."""

from __future__ import annotations

from mimic_iv_data_pipeline_spark.queries import _PRIORITY, all_oracles, all_queries


def test_window_entries_all_exist_and_are_oracled():
    """Every _PRIORITY entry must resolve to a registered query, and
    the 50-row driver window must contain ONLY hash-oracled queries —
    a rows-only entry silently downgrades a whole driver slot (the
    r5 q122 lesson)."""
    qs = all_queries()
    oracles = all_oracles()
    missing = [n for n in _PRIORITY if n not in qs]
    assert not missing, f"_PRIORITY names unknown queries: {missing}"
    window = list(qs)[:50]
    unoracled = [n for n in window if n not in oracles]
    assert not unoracled, f"rows-only queries occupy driver slots: {unoracled}"


def test_window_is_exactly_the_manifest_prefix():
    qs = list(all_queries())
    assert qs[: len(_PRIORITY)] == list(_PRIORITY)
    assert len(_PRIORITY) == 50  # the driver records exactly 50 rows


def test_every_oracle_belongs_to_a_registered_query():
    qs = all_queries()
    orphans = [n for n in all_oracles() if n not in qs]
    assert not orphans
