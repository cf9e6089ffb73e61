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


EVERY_ROUND_CORE = {
    "q03_revenue_by_nation", "q04_semi_join", "q18_readmission_label",
    "q19_asof_join", "q20_ffill_bfill", "q32_pivot_wide",
    "q34_dedup_exact", "q42_cosine_topk",
}
ALTERNATE_ROUND_CORE = {
    "q08_outer_join_fill", "q14_code_mapping", "q15_mode_per_group",
    "q17_topk_per_group", "q26_vocab_build", "q39_ngram_jaccard",
    "q45_set_ops",
}


def _driver_row_age():
    """name -> last round with a driver row, AS OF MANIFEST AUTHORING.

    The manifest is written before the round's driver run; once the
    driver executes it, CORRECTNESS_r{N}.json gives every window entry
    a fresh row, which would make the oldest-first assertion compare
    the manifest against a state that did not exist when it was
    authored. So files from ``_MANIFEST_ROUND`` onward are excluded —
    an EXPLICIT cut (the manifest declares the round it targets), so
    the pin holds before and after the driver runs, including a
    partial file from a crashed driver run.
    """
    import glob
    import json
    from pathlib import Path

    from mimic_iv_data_pipeline_spark.queries import _MANIFEST_ROUND

    repo = Path(__file__).resolve().parent.parent
    last: dict[str, int] = {}
    for f in sorted(glob.glob(str(repo / "CORRECTNESS_r*.json"))):
        rnd = int("".join(ch for ch in Path(f).stem.split("_r")[1] if ch.isdigit()))
        if rnd >= _MANIFEST_ROUND:
            continue
        d = json.load(open(f))
        rows = d if isinstance(d, dict) else {r["name"]: r for r in d}
        for k in rows:
            last[k] = max(last.get(k, 0), rnd)
    return last


def test_every_round_core_present():
    """The 8-query every-round core occupies a window slot in EVERY
    round's manifest (the alternate 7 run in even rounds)."""
    missing = EVERY_ROUND_CORE - set(_PRIORITY)
    assert not missing, f"every-round core absent from window: {missing}"


def test_never_checked_lead_the_window():
    """Every oracled query without ANY driver row must be in the window
    (first rows are the most valuable slot use; the r6 verdict's 33-query
    backlog is exactly what this prevents from re-accumulating)."""
    last = _driver_row_age()
    never = [n for n in all_oracles() if n not in last]
    out = [n for n in never if n not in _PRIORITY]
    assert not out, f"never-driver-checked queries left outside the window: {out}"


def test_aged_slots_are_oldest_first():
    """Rotation policy pin (r6 verdict item 2): after never-checked
    queries and the core, every remaining window slot must go to the
    OLDEST eligible (oracled, non-core) queries — oldest driver round
    first, name order within a round. No slot may skip past a staler
    query, so no driver row can age unboundedly while fresher ones
    re-earn rows."""
    last = _driver_row_age()
    oracles = set(all_oracles())
    core = EVERY_ROUND_CORE | ALTERNATE_ROUND_CORE
    window = set(_PRIORITY)
    rotation_in = [
        n for n in _PRIORITY if n in last and n not in core and n in oracles
    ]
    candidates = [n for n in oracles if n in last and n not in core]
    oldest = sorted(candidates, key=lambda n: (last[n], n))[: len(rotation_in)]
    assert sorted(rotation_in, key=lambda n: (last[n], n)) == oldest, (
        "rotation slots are not the oldest eligible queries: "
        f"window has {sorted(rotation_in)}, oldest cohort is {sorted(oldest)}"
    )
    # and rotation entries must not displace never-checked ones
    never = [n for n in oracles if n not in last]
    assert set(never) <= window
