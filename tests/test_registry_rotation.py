"""Driver-window rotation invariants (VERDICT r7 #8).

The external driver hash-checks only the first ``DRIVER_WINDOW`` of
``ordered_queries()``. The rotation policy in ``plans/core.py`` slides
a deterministic slice of overflow queries into that window each round
so the driver's independent check eventually touches every family
variant. These tests pin the properties that make rotation safe:

* flagship bands (priority < 50: reference parity, streaming twins,
  family flagships) are NEVER displaced out of the window;
* exactly the promoted slice enters; an equal number of band-≥50
  variants exits (conservation — the window stays full);
* every promoted query carries a full DuckDB value-hash oracle, so the
  driver's check on it is the strong form;
* the rotation is a pure function of ``ROTATION_ROUND`` (deterministic
  across processes) and over successive rounds covers the whole
  overflow band (no variant is starved).
"""

from __future__ import annotations

from kingsfoil_seed_data_ingestor_spark import plans  # noqa: F401 — populates registry
from kingsfoil_seed_data_ingestor_spark.plans import core


def _base_order():
    return sorted(core.QUERIES.values(), key=lambda q: (q.priority, q.seq))


def test_rotation_preserves_flagship_bands():
    window = {q.name for q in core.ordered_queries()[: core.DRIVER_WINDOW]}
    for q in _base_order():
        if q.priority < 50:
            assert q.name in window, f"flagship {q.name} displaced by rotation"


def test_rotation_conservation_and_oracles():
    base_window = {q.name for q in _base_order()[: core.DRIVER_WINDOW]}
    rot_window = {q.name for q in core.ordered_queries()[: core.DRIVER_WINDOW]}
    assert len(rot_window) == core.DRIVER_WINDOW
    entered = rot_window - base_window
    exited = base_window - rot_window
    assert entered == set(core.rotated_in_names())
    assert len(entered) == len(exited) == min(
        core.ROTATION_SLOTS, len(entered) or core.ROTATION_SLOTS
    )
    for name in entered:
        assert core.QUERIES[name].oracle is not None, (
            f"promoted {name} lacks an oracle — rotation must only promote "
            "hash-checkable queries"
        )


def test_rotation_covers_overflow_over_rounds(monkeypatch):
    overflow = [
        q.name for q in _base_order()[core.DRIVER_WINDOW :] if q.priority >= 50
    ]
    seen: set[str] = set()
    rounds_needed = -(-len(overflow) // core.ROTATION_SLOTS)  # ceil
    for rnd in range(
        core._ROTATION_BASE_ROUND, core._ROTATION_BASE_ROUND + rounds_needed
    ):
        monkeypatch.setattr(core, "ROTATION_ROUND", rnd)
        names = core.rotated_in_names()
        assert len(names) == len(set(names)) == core.ROTATION_SLOTS
        seen.update(names)
    assert seen == set(overflow), (
        "sliding slice must touch every overflow variant across rounds"
    )


def test_rotation_round_tracks_artifacts(monkeypatch):
    """VERDICT r8 #4: the round is DERIVED, not hand-bumped. The env
    override wins; else the newest CORRECTNESS_r{N}.json implies round
    N+1; and the fallback constant must never lag the artifacts (the
    staleness this guard exists to catch)."""
    import glob
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    artifact_rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    if artifact_rounds:
        assert core.ROTATION_ROUND >= max(artifact_rounds) + 1, (
            "rotation round lags the newest correctness artifact — "
            "the window froze"
        )
        # The FALLBACK constant is deliberately NOT asserted against the
        # artifacts here (VERDICT r9 #1): when artifacts exist the live
        # round is derived from them (the assert above proves tracking),
        # and the constant only matters on artifact-less fresh checkouts
        # — where this branch doesn't run. Asserting it here made the
        # suite go red by construction the moment a round's driver wrote
        # its CORRECTNESS artifact.
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "123")
    assert core._detect_round() == 123
    monkeypatch.delenv("SPARK_GRAFT_ROUND")
    assert core._detect_round() == core.ROTATION_ROUND


def test_rotation_deterministic():
    assert core.rotated_in_names() == core.rotated_in_names()
    a = [q.name for q in core.ordered_queries()]
    b = [q.name for q in core.ordered_queries()]
    assert a == b
