"""Per-round sf1 growth gate (VERDICT r10 #6).

The round-10 sf1 full-suite sweep caught a quadratic
(``dedup_embed_cosine_rhp``, 53.6× on 10× data) that the sf0.03–3
scaling corpus missed because the query wasn't in its metric set —
proof that the sweep works as an instrument. This gate
institutionalizes it: every registered NON-REFEREE query's warm wall
at sf1 (``BENCH_SF1_FULL.json``, produced per round from
``tools/gen_bench_sf1.py`` data) must stay within ``MAX_RATIO`` of its
sf0.1 wall (``BENCH_FULL.json``) — 10× data plus slack. Referees
(priority ≥ 70) are exempt by band, though since r11 they are
input-capped to O(1) in sf and pass anyway.

Skips loudly when either artifact is absent (fresh checkout); any
round that regenerates the bench artifacts re-arms the gate. Walls on
this host carry 2–4× hypervisor noise spikes (PERF_NOTES §r10), so the
gate uses the WARM wall (min-biased) and a deliberately loose ratio —
it exists to catch complexity-class regressions (≥ 50× blowups), not
percent-level drift.
"""

from __future__ import annotations

import json
import os

import pytest

from kingsfoil_seed_data_ingestor_spark import plans  # noqa: F401 — populates registry
from kingsfoil_seed_data_ingestor_spark.plans.core import QUERIES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
#: 10× data × measured non-defect inflation. Calibration (r11): the
#: iterative union-find operators legitimately exceed 10× by one extra
#: O(log N) label-propagation round at sf1 (star rounds 1 → 2), and
#: warm walls recorded deep inside the 125-query bench session carry
#: up to ~2× state/GC inflation over an isolated run of the same plan
#: (dedup_fuzzy_apply: 28.5 s in-session vs 15.1 s isolated, probes
#: flat — PERF_NOTES §r11). The regressions this gate exists for
#: measure far past this line: the r10 sweep's catches were 53.6× and
#: 74.5×.
MAX_RATIO = 25.0
#: walls under this are scheduler-floor noise at both SFs — a ratio of
#: two sub-second walls says nothing about complexity class
MIN_BASE_WALL = 0.35


def _load(name: str) -> dict | None:
    try:
        with open(os.path.join(REPO, name)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


#: sf3 vs sf0.1 is 30× data; gating against sf0.1 rather than sf1
#: maximizes class separation (a quadratic reads ~900×, the gate line
#: 30× × 2.5 slack = 75×) so host noise can't blur the verdict the way
#: it could on a 3×-data ratio
MAX_RATIO_SF3 = 75.0


def test_sf3_growth_within_bound():
    """Full-suite sf3 sweep gate (r11): the referee caps made a
    whole-registry sf3 run practical for the first time — when its
    artifact (``BENCH_SF3_FULL.json``, from ``tools/gen_bench_sf1.py
    3`` data) is present, every non-referee query must stay within
    ``MAX_RATIO_SF3`` of its sf0.1 warm wall."""
    base = _load("BENCH_FULL.json")
    sf3 = _load("BENCH_SF3_FULL.json")
    if not base or not sf3:
        pytest.skip("sf3 bench artifact absent — run the sf3 sweep")
    if float(sf3.get("sf", 0)) != 3.0 or float(base.get("sf", 0)) != 0.1:
        pytest.skip("artifacts not at the expected sf pair (0.1 vs 3.0)")
    offenders = []
    checked = 0
    for name, q in QUERIES.items():
        if q.priority >= 70:
            continue
        b = base["queries"].get(name, {}).get("warm")
        s = sf3["queries"].get(name, {}).get("warm")
        if b is None or s is None or b <= 0 or s <= 0:
            continue
        checked += 1
        if b < MIN_BASE_WALL and s < MAX_RATIO_SF3 * MIN_BASE_WALL:
            continue
        ratio = s / max(b, MIN_BASE_WALL)
        if ratio > MAX_RATIO_SF3:
            offenders.append((name, round(b, 2), round(s, 2), round(ratio, 1)))
    assert checked >= 50, "artifacts cover too few queries to mean anything"
    assert not offenders, (
        "queries grew faster than 30× data + slack at sf3 "
        f"(name, sf0.1 warm, sf3 warm, ratio): {offenders}"
    )


def test_sf1_growth_within_bound():
    base = _load("BENCH_FULL.json")
    sf1 = _load("BENCH_SF1_FULL.json")
    if not base or not sf1:
        pytest.skip("bench artifacts absent — run bench.py + the sf1 sweep")
    if float(sf1.get("sf", 0)) != 1.0 or float(base.get("sf", 0)) != 0.1:
        pytest.skip("artifacts not at the expected sf pair (0.1 vs 1.0)")
    offenders = []
    checked = 0
    for name, q in QUERIES.items():
        if q.priority >= 70:  # referee band: labeled non-scale variants
            continue
        b = base["queries"].get(name, {}).get("warm")
        s = sf1["queries"].get(name, {}).get("warm")
        if b is None or s is None or b <= 0 or s <= 0:
            continue  # query added after the artifacts were recorded
        checked += 1
        if b < MIN_BASE_WALL and s < MAX_RATIO * MIN_BASE_WALL:
            continue  # both inside the scheduler floor
        ratio = s / max(b, MIN_BASE_WALL)
        if ratio > MAX_RATIO:
            offenders.append((name, round(b, 2), round(s, 2), round(ratio, 1)))
    assert checked >= 50, "artifacts cover too few queries to mean anything"
    assert not offenders, (
        "queries grew faster than 10× data + slack at sf1 "
        f"(name, sf0.1 warm, sf1 warm, ratio): {offenders}"
    )
