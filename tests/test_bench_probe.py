"""No-Spark tests for bench.py's prior-bench artifact lookup.

Round-13 regression pin for the r12 verdict item 2 / ADVICE (medium):
``_solo_probe`` read only the top-level ``"queries"`` key, but every
driver-recorded ``BENCH_r*.json`` nests the bench payload under
``"parsed"`` (envelope keys ``n/rc/cpus/sf/tail/parsed``), so the
contended-run self-adjudication silently returned ``{}`` on the exact
artifact shape it was built for (BENCH_r12.json: ``"contended": true``
AND ``"solo_probe": {}``). ``_load_prior_bench`` now unwraps the
envelope; these tests feed it both shapes plus a real recorded
artifact when present.
"""
from __future__ import annotations

import json
from pathlib import Path

import pytest

from bench import _load_prior_bench

REPO = Path(__file__).resolve().parents[1]


def _write(tmp_path: Path, name: str, payload: dict) -> Path:
    p = tmp_path / name
    p.write_text(json.dumps(payload))
    return p


def test_driver_envelope_unwrapped(tmp_path):
    """The driver's recorded shape — queries nested under 'parsed'."""
    p = _write(
        tmp_path,
        "BENCH_r98.json",
        {
            "n": 1,
            "rc": 0,
            "cpus": 32,
            "sf": "0.1",
            "tail": "",
            "parsed": {
                "metric": "headline_queries_total",
                "value": 1.5,
                "queries": {"q1_pricing_summary": 1.5},
            },
        },
    )
    fname, queries = _load_prior_bench([p])
    assert fname == "BENCH_r98.json"
    assert queries == {"q1_pricing_summary": 1.5}


def test_raw_bench_line_still_read(tmp_path):
    """bench.py's own raw JSON line — top-level queries."""
    p = _write(
        tmp_path,
        "BENCH_r99.json",
        {"value": 2.0, "queries": {"q_topk": 0.2}},
    )
    fname, queries = _load_prior_bench([p])
    assert fname == "BENCH_r99.json"
    assert queries == {"q_topk": 0.2}


def test_newest_artifact_wins_and_bad_files_skipped(tmp_path):
    older = _write(
        tmp_path, "BENCH_r01.json", {"queries": {"q_old": 1.0}}
    )
    newer = _write(
        tmp_path,
        "BENCH_r02.json",
        {"parsed": {"queries": {"q_new": 2.0}}},
    )
    broken = tmp_path / "BENCH_r03.json"
    broken.write_text("{not json")
    empty = _write(tmp_path, "BENCH_r04.json", {"parsed": {}, "rc": 1})
    fname, queries = _load_prior_bench([older, newer, broken, empty])
    # newest last in the input list; broken/empty newer ones skipped
    assert fname == "BENCH_r02.json"
    assert queries == {"q_new": 2.0}


def test_no_artifacts_returns_empty(tmp_path):
    fname, queries = _load_prior_bench([])
    assert fname is None and queries == {}
    fname, queries = _load_prior_bench([tmp_path / "missing.json"])
    assert fname is None and queries == {}


def test_real_recorded_driver_artifact():
    """The actual artifact class the bug shipped against: whatever
    BENCH_r*.json files the driver has recorded in this repo must
    yield a non-empty per-query dict (r12's had 63 entries)."""
    benches = sorted(REPO.glob("BENCH_r*.json"))
    if not benches:
        pytest.skip("no driver-recorded bench artifacts present")
    fname, queries = _load_prior_bench(benches)
    assert fname is not None
    assert isinstance(queries, dict) and len(queries) > 0
    assert all(
        isinstance(v, (int, float)) for v in queries.values()
    )


def test_canonical_glob_excludes_variant_artifacts(tmp_path):
    """r14 ADVICE fix: the prior-bench lookup must never pick a variant
    artifact (e.g. the 8-core ``BENCH_r13_c8.json``) over the canonical
    round artifact — the riser self-adjudication would otherwise ratio
    against a different-configuration baseline."""
    import fnmatch

    from bench import _CANON_BENCH_GLOB

    assert fnmatch.fnmatch("BENCH_r13.json", _CANON_BENCH_GLOB)
    assert fnmatch.fnmatch("BENCH_r02.json", _CANON_BENCH_GLOB)
    assert not fnmatch.fnmatch("BENCH_r13_c8.json", _CANON_BENCH_GLOB)
    assert not fnmatch.fnmatch("BENCH_r13_extra.json", _CANON_BENCH_GLOB)
    # and the repo's own canonical artifacts all match
    canon = [p.name for p in REPO.glob(_CANON_BENCH_GLOB)]
    assert "BENCH_r13.json" in canon
    assert "BENCH_r13_c8.json" not in canon


def test_max_riser_ratio_pure():
    from bench import _max_riser_ratio

    prior = {"a": 1.0, "b": 0.2, "c": 2.0}
    # b is sub-second in the prior artifact -> excluded from the gate
    assert _max_riser_ratio({"a": 2.5, "b": 5.0, "c": 2.0}, prior) == 2.5
    assert _max_riser_ratio({"a": 1.0, "c": 1.9}, prior) == 1.0
    # no prior entries above the floor -> 0.0
    assert _max_riser_ratio({"b": 9.9}, {"b": 0.2}) == 0.0
