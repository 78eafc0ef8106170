"""Committed certification artifacts must be internally consistent.

Round-4 post-mortem: a stale `chain_onchip_smoke` entry (pre-pinning
numbers) sat next to the post-pinning headline certification in
CPP_NULL_REPORT.json and read as a failing certification. Every on-chip
entry now carries a freshness stamp (tools/certify_onchip.py), and this
test enforces that no committed on-chip entry contradicts the product
bar or lacks its stamp."""

import json
import pathlib

ROOT = pathlib.Path(__file__).resolve().parents[1]


def _onchip_entries():
    report = json.loads((ROOT / "CPP_NULL_REPORT.json").read_text())
    return {k: v for k, v in report.items() if "onchip" in k}


def test_onchip_certifications_are_stamped():
    entries = _onchip_entries()
    assert entries, "no on-chip certification committed"
    for key, entry in entries.items():
        assert entry.get("git_sha"), f"{key}: missing git_sha stamp"
        assert entry.get("date"), f"{key}: missing date stamp"


def test_onchip_certifications_meet_the_bar():
    """Every committed on-chip kernel certification must itself pass the
    -80 dBFS product bar (100% of clips within -80 vs the best-matching
    C++ build) — a committed entry that fails it is stale by definition."""
    for key, entry in _onchip_entries().items():
        best = entry.get("kernel_vs_cpp_best")
        assert best, f"{key}: no kernel_vs_cpp_best stats"
        assert best["pct_within_m80"] == 100.0, (
            f"{key}: committed certification shows "
            f"{best['pct_within_m80']}% within -80 — stale or failing")
        assert best["median_dbfs"] <= -100.0, (
            f"{key}: median {best['median_dbfs']} dBFS is outside the "
            "certified class (<= -100)")
