"""The official bench record line must fit the driver's stdout tail.

The driver captures only the last ~2000 chars of bench stdout and
parses the FINAL JSON line; rounds 6-7 lost the first ~40 queries of
the official per-query record when the full-name dict outgrew that
window (BENCH_r06/r07 ``parsed: null`` — r7 VERDICT next-#1). These
tests pin the compact-final-line contract at worst-case value widths
so HEADLINE growth can never silently regress the record again.
"""

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, abbrev_names, final_record_line


def test_final_line_fits_capture_window():
    # worst case: every query at 999.999s -> 6-digit ms values
    times = {n: 999.999 for n in HEADLINE}
    line = final_record_line(times, "0.1")
    assert len(line) < 1900, (
        f"official bench line is {len(line)} chars; the driver tail "
        f"capture is ~2000 — shorten before growing HEADLINE")
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_suite_total"
    assert len(parsed["queries"]) == len(HEADLINE)
    assert parsed["sf"] == 0.1
    assert parsed["unit"] == "sec"


def test_abbrevs_are_unique_and_expandable():
    ab = abbrev_names()
    assert len(ab) == len(HEADLINE)
    assert len(set(ab.values())) == len(HEADLINE), "abbrev collision"
    # digits survive so TPC-H names stay recognizable
    assert ab["q1_pricing_summary"] == "q1ps"
    # the legend inverts: every official key maps back to one name
    inv = {v: k for k, v in ab.items()}
    assert inv[ab["group_sum"]] == "group_sum"


def test_subset_uses_stable_full_headline_abbrevs():
    # SPARK_GRAFT_ONLY runs must emit the SAME keys as full runs
    times = {"group_sum": 1.0, "dedup_exact": 2.0}
    parsed = json.loads(final_record_line(times, "0.01"))
    ab = abbrev_names()
    assert set(parsed["queries"]) == {ab["group_sum"], ab["dedup_exact"]}
    assert parsed["queries"][ab["dedup_exact"]] == 2000


def test_ms_rounding():
    parsed = json.loads(final_record_line({"group_sum": 0.6125}, "0.1"))
    ab = abbrev_names()
    assert parsed["queries"][ab["group_sum"]] in (612, 613)
    assert isinstance(parsed["queries"][ab["group_sum"]], int)
