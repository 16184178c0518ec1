"""bench.py emission contract: the driver parses ONLY the final
stdout line and captures a 2,000-char tail — the headline must always
fit, and an overflow must degrade gracefully (ADVICE r10: never
assert-crash a completed multi-minute run)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CONTROLS, HEADLINE, SF1_SUBSET, finalize_headline_line  # noqa: E402


def _base_out(queries):
    return {
        "metric": "headline_total_wall",
        "value": 12.345,
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "reps": 3,
        "max_reps": 7,
        "protocol": "min_of_adaptive_reps",
        "load_1m_at_exit": 1.0,
    }


def test_normal_headline_passes_through_untrimmed(capsys):
    out = _base_out({n: 0.5 for n in HEADLINE})
    line = finalize_headline_line(out, 12.345)
    parsed = json.loads(line)
    assert parsed["queries"] and parsed["value"] == 12.345
    assert len(line) <= 1500
    assert capsys.readouterr().err == ""


def test_current_basket_headline_fits_with_margin():
    # the real basket with realistic float widths must sit WELL under
    # the 1,500 cap (≥30% headroom) so growth never silently clips
    out = _base_out({n: 123.456 for n in HEADLINE})
    out["controls_ratio_vs"] = ["BENCH_r10.json", 1.092]
    out["sf1_total"] = 123.456
    out["sf3_total"] = 123.456
    out["sf3_x3_worst"] = ["attribution_last_touch", 3.03]
    line = finalize_headline_line(out, 123.456)
    assert json.loads(line)["queries"]
    assert len(line) <= 1050, f"{len(line)} chars — headroom eroding"


def test_overflow_drops_queries_map_not_the_run(capsys):
    out = _base_out({f"q{i:04d}": 1.234 for i in range(200)})
    line = finalize_headline_line(out, 12.345)
    parsed = json.loads(line)
    assert len(line) <= 1500
    assert parsed["value"] == 12.345  # the run's scalars survive
    assert "queries" not in parsed
    assert parsed["queries_dropped_see_bench_detail"] is True
    assert "bench_warning" in capsys.readouterr().err


def test_pathological_overflow_keeps_contract_scalars(capsys):
    out = _base_out({f"q{i:04d}": 1.234 for i in range(200)})
    out["giant"] = "x" * 5000  # even the trimmed dict would overflow
    line = finalize_headline_line(out, 12.345)
    parsed = json.loads(line)
    assert len(line) <= 1500
    assert parsed["metric"] == "headline_total_wall"
    assert parsed["value"] == 12.345
    assert "bench_warning" in capsys.readouterr().err


def test_basket_membership_contract():
    # VERDICT r10 item 4 (24 from r11) + late-r12 additions: basket =
    # 26 queries incl. the as-of attribution plan, a sub-linear ANN
    # representative, the 2-D skyline window scan, and the first
    # iterative-algorithm row (pointer-doubling hierarchy flatten);
    # normalization controls stay members; sf1 subset ⊆ headline.
    # r14 (VERDICT r13 item 4): the ANN representative is the
    # serving-path ann_ivf_search row (build untimed), replacing the
    # fixed-cost-dominated ann_ivf_topk pipeline row.
    assert len(HEADLINE) == 26
    assert "attribution_last_touch" in HEADLINE
    assert "ann_ivf_search" in HEADLINE
    assert "ann_ivf_topk" not in HEADLINE
    assert "skyline_parts" in HEADLINE
    assert "hierarchy_roots" in HEADLINE
    assert set(CONTROLS) <= set(HEADLINE)
    assert set(SF1_SUBSET) <= set(HEADLINE)
    assert len(set(HEADLINE)) == len(HEADLINE)
    # every basket entry must exist in the corpus registry — except
    # the special serving row, whose callable main() installs itself
    from healthcare_data_lakehouse_using_gcp_spark import corpus

    qs = corpus.queries()
    missing = [
        n for n in HEADLINE if n not in qs and n != "ann_ivf_search"
    ]
    assert not missing, missing
