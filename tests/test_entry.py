"""Driver-contract smoke tests: entry(), queries()/oracle_sql()
consistency, and a fast oracle spot-check at sf0.001."""

from __future__ import annotations

import datetime as dt
import math
import os
import sys
from decimal import Decimal

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# fast spot-check subset (full corpus: tools/check_corpus.py)
SPOT = [
    "a2_wide_agg", "j1_band_join", "j3_asof_nearest", "w1_row_number",
    "a8_daily_rollup", "t1_tumbling_window", "dedup_exact", "ann_cosine_topk",
    "mleval_auc",
]


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert "sum_qty" in df.columns


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30


def test_canonical_operators_inside_driver_window():
    # The driver evaluates only the first 50 queries() entries; every
    # distinct operator's canonical entry must sit inside that window.
    first50 = set(list(entrymod.queries())[:50])
    canonical = [
        "curate_corpus",
        "a2_wide_agg",
        # band-join seat: the bucketed twin (hash-equality-proven
        # against j1_band_join's oracle) holds it since the late-r6
        # third wave; plain j1_band_join is tail + bench target.
        "j1_band_join_bucketed",
        # the near-dup twins (identical oracle) swap seats round to
        # round: r16 seats the exact twin (LSH+residual held r15)
        "embedding_near_dup_exact",
        "export_ids", "layout_zorder_scan",
        "scd2_history", "sketch_rollup_union", "j6_interval_overlap",
        "t6_session_window", "j8_asof_backward",
        "dq_expectations", "profile_drift_orders",
        "w3_rank_family", "dedup_spans",
        "text_heavy_hitters",
        "privacy_k_anonymity",
        "tfidf_terms", "a18_grouping_sets",
        "j7_bloom_prefilter",
        # round-11 survivors of the r12-r15 rotations (the rest of
        # tranche 6 demoted with head-retained machinery per the
        # corpus._TAIL ledgers)
        "w4_ratio_to_report", "w9_rolling_distinct",
        # round-12 tranche-7 survivors of the r13 rotation (the rest
        # demoted with head-retained machinery per corpus._TAIL's
        # round-13 ledger; every one oracle-swept in tail each run)
        "ann_ivf_invariants",
        "text_bpe_invariants", "classifier_trained_invariants",
        "export_shuffled", "sample_per_group_docs",
        "text_bpe_pretokenize",
        "doc_quantile_normalize",
        "mleval_calibration",
        # round-13 tranche-8 survivors of the r14/r15 rotations (the
        # rest demoted with head-retained machinery per corpus._TAIL's
        # ledgers; every one oracle-swept in tail each run)
        "skyline_parts", "hierarchy_roots",
        # round-15 promotions (VERDICT r14 item 1): the two r14-born
        # IVF lifecycle newborns took their mandatory first driver
        # seats, went red on the decimal canonicalization artifact,
        # and KEEP their seats through the r16 rotation until the
        # post-BIGINT-fix reseat banks a green row (VERDICT r15
        # item 1).
        "ann_ivf_refresh_invariants", "ann_ivf_merge_invariants",
        # round-16 promotions (VERDICT r15 item 3): all six r15-born
        # newborns' mandatory first seats (one round ahead of the r17
        # deadline)
        "decontaminate_against", "decontaminate_semantic",
        "leakage_safe_splits", "quality_gopher_rules",
        "curate_token_budget", "dedup_keep_best",
        # round-16 freshness re-seats: the deferred tranche-6 pair
        # (last green r11) and the five stalest remaining oracle rows
        # (SURVEY §2 rows A5/F10/F12/F15/J2, last green r2)
        "set_ops_nations", "melt_lineitem",
        "a5_conditional_agg", "f10_split_count", "f12_timestamp_parse",
        "f15_to_json", "j2_band_join_3way",
    ]
    missing = [n for n in canonical if n not in first50]
    assert not missing, f"canonical entries outside driver window: {missing}"


# One-round sanctioned exception (VERDICT r11 item 2, r12 only): the
# two oracle-less detail twins (text_bpe_train_apply,
# quality_classifier_trained) got their single rows-only driver seat
# in r12 (recorded in CORRECTNESS_r12.json) and returned to tail in
# the r13 rotation, so this set is EMPTY again — the head-oracle
# guard below is fully strict: every driver-window seat must carry a
# DuckDB oracle, no exceptions. Their *_invariants summary twins
# (oracle-exact, r12+r13 head seats) plus the BPE/classifier floors
# in this file carry the detail twins' evidence permanently.
ROWS_ONLY_HEAD_SANCTIONED_R12: set[str] = set()


def test_every_head_entry_is_oracle_bearing():
    # VERDICT r10 item 5: the rows-only allowlist in
    # test_corpus_tail.py covers only _TAIL; this closes the head
    # side — every driver-window seat must carry a DuckDB oracle so
    # the driver's check is the full rows+schema+hash gate, never the
    # weaker rows-only fallback (modulo the named one-round exception
    # above, which exists precisely to give those two entries their
    # single weaker row).
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    head = list(qs)[:50]
    missing = [
        n for n in head
        if n not in oracles and n not in ROWS_ONLY_HEAD_SANCTIONED_R12
    ]
    assert not missing, f"head entries without an oracle: {missing}"
    # Tripwire (code-review r12): the exception is valid ONLY while
    # the delegation condition it rests on holds — each sanctioned
    # rows-only seat's *_invariants summary twin must sit in the SAME
    # head window with a real oracle (that twin is the evidence the
    # drain plan delegates to). The r13 rotation returns these two to
    # tail; once the set is emptied this loop is a no-op and the
    # guard is fully strict again.
    twin_of = {
        "text_bpe_train_apply": "text_bpe_invariants",
        "quality_classifier_trained": "classifier_trained_invariants",
    }
    assert set(ROWS_ONLY_HEAD_SANCTIONED_R12) <= set(twin_of), (
        "sanctioned rows-only set grew beyond the VERDICT r11 item 2 "
        "pair — new oracle-less head seats are not allowed"
    )
    for name in ROWS_ONLY_HEAD_SANCTIONED_R12:
        if name in head:
            twin = twin_of[name]
            assert twin in head and twin in oracles, (
                f"{name} holds its sanctioned rows-only seat but its "
                f"evidence twin {twin} is not an oracle-bearing head "
                "entry — the delegation the exception rests on is "
                "broken"
            )


def test_duplicate_query_name_raises_at_registration():
    # A silent _REGISTRY overwrite would shadow an oracle and shift
    # the 50-seat window without any test noticing (VERDICT r10
    # item 5) — registration must fail loudly at import time.
    from healthcare_data_lakehouse_using_gcp_spark import corpus

    existing = next(iter(corpus._REGISTRY))
    original = corpus._REGISTRY[existing]
    with pytest.raises(ValueError, match="duplicate corpus query name"):

        @corpus.query(existing, None)
        def _clone(spark, sf_dir):  # pragma: no cover - never runs
            raise AssertionError
    # the original registration is untouched
    assert corpus._REGISTRY[existing] is original


# (operator, avg-recall floor) — floors sit under the measured
# sf0.001/sf0.01 values (lsh .57/.43, ivf .70/.80, pq .43/.43 with
# r6 residual codebooks — was .30/.40 raw — rerank .70/.77) with
# slack for dial/data changes
ANN_RECALL_FLOORS = [
    ("ann_lsh_topk", 0.25),
    # sign-LSH in its intended high-cosine regime (planted near-dup
    # cluster, VERDICT r5 item 5): recall must be near-perfect —
    # measured 1.0 at sf0.001/sf0.01
    ("ann_lsh_planted", 0.9),
    ("ann_ivf_topk", 0.55),
    ("ann_ivf_pq_topk", 0.25),
    ("ann_ivf_pq_rerank", 0.55),
]


@pytest.mark.slow  # heavy battery: default gate skips; round-close full suite runs it
def test_ann_entries_embed_truth_and_clear_recall_floor(spark):
    """VERDICT r4 item 1: the ANN corpus entries certify their own
    recall — every row carries in_exact_topk membership vs the exact
    brute-force top-k and a per-query recall_at_k; the floors here are
    what a green driver row attests to. Also asserts the two-stage
    rerank entry recalls at least as well as its raw-ADC stage (the
    exact-rerank stage can only fix ranking, never lose shortlist
    members that belong)."""
    if not os.path.isdir(SF_DIR):
        pytest.skip("driver testdata unavailable")
    qs = entrymod.queries()
    avg = {}
    for name, floor in ANN_RECALL_FLOORS:
        rows = qs[name](spark, SF_DIR).collect()
        assert rows, name
        assert {"in_exact_topk", "recall_at_k"} <= set(rows[0].asDict())
        per_q = {r["query_id"]: r["recall_at_k"] for r in rows}
        avg[name] = sum(per_q.values()) / len(per_q)
        assert avg[name] >= floor, f"{name}: avg recall {avg[name]:.3f} < {floor}"
        hits = sum(1 for r in rows if r["in_exact_topk"])
        # in_exact_topk must be consistent with the recall column
        assert hits == round(sum(10 * v for v in per_q.values()))
    assert avg["ann_ivf_pq_rerank"] >= avg["ann_ivf_pq_topk"]


def test_bpe_entry_invariants(spark):
    """The rows-only text_bpe_train_apply entry carries its own
    invariants: per doc, n_pretokens ≤ n_bpe_tokens ≤ n_chars_nospace
    (merges only shrink the char split and never cross word
    boundaries), and the learned merges actually compress real text
    corpus-wide (tokens strictly fewer than characters)."""
    if not os.path.isdir(SF_DIR):
        pytest.skip("driver testdata unavailable")
    rows = entrymod.queries()["text_bpe_train_apply"](spark, SF_DIR).collect()
    assert rows
    bad = [
        r
        for r in rows
        if not (r["n_pretokens"] <= r["n_bpe_tokens"] <= r["n_chars_nospace"])
    ]
    assert not bad, bad[:3]
    total_tok = sum(r["n_bpe_tokens"] for r in rows)
    total_chars = sum(r["n_chars_nospace"] for r in rows)
    assert total_tok < 0.9 * total_chars


@pytest.mark.slow  # heavy battery: default gate skips; round-close full suite runs it
def test_quality_classifier_entry_agrees_with_teacher(spark):
    """The rows-only quality_classifier_trained entry's invariant:
    the learned model reproduces its weak teacher's keep/drop
    decision on a clear majority of the corpus (it was trained on
    exactly those labels), and emits a probability for every doc
    with tokens."""
    if not os.path.isdir(SF_DIR):
        pytest.skip("driver testdata unavailable")
    rows = entrymod.queries()["quality_classifier_trained"](spark, SF_DIR).collect()
    assert rows
    agree = sum(1 for r in rows if int(bool(r["keep"])) == r["weak_label"])
    assert agree / len(rows) >= 0.8, f"teacher agreement {agree}/{len(rows)}"
    assert all(
        r["quality_prob"] is not None for r in rows if r["weak_label"] is not None
    ) or any(r["quality_prob"] is not None for r in rows)


def _norm(v):
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


@pytest.mark.parametrize("name", SPOT)
def test_spot_oracle_parity(spark, name):
    if not os.path.isdir(SF_DIR):
        pytest.skip("driver testdata unavailable")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    res = con.execute(oracles[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    order_s = sorted(range(len(scols)), key=lambda i: scols[i])
    order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
    key = lambda t: tuple((x is None, str(x)) for x in t)  # noqa: E731
    sn = sorted((tuple(_norm(r[i]) for i in order_s) for r in srows), key=key)
    on = sorted((tuple(_norm(r[i]) for i in order_o) for r in orows), key=key)
    assert sn == on


def test_operator_map_references_resolve():
    """Every OPERATOR_MAP value must be a registered corpus entry —
    the judge reads this map as the SURVEY §2 → query-key inventory,
    so a renamed entry leaving a dangling reference would silently
    misreport coverage (r13)."""
    from healthcare_data_lakehouse_using_gcp_spark import corpus

    qs = set(corpus.queries())
    dangling = [
        (row, name)
        for row, names in corpus.OPERATOR_MAP.items()
        for name in names
        if name not in qs
    ]
    assert not dangling, f"OPERATOR_MAP references missing entries: {dangling}"
    # and the map stays non-trivially populated
    assert len(corpus.OPERATOR_MAP) >= 60
