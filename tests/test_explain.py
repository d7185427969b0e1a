"""M3 stacking strategy + per-row prediction explanation — reference parity.

The stacking combiner (ensemble_predictor.py:305-323), per-model confidence
(ensemble_predictor.py:324-341) and the top-contributing-factor explanation
(ensemble_predictor.py:371-435) are replayed independently in pure Python on
hand-built rows and compared EXACTLY (both sides are IEEE doubles folded in
the same order).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from realtime_fraud_detection_spark.functions import scoring as S
from realtime_fraud_detection_spark.ml.ensemble import (
    apply_stacking,
    model_contributions,
)

MODELS = ["xgboost", "lstm", "bert", "gnn", "isolation_forest"]
MULT = {"xgboost": 1.0, "lstm": 0.8, "bert": 0.7, "gnn": 0.6, "isolation_forest": 0.5}
WEIGHTS = {"xgboost": 0.40, "lstm": 0.25, "bert": 0.15, "gnn": 0.15, "isolation_forest": 0.05}


def _py_conf(p: float, m: str) -> float:
    return min(1.0, abs(p - 0.5) * 2 * MULT[m])


def _py_stacking(preds: dict[str, float]) -> tuple[float, float]:
    """Reference _stacking_ensemble, same fold order as the Spark expression."""
    weighted = None
    total = None
    for m in MODELS:
        c = _py_conf(preds[m], m)
        t = preds[m] * c
        weighted = t if weighted is None else weighted + t
        total = c if total is None else total + c
    if total > 0.0:
        prob = weighted / total
    else:
        tw = round(sum(WEIGHTS.values()), 9)
        prob = None
        for m in MODELS:
            t = preds[m] * (WEIGHTS[m] / tw)
            prob = t if prob is None else prob + t
    return prob, total / len(MODELS)


@pytest.fixture(scope="module")
def pred_rows(spark):
    rows = [
        # (id, xgb, lstm, bert, gnn, iforest, blacklisted)
        (1, 0.92, 0.85, 0.70, 0.60, 0.55, False),  # confident fraud
        (2, 0.10, 0.20, 0.30, 0.40, 0.45, False),  # confident legit
        (3, 0.50, 0.50, 0.50, 0.50, 0.50, False),  # zero confidence → fallback
        (4, 0.95, 0.05, 0.95, 0.05, 0.50, False),  # disagreement
        (5, 0.30, 0.30, 0.30, 0.30, 0.30, True),   # blacklist override
    ]
    return spark.createDataFrame(
        rows, "id int, xgb double, lstm double, bert double, gnn double, iforest double, m_is_blacklisted boolean"
    )


def _score_cols():
    return {
        "xgboost": F.col("xgb"),
        "lstm": F.col("lstm"),
        "bert": F.col("bert"),
        "gnn": F.col("gnn"),
        "isolation_forest": F.col("iforest"),
    }


def test_stacking_matches_python_replay(pred_rows):
    out = {
        r["id"]: r
        for r in apply_stacking(pred_rows, _score_cols()).collect()
    }
    for r in pred_rows.collect():
        preds = {
            "xgboost": r["xgb"], "lstm": r["lstm"], "bert": r["bert"],
            "gnn": r["gnn"], "isolation_forest": r["iforest"],
        }
        prob, conf = _py_stacking(preds)
        got = out[r["id"]]
        assert got["stacking_prob"] == prob, r["id"]
        assert got["stacking_confidence"] == conf, r["id"]


def test_stacking_hand_computed_values(pred_rows):
    """One row fully hand-computed, independent of the replay helper."""
    r = {x["id"]: x for x in apply_stacking(pred_rows, _score_cols()).collect()}[1]
    # confs: xgb |0.92-0.5|*2*1.0=0.84; lstm 0.7*0.8=0.56; bert 0.4*0.7=0.28;
    # gnn 0.2*0.6=0.12; iforest 0.1*0.5=0.05  → total 1.85
    # weighted: 0.92*0.84 + 0.85*0.56 + 0.70*0.28 + 0.60*0.12 + 0.55*0.05
    confs = [0.84, 0.7 * 0.8, 0.4 * 0.7, 0.2 * 0.6, 0.1 * 0.5]
    preds = [0.92, 0.85, 0.70, 0.60, 0.55]
    weighted = confs[0] * preds[0]
    total = confs[0]
    for c, p in zip(confs[1:], preds[1:]):
        weighted += p * c
        total += c
    assert r["stacking_prob"] == pytest.approx(weighted / total, abs=1e-12)
    assert r["stacking_confidence"] == pytest.approx(total / 5, abs=1e-12)
    assert r["stacking_decision"] == "REVIEW"  # prob ~0.84, conf 0.37 < 0.7


def test_stacking_zero_confidence_falls_back_to_weighted_average(pred_rows):
    """Every model at exactly 0.5 → Σconf = 0 → weighted-average fallback
    (ensemble_predictor.py:309-311): prob = 0.5, confidence = 0."""
    r = {x["id"]: x for x in apply_stacking(pred_rows, _score_cols()).collect()}[3]
    assert r["stacking_prob"] == 0.5
    assert r["stacking_confidence"] == 0.0
    assert r["stacking_decision"] == "REVIEW"  # zero confidence forces REVIEW


def test_stacking_blacklist_override(pred_rows):
    r = {x["id"]: x for x in apply_stacking(pred_rows, _score_cols()).collect()}[5]
    assert r["stacking_decision"] == "DECLINE"


def test_strategy_selection_parity(pred_rows):
    """The three M3 strategies are function swaps over the same score dict —
    on a unanimous-fraud row all agree directionally."""
    from realtime_fraud_detection_spark.ml.ensemble import apply_ensemble, majority_vote

    scores = _score_cols()
    df = apply_stacking(apply_ensemble(pred_rows, scores), scores).withColumn(
        "vote", majority_vote(scores)
    )
    r = {x["id"]: x for x in df.collect()}[1]
    assert r["ensemble_prob"] > 0.7
    assert r["stacking_prob"] > 0.7
    assert r["vote"]  # 5/5 models above threshold


def test_model_contributions_parity(pred_rows):
    out = pred_rows.select(
        "id", model_contributions(_score_cols()).alias("mc")
    ).collect()
    for row in out:
        preds = None
        for entry in row["mc"]:
            m = entry["model"]
            src = {r["id"]: r for r in pred_rows.collect()}[row["id"]]
            preds = {
                "xgboost": src["xgb"], "lstm": src["lstm"], "bert": src["bert"],
                "gnn": src["gnn"], "isolation_forest": src["iforest"],
            }
            assert entry["prediction"] == preds[m]
            assert entry["weight"] == WEIGHTS[m]
            assert entry["contribution"] == preds[m] * (WEIGHTS[m] / 1.0)
            assert entry["confidence"] == _py_conf(preds[m], m)
        assert [e["model"] for e in row["mc"]] == MODELS  # dict order kept


# ---------------------------------------------------------------------------
# Per-row factor explanation
# ---------------------------------------------------------------------------
def test_contribution_explanation_hand_built(spark):
    """Hand-built transactions → explanation column vs an independent Python
    replay of term computation + (desc, name-asc) ordering + top-5 slice."""
    rows = [
        # (id, prior, user_risk, new_acct, kyc, mrisk, blacklisted, fraud_rate,
        #  high_cat, large, new_dev, night, in_hours)
        (1, 0.8, 0.9, True, False, "high", True, 0.10, True, True, True, True, False),
        (2, 0.1, 0.2, False, True, "low", False, 0.01, False, False, False, False, True),
        (3, 0.0, 0.0, False, True, "low", False, 0.0, False, False, False, False, True),
        (4, 0.4, 0.5, False, True, "medium", False, 0.08, True, False, True, False, True),
    ]
    df = spark.createDataFrame(
        rows,
        "id int, prior double, user_risk double, new_acct boolean, kyc boolean, "
        "mrisk string, blk boolean, fr double, hcat boolean, lrg boolean, "
        "ndev boolean, night boolean, in_hours boolean",
    )
    terms = S.rule_score_terms(
        prior_score=F.col("prior"),
        user_risk_score=F.col("user_risk"),
        is_new_account=F.col("new_acct"),
        is_kyc_verified=F.col("kyc"),
        merchant_risk_level=F.col("mrisk"),
        merchant_is_blacklisted=F.col("blk"),
        merchant_fraud_rate=F.col("fr"),
        is_high_risk_category=F.col("hcat"),
        is_large_for_user=F.col("lrg"),
        is_new_device=F.col("ndev"),
        is_night_time=F.col("night"),
        within_merchant_hours=F.col("in_hours"),
    )
    out = {
        r["id"]: [(e["factor"], e["contribution"]) for e in r["expl"]]
        for r in df.select(
            "id", S.contribution_explanation(terms, top_n=5).alias("expl")
        ).collect()
    }

    def replay(prior, user_risk, new_acct, kyc, mrisk, blk, fr, hcat, lrg, ndev, night, in_hours):
        t = {
            "prior_score": 0.5 * prior,
            "user_risk": user_risk * 0.2,
            "new_account": 0.10 if new_acct else 0.0,
            "kyc_unverified": 0.15 if not kyc else 0.0,
            "merchant_risk_level": {"high": 0.20, "medium": 0.10}.get(mrisk, 0.0),
            "merchant_blacklisted": 0.40 if blk else 0.0,
            "merchant_fraud_rate": 2.0 * fr if fr > 0.05 else 0.0,
            "high_risk_category": 0.15 if hcat else 0.0,
            "large_for_user": 0.15 if lrg else 0.0,
            "new_device": 0.10 if ndev else 0.0,
            "night_time": 0.05 if night else 0.0,
            "outside_merchant_hours": 0.10 if not in_hours else 0.0,
        }
        ranked = sorted(
            ((k, v) for k, v in t.items() if v != 0.0),
            key=lambda kv: (-kv[1], kv[0]),
        )
        return ranked[:5]

    for (i, *args) in rows:
        assert out[i] == replay(*args), f"row {i}"

    # structural pins: empty for all-zero rows; top factor of the loaded row
    assert out[3] == []
    assert out[1][0] == ("merchant_blacklisted", 0.40)


def test_explanation_is_pure_expression(spark):
    """No Python crossing: the plan contains no Python/Arrow eval nodes —
    keeps the suite's pinned crossing count at five."""
    import contextlib
    import io

    df = spark.createDataFrame([(0.7,)], "prior double")
    terms = {"a": 0.5 * F.col("prior"), "b": F.lit(0.1)}
    out = df.select(S.contribution_explanation(terms).alias("e"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="formatted")
    plan = buf.getvalue()
    # createDataFrame's scan mentions applySchemaToPythonRDD — assert on the
    # actual eval-node names, which mark a real executor-side crossing
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "FlatMapGroupsInPandas"):
        assert node not in plan


def test_ensemble_explain_query_replay_parity(spark):
    """The ensemble_explain suite query end-to-end vs a pure-Python replay on
    the sf0.001 events fixture (sampled): stacking prob/conf (rounded the way
    Spark rounds — decimal HALF_UP on the exact double), decision, and both
    explanation arrays, compared EXACTLY."""
    from decimal import ROUND_HALF_UP, Decimal

    from realtime_fraud_detection_spark.sources.testdata import load_table
    from realtime_fraud_detection_spark.suite.mlops_q import q_ensemble_explain

    sf = "/root/testdata/sf0.001"
    got = {r["event_id"]: r for r in q_ensemble_explain(spark, sf).collect()}
    raw = load_table(spark, sf, "events").select(
        "event_id", "value", "user_id", "event_type", F.hour("ts").alias("h")
    ).limit(200).collect()

    def r6(x: float) -> float:
        return float(Decimal(x).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    for e in raw:
        preds = {
            "xgboost": (e["event_id"] * 37 % 1000) / 1000.0,
            "lstm": (e["event_id"] * 59 % 1000) / 1000.0,
            "bert": (e["event_id"] * 83 % 1000) / 1000.0,
            "gnn": (e["event_id"] * 101 % 1000) / 1000.0,
            "isolation_forest": (e["event_id"] * 131 % 1000) / 1000.0,
        }
        prob, conf = _py_stacking(preds)
        g = got[e["event_id"]]
        assert g["stacking_prob"] == r6(prob), e["event_id"]
        assert g["stacking_confidence"] == r6(conf), e["event_id"]
        # decision replay on the rounded values
        p_, c_ = r6(prob), r6(conf)
        want = (
            "REVIEW" if c_ < 0.7 else
            "DECLINE" if p_ >= 0.95 else
            "REVIEW" if p_ >= 0.8 else
            "APPROVE_WITH_MONITORING" if p_ >= 0.6 else "APPROVE"
        )
        assert g["decision"] == want
        # model_contributions replay
        for entry in g["model_contributions"]:
            m = entry["model"]
            assert entry["prediction"] == preds[m]
            assert entry["contribution"] == preds[m] * (WEIGHTS[m] / 1.0)
            assert entry["confidence"] == _py_conf(preds[m], m)
        # top-factors replay (term derivations mirror the query)
        t = {
            "prior_score": 0.5 * (e["value"] / 500.0),
            "user_risk": (e["user_id"] % 100) / 100.0 * 0.2,
            "new_account": 0.10 if e["user_id"] % 5 == 0 else 0.0,
            "kyc_unverified": 0.15 if not (e["user_id"] % 7 != 0) else 0.0,
            "merchant_risk_level": {"error": 0.20, "signup": 0.10}.get(e["event_type"], 0.0),
            "merchant_blacklisted": 0.40 if e["event_type"] == "error" else 0.0,
            "merchant_fraud_rate": (
                2.0 * ((e["user_id"] % 40) / 400.0)
                if (e["user_id"] % 40) / 400.0 > 0.05 else 0.0
            ),
            "high_risk_category": 0.15 if e["event_type"] == "purchase" else 0.0,
            "large_for_user": 0.15 if e["value"] > 400 else 0.0,
            "new_device": 0.10 if e["event_id"] % 11 == 0 else 0.0,
            "night_time": 0.05 if (e["h"] <= 6 or e["h"] >= 22) else 0.0,
            "outside_merchant_hours": 0.10 if not (6 <= e["h"] <= 22) else 0.0,
        }
        want_factors = sorted(
            ((k, v) for k, v in t.items() if v != 0.0),
            key=lambda kv: (-kv[1], kv[0]),
        )[:5]
        assert [(x["factor"], x["contribution"]) for x in g["top_factors"]] == want_factors


def test_rule_based_score_unchanged_by_term_refactor(spark):
    """rule_based_score == clamped fold of rule_score_terms in dict order —
    bit-exact on a dense grid (the oracled rule_score hash depends on it)."""
    df = spark.range(0, 500).select(
        (F.col("id") % 97 / 97.0).alias("prior"),
        (F.col("id") % 89 / 89.0).alias("ur"),
        (F.col("id") % 5 == 0).alias("na"),
        (F.col("id") % 7 != 0).alias("kyc"),
        F.when(F.col("id") % 3 == 0, "high").when(F.col("id") % 3 == 1, "medium").otherwise("low").alias("mr"),
        (F.col("id") % 11 == 0).alias("blk"),
        (F.col("id") % 40 / 400.0).alias("fr"),
        (F.col("id") % 2 == 0).alias("hc"),
        (F.col("id") % 13 == 0).alias("lg"),
        (F.col("id") % 17 == 0).alias("nd"),
        (F.col("id") % 19 == 0).alias("nt"),
        (F.col("id") % 23 != 0).alias("wh"),
    )
    args = dict(
        prior_score=F.col("prior"), user_risk_score=F.col("ur"),
        is_new_account=F.col("na"), is_kyc_verified=F.col("kyc"),
        merchant_risk_level=F.col("mr"), merchant_is_blacklisted=F.col("blk"),
        merchant_fraud_rate=F.col("fr"), is_high_risk_category=F.col("hc"),
        is_large_for_user=F.col("lg"), is_new_device=F.col("nd"),
        is_night_time=F.col("nt"), within_merchant_hours=F.col("wh"),
    )
    terms = S.rule_score_terms(**args)
    folded = None
    for t in terms.values():
        folded = t if folded is None else folded + t
    from realtime_fraud_detection_spark.functions.features import clamp

    n_diff = df.select(
        (S.rule_based_score(**args) != clamp(folded, 0.0, 1.0)).alias("d")
    ).filter("d").count()
    assert n_diff == 0
