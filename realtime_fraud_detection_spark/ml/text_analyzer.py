"""M7 — transaction-text analyzer: the transformer-backed path.

The reference's BERT analyzer (bert_text_analyzer.py:104-280) scores
each text field (merchant name, description, a combined contextual
string) with a sequence classifier's class-1 probability and folds them
into ``overall_text_risk`` with weights 0.4/0.3/0.3 renormalized over
the fields actually present; when torch/transformers are absent it
silently runs dummy modules. This repo's production fallback is
ml/models.trained_text_analyzer (a trained hashed-n-gram distillation);
THIS module is the real transformer path with the Spark plumbing fully
built and the model backend injectable:

* preprocessing (lower, strip non-alphanumerics, whitespace collapse —
  bert_text_analyzer.py:229-252) and the combined-text construction
  (:254-280) are pure Column expressions — JVM-side, not Python;
* the only Python crossing is the scorer: one Arrow-batched pandas_udf
  per text field, with the backend constructed ONCE per executor
  process (a module-global cache keyed by the factory) and applied to
  whole batches — the broadcast-model topology of
  ml/models.isolation_forest_udf;
* the 0.4/0.3/0.3 combine and its renormalization over present fields
  are Column arithmetic.

``hf_scorer(model_name)`` is the transformers backend (class-1 softmax
probability, truncation at max_length=128 like the reference); it
imports torch/transformers INSIDE the factory, so environments without
them can still use the plumbing with any other backend. The wiring is
pinned by a mock-backend unit test everywhere, and by a self-skipping
contract test (the transformWithStateInPandas pattern) that builds a
real randomly-initialized transformer wherever `transformers` imports —
no network, no pretrained download (tests/test_text_analyzer.py).
"""

from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# reference weights (bert_text_analyzer.py:146-151); unknown extra
# fields would take 0.1 there — this surface fixes the three fields.
FIELD_WEIGHTS = {
    "merchant_name_risk": 0.4,
    "description_risk": 0.3,
    "combined_text_risk": 0.3,
}

_SCORER_CACHE: dict = {}


def preprocess_text(col: F.Column) -> F.Column:
    """bert_text_analyzer.py:229-252 as Column ops: strip+lower, drop
    non-alphanumerics, collapse whitespace."""
    cleaned = F.regexp_replace(F.lower(F.trim(col)), r"[^a-zA-Z0-9\s]", " ")
    return F.trim(F.regexp_replace(cleaned, r"\s+", " "))


def combined_text(
    merchant: F.Column | None,
    description: F.Column | None,
    category: F.Column | None = None,
    location: F.Column | None = None,
) -> F.Column:
    """bert_text_analyzer.py:254-280: labeled components joined with
    spaces, absent/empty fields skipped."""
    parts = []
    for label, col in (
        ("Merchant:", merchant),
        ("Description:", description),
        ("Category:", category),
        ("Location:", location),
    ):
        if col is not None:
            parts.append(
                F.when(
                    col.isNotNull() & (F.trim(col) != ""),
                    F.concat(F.lit(label + " "), col),
                )
            )
    return F.concat_ws(" ", *parts)


def hf_scorer(model_name: str, max_length: int = 128) -> Callable:
    """Factory for the transformers backend: returns a zero-arg callable
    producing ``fn(list[str]) -> list[float]`` (class-1 softmax
    probability — bert_text_analyzer.py:200-224). torch/transformers are
    imported inside, so merely holding this factory needs neither."""

    def make() -> Callable[[Sequence[str]], list[float]]:
        import torch
        from transformers import AutoModelForSequenceClassification, AutoTokenizer

        tok = AutoTokenizer.from_pretrained(model_name)
        model = AutoModelForSequenceClassification.from_pretrained(model_name)
        model.eval()

        def score(texts: Sequence[str]) -> list[float]:
            inputs = tok(
                list(texts),
                padding=True,
                truncation=True,
                max_length=max_length,
                return_tensors="pt",
            )
            with torch.no_grad():
                probs = torch.softmax(model(**inputs).logits, dim=-1)
            return probs[:, 1].tolist()

        return score

    return make


def _field_udf(make_scorer: Callable, cache_key: str):
    @F.pandas_udf(T.DoubleType())
    def score_udf(texts: pd.Series) -> pd.Series:
        fn = _SCORER_CACHE.get(cache_key)
        if fn is None:
            fn = make_scorer()
            _SCORER_CACHE[cache_key] = fn
        mask = texts.notna() & (texts.str.strip() != "")
        out = pd.Series(0.0, index=texts.index, dtype="float64")
        if mask.any():
            out.loc[mask] = fn(texts[mask].tolist())
        return out

    return score_udf


def analyze_text_fields(
    df: DataFrame,
    make_scorer: Callable,
    merchant_col: str = "merchant_name",
    description_col: str = "description",
    category_col: str | None = None,
    location_col: str | None = None,
    cache_key: str | None = None,
) -> DataFrame:
    """The analyzer pipeline: preprocess each present field (Column ops),
    score each with one Arrow-batched UDF call (empty/NULL fields score
    0.0 without crossing into the backend — the reference returns 0.0
    for blank text), and combine with the reference's weights
    renormalized over the fields present per row. Adds
    merchant_name_risk / description_risk / combined_text_risk /
    overall_text_risk."""
    key = cache_key or repr(make_scorer)
    udf = _field_udf(make_scorer, key)
    m = preprocess_text(F.col(merchant_col))
    d = preprocess_text(F.col(description_col))
    combo = preprocess_text(
        combined_text(
            F.col(merchant_col),
            F.col(description_col),
            F.col(category_col) if category_col else None,
            F.col(location_col) if location_col else None,
        )
    )
    out = (
        df.withColumn("merchant_name_risk", udf(m))
        .withColumn("description_risk", udf(d))
        .withColumn("combined_text_risk", udf(combo))
    )
    total = F.lit(0.0)
    wsum = F.lit(0.0)
    _srcs = {
        "merchant_name_risk": merchant_col,
        "description_risk": description_col,
        "combined_text_risk": None,
    }
    for field, (src, w) in {
        f: (_srcs[f], w) for f, w in FIELD_WEIGHTS.items()
    }.items():
        present = (
            F.lit(True)
            if src is None
            else F.col(src).isNotNull() & (F.trim(F.col(src)) != "")
        )
        # combined text is present iff any component is; reuse its risk
        # column's source presence via the concat being non-empty
        if src is None:
            present = F.trim(combo) != ""
        wsum = wsum + F.when(present, F.lit(w)).otherwise(F.lit(0.0))
        total = total + F.when(present, F.col(field) * w).otherwise(F.lit(0.0))
    return out.withColumn(
        "overall_text_risk",
        F.when(wsum > 0, total / wsum).otherwise(F.lit(0.0)),
    )
