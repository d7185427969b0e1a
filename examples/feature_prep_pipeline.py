#!/usr/bin/env python3
"""Feature-prep pipeline demo — the train/serve feature-engineering loop
around a high-cardinality categorical (the round-12 encoding family):

  events → sparse pseudo merchant key (~2000 levels, a handful of rows
           each — the regime where naive target encoding memorizes)
         → md5 hash split (train / heldout)
         → TRAIN features: out-of-fold target encoding (leakage-free)
         → the leakage A/B: a naive full-data encoding of the SAME
           train rows inflates train AUC far above its heldout AUC,
           while the OOF encoding's train AUC matches heldout
         → SERVE path: fit_target_encoder on train only → persist
           (parquet levels + JSON sidecar) → reload → apply to heldout
           (bit-identical to the in-memory encoder)
         → WoE / Information Value scorecard view of the key
         → PSI drift of the encoded feature across event-time halves

The reference hardcodes per-merchant risk weights (merchant_risk_level
CASE bands); this loop LEARNS them from outcomes without leaking a
row's own label into its own feature, and ships the learned table to
the serve path as a versioned artifact.

Usage: python examples/feature_prep_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.functions.hashing import md5_bigint
from realtime_fraud_detection_spark.ml.drift import psi_numeric
from realtime_fraud_detection_spark.ml.encoding import (
    apply_target_encoder,
    fit_target_encoder,
    load_target_encoder,
    save_target_encoder,
    target_encode,
    woe_iv,
)
from realtime_fraud_detection_spark.ml.evaluation import binary_eval
from realtime_fraud_detection_spark.session import get_spark
from realtime_fraud_detection_spark.sources.testdata import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("feature-prep-example")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. sparse categorical with REAL per-level signal: the md5 coin fires
    # at rate (key % 10)/10, so the key fully determines the Bayes-optimal
    # score — exactly what a target encoder should recover, and exactly
    # what a leaky one memorizes row-by-row at ~few rows per level.
    key = (F.col("user_id") * 7919 + F.col("event_id") % 13) % 2003
    coin = (md5_bigint(F.col("event_id").cast("string"), "fp:") % 1_000_000) / 1e6
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            "ts",
            key.alias("merchant_key"),
            F.when(coin < (key % 10) / 10.0, 1).otherwise(0).alias("label"),
        )
        .localCheckpoint()
    )
    split = md5_bigint(F.col("event_id").cast("string"), "split:") % 5
    train = ev.filter(split != 0)
    heldout = ev.filter(split == 0)
    n_tr, n_ho = train.count(), heldout.count()
    print(f"events: {ev.count()} train: {n_tr} heldout: {n_ho}")

    # 2. leakage A/B on the SAME train rows.
    oof = target_encode(train, "merchant_key", "label", "event_id", n_folds=5)
    levels, meta = fit_target_encoder(train, "merchant_key", "label")
    naive_train = apply_target_encoder(train, levels, meta)

    def auc(df, score_col):
        return binary_eval(df, score_col, "label").first()["auc"]

    auc_oof_train = auc(oof, "merchant_key_te")
    auc_naive_train = auc(naive_train, "merchant_key_te")

    # 3. serve path: persist → reload → score heldout (artifact parity).
    tmp = tempfile.mkdtemp(prefix="fp_enc_")
    try:
        path = os.path.join(tmp, "merchant_encoder")
        os.makedirs(path)
        save_target_encoder(levels, meta, path)
        levels2, meta2 = load_target_encoder(spark, path)
        ho_mem = apply_target_encoder(heldout, levels, meta)
        ho_art = apply_target_encoder(heldout, levels2, meta2)
        same = (
            ho_mem.select("event_id", "merchant_key_te")
            .exceptAll(ho_art.select("event_id", "merchant_key_te"))
            .isEmpty()
        )
        print(f"encoder artifact roundtrip bit-identical: {same}")
        auc_heldout = auc(ho_art, "merchant_key_te")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    print(
        f"train AUC naive={auc_naive_train:.4f} oof={auc_oof_train:.4f} "
        f"heldout={auc_heldout:.4f}"
    )
    print(
        "leakage gap: naive-train inflation "
        f"{auc_naive_train - auc_heldout:+.4f} vs oof-train "
        f"{auc_oof_train - auc_heldout:+.4f}"
    )

    # 4. scorecard view: WoE / IV of the decile the key maps to (binned —
    # WoE per raw sparse level is just the memorized label again).
    binned = train.select((F.col("merchant_key") % 10).alias("decile"), "label")
    per_bin, iv = woe_iv(binned, "decile", "label")
    print(f"scorecard IV(decile)={iv:.4f} bins={per_bin.count()}")

    # 5. drift monitor on the SERVED feature: PSI of the encoded value
    # between event-time halves (stable by construction here — the alarm
    # wiring is the point).
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cut = lo + (hi - lo) // 2
    scored = apply_target_encoder(ev, levels, meta)
    psi = psi_numeric(
        scored.filter(F.col("ts") <= F.lit(cut)),
        scored.filter(F.col("ts") > F.lit(cut)),
        "merchant_key_te",
    ).first()["psi"]
    print(f"PSI(merchant_key_te) across time halves: {psi:.5f}")

    spark.stop()


if __name__ == "__main__":
    main()
