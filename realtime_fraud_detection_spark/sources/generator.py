"""Seeded synthetic fraud-domain data generator — SURVEY §2.1 S9.

Re-expresses the reference's simulator (services/data-simulator/src/main/
python/simulator.py:159-374 and fraud_patterns.py:29-417) as a deterministic
batch generator: user/merchant profile tables with the same statistical
shapes (Beta(2,8) user risk, lognormal avg amounts, per-category merchant
fraud rates), a transaction stream sampled from them, and labeled fraud
injection for 7 patterns with the reference's probabilities and amount
ranges (simulator.py:107-157) — card_testing 1-5, synthetic 1000-5000,
money_laundering 9000-9900, account_takeover novel-device+distant-geo,
velocity bursts >5-in-10-min.

Ground-truth labels make the output a correctness oracle for the fraud
pipeline tests (the reference has no test suite — SURVEY §5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

MERCHANT_CATEGORIES = {
    # category -> (mcc, risk_level, base fraud rate)  (simulator.py:255-266)
    "retail": ("5311", "low", 0.01),
    "grocery": ("5411", "low", 0.005),
    "gas_station": ("5541", "low", 0.008),
    "restaurant": ("5812", "low", 0.01),
    "online_retail": ("5967", "medium", 0.03),
    "electronics": ("5732", "medium", 0.02),
    "pharmacy": ("5912", "low", 0.008),
    "jewelry": ("5944", "high", 0.08),
    "gambling": ("7995", "high", 0.15),
    "adult_entertainment": ("5967", "high", 0.12),
}

FRAUD_PATTERNS = [
    # (name, probability, amount_lo, amount_hi)  (simulator.py:107-157)
    ("card_testing", 0.02, 1.0, 5.0),
    ("account_takeover", 0.01, 100.0, 2000.0),
    ("synthetic_fraud", 0.005, 1000.0, 5000.0),
    ("money_laundering", 0.003, 9000.0, 9900.0),
    ("merchant_fraud", 0.002, 50.0, 500.0),
    ("velocity_fraud", 0.01, 20.0, 200.0),
    ("geographic_fraud", 0.005, 100.0, 1000.0),
]

SUSPICIOUS_NAMES = [
    "Quick Bitcoin Exchange",
    "Prepaid Gift Card Hub",
    "Global Money Transfer Co",
    "Lucky Casino Online",
]


def generate_profiles(
    n_users: int = 300, n_merchants: int = 100, seed: int = 42
) -> tuple[pd.DataFrame, pd.DataFrame]:
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-01-01")

    created_days = rng.integers(0, 730, n_users)
    # guarantee some <30d and <7d accounts (FIXTURES.md)
    a, b = n_users // 20, n_users // 10
    created_days[:a] = rng.integers(0, 7, a)
    created_days[a:b] = rng.integers(7, 30, b - a)
    fps = [[f"fp-{u}-{i}" for i in range(rng.integers(1, 4))] for u in range(n_users)]
    users = pd.DataFrame(
        {
            "user_id": [f"user_{i:05d}" for i in range(n_users)],
            "country": rng.choice(["US", "GB", "DE", "FR"], n_users, p=[0.7, 0.1, 0.1, 0.1]),
            "created_at": base - pd.to_timedelta(created_days, unit="D"),
            "kyc_status": rng.choice(
                ["verified", "pending", "rejected"], n_users, p=[0.85, 0.12, 0.03]
            ),
            "risk_score": rng.beta(2, 8, n_users),  # simulator.py:212
            "avg_transaction_amount": np.exp(rng.normal(4, 1, n_users)),  # :228
            "transaction_frequency": (rng.gamma(2, 2, n_users) + 1).astype(int),
            "device_fingerprints": fps,
            "preferred_time_start": rng.integers(6, 11, n_users),
            "preferred_time_end": rng.integers(18, 24, n_users),
            "home_lat": rng.uniform(25, 49, n_users),
            "home_lon": rng.uniform(-124, -67, n_users),
        }
    )

    cats = rng.choice(list(MERCHANT_CATEGORIES), n_merchants)
    rates = np.array(
        [MERCHANT_CATEGORIES[c][2] for c in cats]
    ) * rng.uniform(0.5, 2.0, n_merchants)
    names = [f"Merchant {i} {c.title()}" for i, c in enumerate(cats)]
    for i, s in enumerate(SUSPICIOUS_NAMES):
        names[i * 7 % n_merchants] = s
    merchants = pd.DataFrame(
        {
            "merchant_id": [f"merch_{i:05d}" for i in range(n_merchants)],
            "name": names,
            "category": cats,
            "mcc": [MERCHANT_CATEGORIES[c][0] for c in cats],
            "risk_level": [MERCHANT_CATEGORIES[c][1] for c in cats],
            "avg_transaction_amount": np.exp(rng.normal(4.5, 0.8, n_merchants)),
            "fraud_rate": rates,
            "is_blacklisted": rng.random(n_merchants) < 0.02,
            "open_hour": rng.integers(6, 11, n_merchants),
            "close_hour": rng.integers(20, 25, n_merchants) % 24,
            "m_lat": rng.uniform(25, 49, n_merchants),
            "m_lon": rng.uniform(-124, -67, n_merchants),
        }
    )
    return users, merchants


def generate_transactions(
    users: pd.DataFrame,
    merchants: pd.DataFrame,
    n: int = 20000,
    seed: int = 42,
    days: int = 4,
) -> pd.DataFrame:
    """Sample transactions user×merchant with fraud injection.

    amount = user_avg × N(1,0.3) × N(1,0.2)   (simulator.py:298-347)
    """
    rng = np.random.default_rng(seed + 1)
    nu, nm = len(users), len(merchants)
    ui = rng.integers(0, nu, n)
    mi = rng.integers(0, nm, n)
    base = pd.Timestamp("2024-01-01")
    ts = base + pd.to_timedelta(
        np.sort(rng.uniform(0, days * 86400, n)), unit="s"
    ).round("ms")

    u = users.iloc[ui].reset_index(drop=True)
    m = merchants.iloc[mi].reset_index(drop=True)
    amount = (
        u["avg_transaction_amount"].to_numpy()
        * rng.normal(1, 0.3, n).clip(0.1)
        * rng.normal(1, 0.2, n).clip(0.1)
    ).clip(1.0)

    # fraud injection: cumulative probability roll (simulator.py:107-127)
    roll = rng.random(n)
    fraud_type = np.array([None] * n, dtype=object)
    cum = 0.0
    for name, p, lo, hi in FRAUD_PATTERNS:
        mask = (roll >= cum) & (roll < cum + p)
        fraud_type[mask] = name
        amount[mask] = rng.uniform(lo, hi, mask.sum())
        cum += p
    is_fraud = fraud_type != None  # noqa: E711

    # device fingerprint: usually one of the user's; fraud (account_takeover)
    # gets a novel one (fraud_patterns.py:189-257)
    fp_choice = rng.integers(0, 3, n)
    fp = [
        f"fp-novel-{i}"
        if fraud_type[i] == "account_takeover"
        else u["device_fingerprints"].iloc[i][fp_choice[i] % len(u["device_fingerprints"].iloc[i])]
        for i in range(n)
    ]

    lat = u["home_lat"].to_numpy() + rng.normal(0, 0.5, n)
    lon = u["home_lon"].to_numpy() + rng.normal(0, 0.5, n)
    geo_mask = (fraud_type == "geographic_fraud") | (fraud_type == "account_takeover")
    lat[geo_mask] = rng.uniform(-60, 70, geo_mask.sum())
    lon[geo_mask] = rng.uniform(-180, 180, geo_mask.sum())

    ip_pool = rng.integers(0, 255, (n, 2))
    private = rng.random(n) < 0.2
    ips = np.where(
        private,
        [f"10.0.{a}.{b}" for a, b in ip_pool],
        [f"198.51.{a}.{b}" for a, b in ip_pool],
    )
    uas = np.where(
        rng.random(n) < 0.05,
        "bot-crawler/2.0",
        "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36",
    )

    score = rng.uniform(0, 0.3, n)
    for name, _, _, _ in FRAUD_PATTERNS:
        mask = fraud_type == name
        score[mask] = rng.uniform(0.5, 0.95, mask.sum())  # simulator.py:129-157

    tx = pd.DataFrame(
        {
            "transaction_id": [f"tx_{i:08d}" for i in range(n)],
            "user_id": u["user_id"].to_numpy(),
            "merchant_id": m["merchant_id"].to_numpy(),
            "amount": np.round(amount, 2),
            "currency": "USD",
            "transaction_type": rng.choice(
                ["purchase", "refund", "authorization"], n, p=[0.9, 0.05, 0.05]
            ),
            "payment_method": rng.choice(
                ["credit_card", "debit_card", "digital_wallet", "bank_transfer"], n
            ),
            "card_type": rng.choice(["visa", "mastercard", "amex", "discover"], n),
            "card_last_four": [f"{x:04d}" for x in rng.integers(0, 10000, n)],
            "ts": ts,
            "ip_address": ips,
            "device_id": [f"dev-{x}" for x in rng.integers(0, 1000, n)],
            "device_fingerprint": fp,
            "user_agent": uas,
            "lat": lat,
            "lon": lon,
            "m_lat": m["m_lat"].to_numpy(),
            "m_lon": m["m_lon"].to_numpy(),
            "is_fraud": is_fraud,
            "fraud_type": fraud_type,
            "fraud_score": score,
        }
    )

    # velocity_fraud: burst shaping — clone each velocity row into a tight
    # >5-tx 10-minute cluster (fraud_patterns.py:161-257, FIXTURES.md)
    vmask = tx["fraud_type"] == "velocity_fraud"
    bursts = []
    for _, row in tx[vmask].iterrows():
        for j in range(5):
            r = row.copy()
            r["transaction_id"] = f"{row['transaction_id']}_b{j}"
            r["ts"] = row["ts"] + pd.Timedelta(seconds=int(rng.integers(10, 600)))
            r["amount"] = round(float(row["amount"]) * float(rng.uniform(0.8, 1.2)), 2)
            bursts.append(r)
    if bursts:
        tx = pd.concat([tx, pd.DataFrame(bursts)], ignore_index=True)
    return tx.sort_values("ts", kind="mergesort").reset_index(drop=True)


def generate_behavior_events(tx: pd.DataFrame, seed: int = 42) -> pd.DataFrame:
    """UserBehaviorEvent stream (simulator.py:388-403, FIXTURES.md §4): one
    behavior event per transaction within ±5 min (the J1 join window,
    StreamJoiner.java:47), plus standalone login/navigation events; anomaly
    flags (StreamJoiner.java:194-199) are seeded per event."""
    rng = np.random.default_rng(seed + 7)
    n = len(tx)
    offs = rng.integers(-300, 300, n)
    tx_events = pd.DataFrame(
        {
            "user_id": tx["user_id"].to_numpy(),
            "event_type": "transaction",
            "transaction_id": tx["transaction_id"].to_numpy(),
            "amount": tx["amount"].to_numpy(),
            "ts": tx["ts"] + pd.to_timedelta(offs, unit="s"),
            "device_fingerprint": tx["device_fingerprint"].to_numpy(),
            "is_anomalous_login": rng.random(n) < 0.05,
            "is_short_session": rng.random(n) < 0.10,
            "is_anomalous_navigation": rng.random(n) < 0.05,
        }
    )
    m = n // 4
    extra = pd.DataFrame(
        {
            "user_id": tx["user_id"].sample(m, random_state=seed).to_numpy(),
            "event_type": rng.choice(["login", "navigation"], m),
            "transaction_id": None,
            "amount": np.nan,
            "ts": tx["ts"].sample(m, random_state=seed).to_numpy()
            + pd.to_timedelta(rng.integers(-3600, 3600, m), unit="s"),
            "device_fingerprint": tx["device_fingerprint"].sample(m, random_state=seed).to_numpy(),
            "is_anomalous_login": rng.random(m) < 0.15,
            "is_short_session": rng.random(m) < 0.15,
            "is_anomalous_navigation": rng.random(m) < 0.10,
        }
    )
    return (
        pd.concat([tx_events, extra], ignore_index=True)
        .sort_values("ts", kind="mergesort")
        .reset_index(drop=True)
    )


def to_spark(spark, users: pd.DataFrame, merchants: pd.DataFrame, tx: pd.DataFrame):
    """Spark DataFrames with the engine's canonical schemas (schemas.py)."""
    from pyspark.sql import functions as F

    u = spark.createDataFrame(users)
    m = spark.createDataFrame(merchants)
    t = spark.createDataFrame(tx)
    t = (
        t.withColumn("geolocation", F.struct(F.col("lat"), F.col("lon")))
        .withColumn("merchant_location", F.struct(F.col("m_lat").alias("lat"), F.col("m_lon").alias("lon")))
        .drop("lat", "lon", "m_lat", "m_lon")
    )
    m = m.withColumn(
        "operating_hours",
        F.struct(F.col("open_hour").alias("start_hour"), F.col("close_hour").alias("end_hour")),
    )
    return u, m, t
