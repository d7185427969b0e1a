"""Seeded synthetic fraud-domain data generator — SURVEY §2.1 S9.

Re-expresses the reference's simulator (services/data-simulator/src/main/
python/simulator.py:159-374 and fraud_patterns.py:29-417) as a deterministic
batch generator: user/merchant profile tables with the same statistical
shapes (Beta(2,8) user risk, lognormal avg amounts, per-category merchant
fraud rates), a transaction stream sampled from them, and labeled fraud
injection for the full 10-scenario module (fraud_patterns.py:38-141) with
the reference's per-scenario probability, severity, detection difficulty,
amount range, fraud-score range, and row shaping (:161-400) — card-testing
bursts on test card numbers, account-takeover novel-device + remote-geo,
velocity bursts with the stateful >5-in-10-min score, structured
money-laundering amounts, merchant-fraud repetitive price points, bust-out
spikes, and the low-score friendly / first-party scenarios that are
deliberately hard to detect.

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

# The 10-scenario fraud module (fraud_patterns.py:38-141):
# name -> (probability, severity, detection_difficulty,
#          amount_lo, amount_hi, frequency, geo_pattern,
#          score_lo, score_hi, fraud_reason)
FRAUD_SCENARIOS = {
    "card_testing": (0.025, "medium", "easy", 0.99, 9.99, "burst", "random",
                     0.75, 0.95, "Small amount testing pattern detected"),
    "account_takeover": (0.015, "high", "medium", 100.0, 2000.0, "sustained", "remote",
                         0.70, 0.90, "Geographic and device anomaly detected"),
    "synthetic_identity": (0.008, "high", "hard", 500.0, 5000.0, "sustained", "local",
                           0.65, 0.85, "Synthetic identity pattern indicators"),
    "first_party_fraud": (0.012, "medium", "very_hard", 200.0, 1500.0, "single", "local",
                          0.10, 0.40, "First party fraud indicators"),
    "money_laundering": (0.005, "critical", "hard", 9000.0, 9900.0, "sustained", "random",
                         0.70, 0.90, "Structured transaction pattern"),
    "merchant_fraud": (0.003, "high", "medium", 50.0, 500.0, "sustained", "local",
                       0.60, 0.85, "Merchant fraud pattern detected"),
    "velocity_fraud": (0.018, "medium", "easy", 25.0, 300.0, "burst", "local",
                       0.60, 0.80, "Velocity pattern detected"),
    "geographic_fraud": (0.010, "medium", "medium", 100.0, 800.0, "single", "international",
                         0.75, 0.90, "Geographic impossibility detected"),
    "bust_out_fraud": (0.004, "high", "hard", 1000.0, 8000.0, "burst", "local",
                       0.70, 0.90, "Bust-out spending pattern"),
    "friendly_fraud": (0.020, "low", "very_hard", 50.0, 1000.0, "single", "local",
                       0.05, 0.25, "Potential friendly fraud"),
}

# fraud_patterns.py:169 — card testing reuses known test card numbers
CARD_TESTING_LAST_FOUR = ["1234", "5678", "9999", "0000"]
# fraud_patterns.py:323 — merchant fraud repeats common price points
MERCHANT_FRAUD_AMOUNTS = [49.99, 99.99, 199.99, 299.99]
# burst scenarios -> extra cloned rows per seed row (typical_frequency='burst')
BURST_CLONES = {"card_testing": 5, "velocity_fraud": 5, "bust_out_fraud": 3}

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

    # fraud injection: cumulative probability roll over the 10 scenarios
    # (fraud_patterns.py:143-159 — weighted selection within the total
    # fraud probability)
    roll = rng.random(n)
    fraud_type = np.array([None] * n, dtype=object)
    severity = np.array([None] * n, dtype=object)
    reason = np.array([None] * n, dtype=object)
    cum = 0.0
    for name, (p, sev, _diff, lo, hi, _freq, _geo, _slo, _shi, why) in FRAUD_SCENARIOS.items():
        mask = (roll >= cum) & (roll < cum + p)
        fraud_type[mask] = name
        severity[mask] = sev
        reason[mask] = why
        if name == "merchant_fraud":
            # repetitive price points (fraud_patterns.py:322-324)
            amount[mask] = rng.choice(MERCHANT_FRAUD_AMOUNTS, mask.sum())
        else:
            amount[mask] = rng.uniform(lo, hi, mask.sum())
        cum += p
    is_fraud = fraud_type != None  # noqa: E711

    # device fingerprint: usually one of the user's; account takeover gets a
    # novel fingerprint AND device id (fraud_patterns.py:210-212)
    fp_choice = rng.integers(0, 3, n)
    fp = [
        f"fp-novel-{i}"
        if fraud_type[i] == "account_takeover"
        else u["device_fingerprints"].iloc[i][fp_choice[i] % len(u["device_fingerprints"].iloc[i])]
        for i in range(n)
    ]
    device_id = np.array([f"dev-{x}" for x in rng.integers(0, 1000, n)], dtype=object)
    ato = fraud_type == "account_takeover"
    device_id[ato] = [f"dev-novel-{i}" for i in np.flatnonzero(ato)]

    lat = u["home_lat"].to_numpy() + rng.normal(0, 0.5, n)
    lon = u["home_lon"].to_numpy() + rng.normal(0, 0.5, n)
    # account takeover: sudden ±50° jump from the last known location,
    # clamped to valid ranges (fraud_patterns.py:189-200)
    lat[ato] = np.clip(lat[ato] + rng.uniform(-50, 50, ato.sum()), -90, 90)
    lon[ato] = np.clip(lon[ato] + rng.uniform(-50, 50, ato.sum()), -180, 180)
    # geographic impossibility: anywhere on the globe (fraud_patterns.py:301-310)
    geo = fraud_type == "geographic_fraud"
    lat[geo] = rng.uniform(-60, 70, geo.sum())
    lon[geo] = rng.uniform(-180, 180, geo.sum())

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

    # per-scenario fraud-score ranges (fraud_patterns.py:161-400) — note the
    # friendly/first-party scenarios deliberately score LOW (they look
    # legitimate; detection_difficulty 'very_hard')
    score = rng.uniform(0, 0.3, n)
    for name, (_p, _sev, _diff, _lo, _hi, _freq, _geo, slo, shi, _why) in FRAUD_SCENARIOS.items():
        mask = fraud_type == name
        score[mask] = rng.uniform(slo, shi, mask.sum())

    # card testing reuses a small set of test card numbers and hops IPs
    # (fraud_patterns.py:166-179)
    card_last_four = np.array([f"{x:04d}" for x in rng.integers(0, 10000, n)], dtype=object)
    ct = fraud_type == "card_testing"
    card_last_four[ct] = rng.choice(CARD_TESTING_LAST_FOUR, ct.sum())

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
            "card_last_four": card_last_four,
            "ts": ts,
            "ip_address": ips,
            "device_id": device_id,
            "device_fingerprint": fp,
            "user_agent": uas,
            "lat": lat,
            "lon": lon,
            "m_lat": m["m_lat"].to_numpy(),
            "m_lon": m["m_lon"].to_numpy(),
            "is_fraud": is_fraud,
            "fraud_type": fraud_type,
            "fraud_severity": severity,
            "fraud_reason": reason,
            "fraud_score": score,
        }
    )

    # burst shaping for the burst-frequency scenarios: clone each seed row
    # into a tight 10-minute cluster (fraud_patterns.py:226-258 velocity,
    # :161-181 card testing, :335-348 bust-out). Velocity clones get the
    # reference's STATEFUL score — min(0.95, 0.5 + 0.1 × count-in-window)
    # once the 10-minute window holds more than 5 transactions (:245-253).
    bursts = []
    for pattern, n_clones in BURST_CLONES.items():
        pmask = tx["fraud_type"] == pattern
        plo, phi = FRAUD_SCENARIOS[pattern][3], FRAUD_SCENARIOS[pattern][4]
        for _, row in tx[pmask].iterrows():
            for j in range(n_clones):
                r = row.copy()
                r["transaction_id"] = f"{row['transaction_id']}_b{j}"
                r["ts"] = row["ts"] + pd.Timedelta(seconds=int(rng.integers(10, 600)))
                if pattern == "merchant_fraud":
                    pass  # repetitive price points stay identical
                elif pattern == "card_testing":
                    r["amount"] = round(float(rng.uniform(plo, phi)), 2)
                else:
                    r["amount"] = round(float(row["amount"]) * float(rng.uniform(0.8, 1.2)), 2)
                if pattern == "velocity_fraud":
                    count_in_window = j + 2  # seed row + clones so far
                    if count_in_window > 5:
                        r["fraud_score"] = min(0.95, 0.5 + 0.1 * count_in_window)
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
