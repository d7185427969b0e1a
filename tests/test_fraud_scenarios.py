"""Distribution tests for the 10-scenario fraud module
(fraud_patterns.py:38-141,161-400 re-expressed in sources/generator.py):
per-scenario frequency ≈ its configured probability, amounts inside the
scenario's range, fraud scores inside the scenario's score band, severity
labels attached, and the pattern-specific row shaping (test cards, novel
devices, remote geo, stateful velocity scores, repetitive merchant-fraud
price points)."""

from __future__ import annotations

import numpy as np

from realtime_fraud_detection_spark.sources import generator as G

N = 60_000


def _fixture():
    users, merchants = G.generate_profiles(n_users=400, n_merchants=80, seed=7)
    tx = G.generate_transactions(users, merchants, n=N, seed=7, days=10)
    return users, merchants, tx


USERS, MERCHANTS, TX = _fixture()
SEEDS = TX[~TX["transaction_id"].str.contains("_b")]  # pre-burst rows


def test_all_ten_scenarios_present():
    got = set(TX.loc[TX["is_fraud"], "fraud_type"].unique())
    assert got == set(G.FRAUD_SCENARIOS)


def test_per_scenario_frequency_matches_probability():
    """Seed-row frequencies track fraud_patterns.py probabilities (the
    roll is uniform, so ±35% relative slack at n=60k is generous)."""
    for name, (p, *_rest) in G.FRAUD_SCENARIOS.items():
        freq = (SEEDS["fraud_type"] == name).mean()
        assert 0.65 * p <= freq <= 1.35 * p, (name, p, freq)


def test_amounts_inside_scenario_ranges():
    for name, (_p, _sev, _diff, lo, hi, *_rest) in G.FRAUD_SCENARIOS.items():
        amts = TX.loc[TX["fraud_type"] == name, "amount"]
        # burst clones jitter ±20% around the seed amount
        assert amts.min() >= lo * 0.8 - 0.01, (name, amts.min())
        assert amts.max() <= hi * 1.2 + 0.01, (name, amts.max())


def test_scores_inside_scenario_bands():
    for name, spec in G.FRAUD_SCENARIOS.items():
        slo, shi = spec[7], spec[8]
        sc = SEEDS.loc[SEEDS["fraud_type"] == name, "fraud_score"]
        assert sc.between(slo, shi).all(), name
    # friendly fraud scores BELOW the normal range's ceiling — the
    # hard-to-detect scenario is score-indistinguishable from legit traffic
    friendly = TX.loc[TX["fraud_type"] == "friendly_fraud", "fraud_score"]
    assert (friendly <= 0.25).all()


def test_severity_and_reason_labels():
    for name, spec in G.FRAUD_SCENARIOS.items():
        rows = TX[TX["fraud_type"] == name]
        assert (rows["fraud_severity"] == spec[1]).all(), name
        assert rows["fraud_reason"].notna().all(), name
    normal = TX[~TX["is_fraud"]]
    assert normal["fraud_severity"].isna().all()
    assert normal["fraud_reason"].isna().all()
    assert (TX.loc[TX["fraud_type"] == "money_laundering", "fraud_severity"] == "critical").all()


def test_card_testing_uses_test_cards():
    ct = TX[TX["fraud_type"] == "card_testing"]
    assert set(ct["card_last_four"].unique()) <= set(G.CARD_TESTING_LAST_FOUR)
    # burst: each seed spawns 5 clones
    seeds = ct[~ct["transaction_id"].str.contains("_b")]
    assert len(ct) == len(seeds) * (1 + G.BURST_CLONES["card_testing"])


def test_account_takeover_novel_device_and_remote_geo():
    ato = TX[TX["fraud_type"] == "account_takeover"]
    assert ato["device_fingerprint"].str.startswith("fp-novel-").all()
    assert ato["device_id"].str.startswith("dev-novel-").all()
    # remote: well outside the ±0.5° home jitter for most rows
    home = USERS.set_index("user_id")[["home_lat", "home_lon"]]
    d_lat = (ato["lat"].to_numpy() - home.loc[ato["user_id"], "home_lat"].to_numpy())
    assert (np.abs(d_lat) > 2).mean() > 0.8


def test_velocity_bursts_and_stateful_score():
    vel = TX[TX["fraud_type"] == "velocity_fraud"]
    seeds = vel[~vel["transaction_id"].str.contains("_b")]
    assert len(vel) == len(seeds) * (1 + G.BURST_CLONES["velocity_fraud"])
    # clones beyond the 5th in-window tx carry min(0.95, 0.5 + 0.1*count)
    b4 = vel[vel["transaction_id"].str.endswith("_b4")]  # count = 6
    assert np.allclose(b4["fraud_score"], 0.95)
    # every burst stays inside one 10-minute window
    for tid, grp in vel.groupby(vel["transaction_id"].str.replace(r"_b\d+$", "", regex=True)):
        span = grp["ts"].max() - grp["ts"].min()
        assert span <= np.timedelta64(600, "s"), tid


def test_merchant_fraud_repetitive_amounts():
    mf = TX[TX["fraud_type"] == "merchant_fraud"]
    assert set(np.round(mf["amount"], 2)) <= set(G.MERCHANT_FRAUD_AMOUNTS)


def test_geographic_fraud_global_coordinates():
    geo = TX[TX["fraud_type"] == "geographic_fraud"]
    home = USERS.set_index("user_id")[["home_lat", "home_lon"]]
    d = np.abs(geo["lon"].to_numpy() - home.loc[geo["user_id"], "home_lon"].to_numpy())
    assert (d > 5).mean() > 0.8  # far from home for most rows


def test_determinism():
    _, _, tx2 = _fixture()
    assert tx2.equals(TX)
