"""CI smoke for examples/model_monitoring_loop.py — runs in a subprocess
exactly as a user would (the script owns its SparkSession). Assertions
are structural (stage lines present, invariants hold), not pinned counts
— fixtures regenerate per round."""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "examples", "model_monitoring_loop.py")
SF_DIR = "/root/testdata/sf0.001"


def test_monitoring_example_end_to_end():
    out = subprocess.run(
        [sys.executable, SCRIPT, SF_DIR],
        capture_output=True,
        text=True,
        timeout=560,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    text = out.stdout

    n_scored = int(re.search(r"scored events: (\d+)", text).group(1))
    n_joined = int(re.search(r"feedback-joined pairs: (\d+)", text).group(1))
    # every score gets its outcome back (labels arrive inside the window)
    assert n_joined == n_scored > 0

    metrics = re.findall(
        r"ranking metrics (\w+): auc=([\d.]+) ks=([\d.]+) ap=([\d.]+)", text
    )
    assert len(metrics) >= 4
    for _, auc, ks, ap in metrics:
        # the pseudo-model is strongly informative by construction
        assert 0.7 < float(auc) <= 1.0
        assert 0.0 < float(ks) <= 1.0 and 0.0 < float(ap) <= 1.0

    b = re.search(r"brier raw=([\d.]+) calibrated=([\d.]+)", text)
    assert float(b.group(2)) < float(b.group(1))  # calibration helps
    e = re.search(r"ece raw=([\d.]+) calibrated=([\d.]+)", text)
    assert float(e.group(2)) < float(e.group(1))

    ci = re.search(r"auc=([\d.]+) ci=\[([\d.]+), ([\d.]+)\]", text)
    lo, auc, hi = float(ci.group(2)), float(ci.group(1)), float(ci.group(3))
    assert lo < auc < hi
    duel = re.search(
        r"champion vs challenger: delta=([\d.-]+) z=([\d.-]+) significant=(\w+)",
        text,
    )
    # half-noise challenger must lose decisively on 1000 paired rows
    assert float(duel.group(1)) > 0 and duel.group(3) == "True"

    op = re.search(
        r"max-F1 t=([\d.]+) .*min-cost t=([\d.]+)", text
    )
    # a 20x fn cost can only push the threshold down (recall-ward)
    assert float(op.group(2)) <= float(op.group(1))

    assert re.search(r"score drift PSI vs first window: [\d.]+", text)
    vol = re.search(r"volume anomalies: (\d+)/(\d+) scored buckets", text)
    assert int(vol.group(1)) <= int(vol.group(2)) and int(vol.group(2)) > 0
    assert "done in" in text
