"""CI smoke for examples/feature_prep_pipeline.py — runs in a subprocess
exactly as a user would (the script owns its SparkSession). Assertions
are structural/directional (leakage gap present, artifact parity), not
pinned values — fixtures regenerate per round."""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "examples", "feature_prep_pipeline.py")
SF_DIR = "/root/testdata/sf0.001"


def test_feature_prep_example_end_to_end():
    out = subprocess.run(
        [sys.executable, SCRIPT, SF_DIR],
        capture_output=True,
        text=True,
        timeout=560,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    text = out.stdout

    m = re.search(r"events: (\d+) train: (\d+) heldout: (\d+)", text)
    n, tr, ho = (int(x) for x in m.groups())
    assert tr + ho == n > 0

    assert "encoder artifact roundtrip bit-identical: True" in text

    m = re.search(
        r"train AUC naive=([\d.]+) oof=([\d.]+) heldout=([\d.]+)", text
    )
    naive, oof, heldout = (float(x) for x in m.groups())
    # the key fully determines the Bayes score, so every AUC is well
    # above chance...
    assert min(naive, oof, heldout) > 0.6
    # ...and at ~few rows per level the naive full-data encoding
    # memorizes its own labels: its train AUC must sit visibly above
    # the honest heldout figure, while OOF's train AUC stays near it.
    assert naive - heldout > 0.03
    assert abs(oof - heldout) < naive - heldout

    iv = float(re.search(r"IV\(decile\)=([\d.]+)", text).group(1))
    assert iv > 0.5  # decile drives the label rate by construction

    psi = float(re.search(r"PSI\(merchant_key_te\) across time halves: ([\d.]+)", text).group(1))
    assert psi < 0.25  # stationary by construction — no drift alarm
