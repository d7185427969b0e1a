"""CI smoke for examples/online_sequence_scoring.py — runs in a
subprocess exactly as a user would (the script owns its SparkSession).
Structural assertions: the artifact trains, the live stream is scored
and monitored, and the online-vs-offline feature identity holds."""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "examples", "online_sequence_scoring.py")


def test_online_sequence_scoring_end_to_end():
    out = subprocess.run(
        [sys.executable, SCRIPT],
        capture_output=True,
        text=True,
        timeout=560,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    text = out.stdout

    n_train = int(re.search(r"trained on (\d+) events", text).group(1))
    assert n_train > 1000

    m = re.search(
        r"live experiment: control_n=(\d+) treatment_n=(\d+)", text
    )
    assert m, text
    cn, tn = int(m.group(1)), int(m.group(2))
    assert cn > 100 and tn > 100  # both arms served from the stream

    # the demo's load-bearing law
    assert "online-vs-offline feature rows differing: 0" in text
