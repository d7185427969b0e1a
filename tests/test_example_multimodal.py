"""CI smoke for examples/multimodal_pipeline.py — runs in a subprocess
exactly as a user would (the script owns its SparkSession). The
load-bearing assertion: the dedup stage finds EXACTLY the planted
duplicate set (42 byte-identical images at 192 samples % 150 seeds) and
nothing else — centered embeddings separate duplicates (cosine 1.0)
from unrelated fakes (~0.1) with a wide margin."""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "examples", "multimodal_pipeline.py")


def test_multimodal_pipeline_end_to_end():
    out = subprocess.run(
        [sys.executable, SCRIPT, "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        timeout=560,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    text = out.stdout
    assert "payload table: 192 samples" in text
    # metadata census never decodes a byte and sees all three widths
    assert re.search(r"width census: \{32: 64, 48: 64, 64: 64\}", text)
    m = re.search(r"near-dup pairs: (\d+); survivors: (\d+)/192", text)
    assert m, text
    assert int(m.group(1)) == 42  # exactly the planted duplicates
    assert int(m.group(2)) == 150
    assert "training shard: 150 images resized to 64x64" in text
