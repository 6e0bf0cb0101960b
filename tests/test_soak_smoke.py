"""Smoke-size runs of the randomized soak harnesses (scripts/), so the
pytest gate exercises the differential sweeps on every run — the full
volumes stay manual (`python scripts/soak_fuzz.py 3000`)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_codec_kernel_soak_smoke():
    """150 randomized segments through every codec + query kernel,
    checked against the decoded ground truth. A fresh seed each UTC
    day widens coverage over time while staying reproducible within a
    day (the failure message carries the seed)."""
    import datetime as dt
    seed = int(dt.datetime.now(dt.timezone.utc).strftime("%Y%m%d"))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "soak_fuzz.py"),
         "150", str(seed)],
        capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, (
        f"soak_fuzz seed={seed} failed:\n{proc.stdout[-2000:]}"
        f"\n{proc.stderr[-2000:]}")
    assert "SOAK OK" in proc.stdout
