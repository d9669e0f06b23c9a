"""Ship-shape smoke: the crawl must run via spark-submit --py-files
with the library resolved from the packaged zip (north_rule vehicle)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files(tmp_path):
    wd = str(tmp_path / "crawl")
    r = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "submit.sh"),
         "--master", "local[4]", "--",
         "--workdir", wd, "--n-urls", "300", "--n-hosts", "8",
         "--budget", "16"],
        capture_output=True, text=True, timeout=420,
        env={**os.environ, "PYTHONPATH": ""},  # must come from the zip
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["urls_fetched"] > 0
    assert out["done"] + out["forfeit"] > 0.9 * 300 * 0.95  # ~5% robots-excluded
    assert out["epochs"] >= 2
