"""Deployment-surface gate: the north rule ships the job as
``spark-submit --py-files ccbot_spark.zip``. This test runs main.py
through the REAL spark-submit binary (own JVM, the package imported
only from the zip) and checks the crawl it produces against the oracle
crawler — proving the zip is self-contained and the CLI entry point
reproduces the reference behavior under cluster-style submission.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

from ccbot_spark import oracle, schemas, synthweb
from ccbot_spark.tablestore import TableStore

SPARK_SUBMIT = shutil.which("spark-submit")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_crawl_matches_oracle(spark, tmp_path):
    from ccbot_spark.shipping import package_zip

    cfg = synthweb.WebConfig(n_hosts=8, pages_per_host=20)
    seeds = synthweb.seed_urls(cfg, 16)
    wd = str(tmp_path / "crawl")
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable)
    out = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[8]",
            "--py-files", package_zip(),
            os.path.join(REPO, "main.py"),
            "--hosts", "8", "--pages", "20", "--seeds", "16",
            "--cycles", "1", "--buckets", "8",
            "--shuffle-partitions", "8", "--workdir", wd,
        ],
        capture_output=True, text=True, timeout=480, cwd=str(tmp_path),
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    want = oracle.crawl(cfg, seeds, cycles=1)

    assert summary["fetched"] == sum(
        1 for t in want.trace if t[5] in ("fetched",)
    )
    assert summary["stored_images"] == len(want.images)

    # full trace equality read back from the submitted job's tables
    trace = TableStore(spark, wd, "trace", schemas.TRACE)
    got = [
        (r.seq, r.cycle, r.url_norm, r.host, r.sched_slot, r.action)
        for r in trace.read().orderBy("seq").collect()
    ]
    assert got == want.trace
    seen = TableStore(spark, wd, "seen", schemas.SEEN)
    got_seen = {
        r.url_norm for r in seen.read().select("url_norm").collect()
    }
    assert got_seen == want.seen
