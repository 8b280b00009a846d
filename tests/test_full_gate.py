"""Standing full-registry oracle gate.

The correctness driver samples ~50 queries per round; this test runs the
WHOLE registry (every ``queries()`` entry, oracle-checked where an
``oracle_sql()`` twin exists, rows-only otherwise) through the local
replica of the driver's gate so no query ships driver-unverified.

Runtime is ~5-10 minutes at sf0.01, so it is opt-in:

    RUN_FULL_GATE=1 python -m pytest tests/test_full_gate.py -q

The committed evidence of the latest run lives in ``FULLGATE.log`` at the
repo root (written by this test on success).
"""

from __future__ import annotations

import io
import os
import time
from contextlib import redirect_stdout

import pytest

RUN = os.environ.get("RUN_FULL_GATE") == "1"
SF_DIR = os.environ.get("FULL_GATE_SF_DIR", "/root/testdata/sf0.01")
LOG_PATH = os.path.join(os.path.dirname(os.path.dirname(__file__)), "FULLGATE.log")


@pytest.mark.skipif(not RUN, reason="set RUN_FULL_GATE=1 to run (~5-10 min)")
def test_every_registered_query_passes_oracle_gate():
    # check_oracle builds its own session via get_spark_session and prints
    # one ok/rows/FAIL line per query; exit value = failure count
    from tools import check_oracle

    buf = io.StringIO()
    argv_backup = check_oracle.sys.argv
    check_oracle.sys.argv = ["check_oracle.py", SF_DIR]
    try:
        with redirect_stdout(buf):
            failures = check_oracle.main()
    finally:
        check_oracle.sys.argv = argv_backup
    report = buf.getvalue()
    if failures == 0:
        with open(LOG_PATH, "w") as f:
            f.write(
                f"# full-registry oracle gate @ {SF_DIR} "
                f"({time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())})\n"
            )
            f.write(report)
    assert failures == 0, f"full gate failures:\n{report}"
