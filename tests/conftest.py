import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# The whole suite runs with the shared-primitive contract guards ON
# (skew.global_topk_desc / keep_first_by_key verify their docstring
# preconditions at entry): any production call site that feeds a
# nullable measure, duplicate tiebreak, or ambiguous keep-first
# ordering fails ITS test instead of silently returning
# window-divergent rows (VERDICT r11 item 5).  The guard-behavior
# tests in test_properties.py monkeypatch this per-case.
os.environ.setdefault("CHAIN_SYNC_DEBUG_CONTRACTS", "1")

from chain_sync_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
