"""Unit tests for bench.py's probe-gated throttle-insurance policy.

The adaptive extra headline-crawl attempt must fire only when no prior
attempt launched in a healthy window AND the host has measurably
improved — otherwise it would either burn time re-measuring the same
throttle or (worse) look like cherry-picking. The gate is a pure
function precisely so this policy is pinned here without running a
crawl.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _extra_attempt_allowed


def test_no_retry_when_any_attempt_was_healthy():
    # attempt 1 launched at probe 0.6 s — its wall is trustworthy, an
    # extra attempt can only add noise
    assert not _extra_attempt_allowed([0.6, 4.2], fresh_probe=0.3)
    assert not _extra_attempt_allowed([1.0, 3.0], fresh_probe=0.2)  # 1.0 counts as healthy


def test_no_retry_when_window_has_not_improved():
    # both attempts throttled, and the fresh probe is as bad or worse:
    # a retry would re-measure the same hypervisor state
    assert not _extra_attempt_allowed([2.5, 3.8], fresh_probe=2.5)
    assert not _extra_attempt_allowed([2.5, 3.8], fresh_probe=6.0)


def test_retry_when_all_throttled_and_window_improved():
    assert _extra_attempt_allowed([2.5, 3.8], fresh_probe=1.1)
    assert _extra_attempt_allowed([1.3, 4.2], fresh_probe=0.4)


def test_single_attempt_list():
    # BENCH_CRAWL_REPEATS=1 with max_extra forced on still gates correctly
    assert _extra_attempt_allowed([5.0], fresh_probe=0.5)
    assert not _extra_attempt_allowed([0.4], fresh_probe=0.2)
