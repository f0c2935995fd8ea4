"""Golden-stream regression: the parity encoder must reproduce the
committed digests exactly (SURVEY.md §4 item 1 — the format pin)."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


def test_golden_streams():
    import golden

    if not os.path.exists(golden.GOLDEN_PATH):
        pytest.skip("no committed goldens")
    with open(golden.GOLDEN_PATH) as f:
        want = json.load(f)
    got = golden.digests()
    assert got == want
