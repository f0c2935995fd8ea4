"""Doc-drift tripwires (VERDICT r4 weak #1: three rounds of test-count
drift — the fix is a test that FAILS when the docs go stale, not another
doc pointing at a doc).

ROADMAP.md carries a machine-readable marker::

    <!-- suite-count: NNN -->

test_roadmap_count_matches_collection collects the live suite in a
subprocess and asserts the marker matches. Adding/removing tests without
bumping the marker fails the suite loudly, which is the point.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _marker_count() -> int:
    with open(os.path.join(REPO, "ROADMAP.md")) as f:
        text = f.read()
    m = re.search(r"<!--\s*suite-count:\s*(\d+)\s*-->", text)
    assert m, "ROADMAP.md lost its '<!-- suite-count: N -->' marker"
    return int(m.group(1))


def test_roadmap_count_matches_collection():
    env = dict(os.environ)          # already the scrubbed CPU env
    env["TAC_TEST_REEXECED"] = "1"
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", os.path.join(REPO, "tests"),
         "--collect-only", "-q", "-p", "no:cacheprovider"],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, timeout=300)
    out = proc.stdout.decode(errors="replace")
    m = re.search(r"(\d+) tests collected", out)
    assert m, f"could not parse collection output:\n{out[-2000:]}"
    live = int(m.group(1))
    stated = _marker_count()
    assert live == stated, (
        f"ROADMAP.md says {stated} tests, live collection says {live} — "
        f"update the '<!-- suite-count -->' marker (and rerun "
        f"tools/run_suite.py for the SUITE.json record)")


def test_perf_cites_existing_sections():
    """Tools citing PERF.md sections must cite sections that exist
    (ADVICE r4: corpus_run.py advertised a section that didn't)."""
    with open(os.path.join(REPO, "PERF.md")) as f:
        perf = f.read()
    for tool, needle in (("tools/corpus_run.py", "Corpus at scale"),
                         ("tools/corpus10k.py", "corpus at scale")):
        path = os.path.join(REPO, tool)
        with open(path) as f:
            src = f.read()
        if needle.lower() in src.lower():
            assert needle.lower() in perf.lower(), (
                f"{tool} cites a PERF.md '{needle}' section that "
                f"does not exist")
