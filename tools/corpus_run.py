"""Run `tac.cli corpus` / `corpus-decode` with wall + peak-RSS accounting.

Wrapper for the BASELINE config-4 scale run (PERF.md "corpus at scale"):
same CLI surface, plus one JSON line at exit with wall seconds and
ru_maxrss, so the 10k-clip record includes the memory ceiling.

Usage: python tools/corpus_run.py corpus <wavs...> -o DIR --preset P
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from tac.cli import main as cli_main

    t0 = time.perf_counter()
    rc = cli_main(sys.argv[1:])
    wall = time.perf_counter() - t0
    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    print(json.dumps({"corpus_run_wall_s": round(wall, 1),
                      "peak_rss_mb": round(rss_mb, 1)}))
    return rc


if __name__ == "__main__":
    sys.exit(main())
