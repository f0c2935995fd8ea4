"""Run `tac.cli corpus` / `corpus-decode` with wall + peak-RSS accounting.

Wrapper for the BASELINE config-4 scale run (PERF.md "Corpus at scale"):
same CLI surface, plus one JSON line at exit with wall seconds and
ru_maxrss, so the 10k-clip record includes the memory ceiling. The
accounting line is emitted even if the run dies mid-way (argparse exit,
exception, Ctrl-C) — a crashed 10k run still leaves its wall/RSS record,
with an ``error`` field saying why.

ru_maxrss units: kilobytes on Linux (this box), bytes on macOS — guarded.

Usage: python tools/corpus_run.py corpus <wavs...> -o DIR --preset P
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rss_mb() -> float:
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    if sys.platform == "darwin":          # bytes, not KB
        rss /= 1024.0
    return rss / 1024.0


def main() -> int:
    from tac.cli import main as cli_main

    t0 = time.perf_counter()
    rc, err = 1, None
    try:
        rc = cli_main(sys.argv[1:])
    except SystemExit as e:               # argparse bad-flag exit
        rc = int(e.code or 0)
        if rc != 0:
            err = f"SystemExit({rc})"
    except KeyboardInterrupt:
        err = "KeyboardInterrupt"
        rc = 130
    except Exception as e:                # crash mid-run: record it anyway
        err = f"{type(e).__name__}: {e}"
        rc = 1
    finally:
        rec = {"corpus_run_wall_s": round(time.perf_counter() - t0, 1),
               "peak_rss_mb": round(_rss_mb(), 1), "rc": rc}
        if err:
            rec["error"] = err
        print(json.dumps(rec), flush=True)
    return rc


if __name__ == "__main__":
    sys.exit(main())
