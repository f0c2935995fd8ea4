"""Per-op device-time report from a jax.profiler trace dump.

The image ships no working xplane proto bindings (tensorboard_plugin_profile's
generated code predates the installed protobuf), so this parses the XSpace
wire format directly — the schema is tiny (XSpace > XPlane > XLine > XEvent)
and only lengths/varints are needed to aggregate event durations.

Usage:
    python tools/trace_report.py <trace_dir> [top_n]

Finds the newest `*.xplane.pb` under <trace_dir>, aggregates device-plane
event durations by op name, and prints one line per op: total ms, count,
and share of the plane's busy time. Host planes are skipped.
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict


def _varint(buf: memoryview, i: int) -> tuple[int, int]:
    x = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << s
        if not b & 0x80:
            return x, i
        s += 7


def _fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over one message's bytes.
    value is an int for varint/fixed fields, a memoryview for length-delim."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = int.from_bytes(buf[i:i + 4], "little")
            i += 4
        elif wt == 1:
            v = int.from_bytes(buf[i:i + 8], "little")
            i += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def parse_plane(plane: memoryview):
    """XPlane → (name, {metadata_id: name}, [(metadata_id, duration_ps)])."""
    name = ""
    meta = {}
    events = []
    for fno, _, v in _fields(plane):
        if fno == 2:
            name = bytes(v).decode()
        elif fno == 4:  # map<int64, XEventMetadata>
            mid, mname = 0, ""
            for kf, _, kv in _fields(v):
                if kf == 1:
                    mid = kv
                elif kf == 2:  # XEventMetadata
                    for ef, _, ev in _fields(kv):
                        if ef == 1:
                            mid = ev
                        elif ef == 2:
                            mname = bytes(ev).decode()
            meta[mid] = mname
        elif fno == 3:  # XLine
            for lf, _, lv in _fields(v):
                if lf == 4:  # XEvent
                    eid = dur = 0
                    for ef, _, ev in _fields(lv):
                        if ef == 1:
                            eid = ev
                        elif ef == 3:
                            dur = ev
                    events.append((eid, dur))
    return name, meta, events


def report(path: str, top_n: int = 30) -> None:
    with open(path, "rb") as f:
        space = memoryview(f.read())
    for fno, _, plane in _fields(space):
        if fno != 1:
            continue
        name, meta, events = parse_plane(plane)
        if "TPU" not in name and "GPU" not in name and "/device" not in name:
            continue
        agg = defaultdict(lambda: [0, 0])
        for mid, dur in events:
            a = agg[meta.get(mid, str(mid))]
            a[0] += dur
            a[1] += 1
        total = sum(a[0] for a in agg.values())
        print(f"== plane: {name}  busy {total / 1e9:.3f} ms "
              f"({len(events)} events)")
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top_n]
        for op, (ps, cnt) in rows:
            print(f"  {ps / 1e9:9.3f} ms  {cnt:6d}x  "
                  f"{100.0 * ps / max(total, 1):5.1f}%  {op[:110]}")


def main() -> None:
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    pbs = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not pbs:
        sys.exit(f"no *.xplane.pb under {trace_dir}")
    report(pbs[-1], top_n)


if __name__ == "__main__":
    main()
