"""Summarize a jax.profiler xplane trace without tensorboard: hand-rolled
protobuf wire parsing of the XSpace schema, aggregating TPU op durations.

Usage: python tools/trace_summary.py <trace.xplane.pb> [top_n]

(The tensorboard_plugin_profile in this image is incompatible with the
installed TF; this standalone reader covers the 'which ops are hot' need for
kernel work.)
"""

from __future__ import annotations

import collections
import struct
import sys


def _varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def fields(buf):
    """Yield (field_number, wire_type, value) over a protobuf message."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _varint(buf, pos)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            val, pos = _varint(buf, pos)
        elif wt == 1:
            val = struct.unpack_from("<q", buf, pos)[0]
            pos += 8
        elif wt == 2:
            ln, pos = _varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            val = struct.unpack_from("<i", buf, pos)[0]
            pos += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, val


def parse_space(raw):
    """XSpace -> [(plane_name, {(line, op): total_duration_ps}, counts)].

    Handles the deployed schema: XPlane{name=2, lines=3,
    event_metadata=4 (map entry {key=1, value=XEventMetadata{id=1, name=2}})},
    XLine{id=1, name=2, events=4}, XEvent{metadata_id=1, offset_ps=2,
    duration_ps=3, stats=4}."""
    planes = []
    for fno, _wt, val in fields(raw):
        if fno != 1:
            continue
        name = ""
        ev_meta = {}
        lines = []
        for pf, _w, pv in fields(val):
            if pf == 2:
                name = pv.decode(errors="replace")
            elif pf == 3:
                lines.append(pv)
            elif pf == 4:  # map entry {key, XEventMetadata}
                mid, mname = None, ""
                for ef, _e, evv in fields(pv):
                    if ef == 1:
                        mid = evv
                    elif ef == 2 and isinstance(evv, bytes):
                        for mf, _m, mv in fields(evv):
                            if mf == 1 and mid is None:
                                mid = mv
                            elif mf == 2 and isinstance(mv, bytes):
                                mname = mv.decode(errors="replace")
                if mid is not None:
                    ev_meta[mid] = mname
        totals = collections.Counter()
        counts = collections.Counter()
        for line in lines:
            line_name = ""
            events = []
            for lf, _l, lv in fields(line):
                if lf == 2 and isinstance(lv, bytes):
                    line_name = lv.decode(errors="replace")
                elif lf == 4 and isinstance(lv, bytes):
                    events.append(lv)
            for lv in events:
                meta_id, dur = 0, 0
                for ef, _e, ev in fields(lv):
                    if ef == 1:
                        meta_id = ev
                    elif ef == 3:
                        dur = ev
                op = ev_meta.get(meta_id, f"id{meta_id}")
                key = (line_name, op.split(" = ")[0])
                totals[key] += dur
                counts[key] += 1
        planes.append((name, totals, counts))
    return planes


def main():
    path = sys.argv[1]
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    raw = open(path, "rb").read()
    for name, totals, counts in parse_space(raw):
        total = sum(totals.values())
        if total == 0:
            continue
        print(f"\n== plane '{name}': {total/1e9:.3f} ms total (all lines)")
        for (line, op), ps in totals.most_common(top):
            print(f"  {ps/1e9:9.3f} ms {ps/total*100:5.1f}% x{counts[(line, op)]:<5} [{line}] {op[:90]}")


if __name__ == "__main__":
    main()
