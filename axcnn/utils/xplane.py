"""Minimal XSpace/XPlane profile-trace reader (no proto codegen).

``jax.profiler.trace`` writes ``*.xplane.pb`` — a serialized
``tensorflow.profiler.XSpace`` protobuf holding per-device "planes" of
timed events (one event per executed kernel/fusion, with picosecond
durations). The TensorBoard profile plugin's generated bindings in this
image are gen-incompatible with the installed protobuf, and pulling in a
proto toolchain for four message types is overkill — the wire format is
stable and trivial, so this module parses it directly.

Schema subset (tensorflow/tsl/profiler/protobuf/xplane.proto):

    XSpace:            repeated XPlane planes = 1
    XPlane:            name=2, lines=3, event_metadata=4 (map<int64,XEventMetadata>)
    XLine:             name=2, timestamp_ns=3, events=4
    XEvent:            metadata_id=1, offset_ps=2, duration_ps=3
    XEventMetadata:    id=1, name=2, display_name=3

Used by scripts/profile_roofline.py to turn a trace into a per-fusion
time table reconciled against the optimized HLO's byte counts — the
profiler-truth replacement for the cost-model roofline (the cost model's
"bytes accessed" counts logical operand bytes and reported an impossible
103% HBM utilization in round 2).
"""

from __future__ import annotations

import dataclasses
import glob
import os


def _varint(buf: bytes, i: int):
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def fields(buf: bytes):
    """Yield (field_number, wire_type, value) for one message's wire bytes.

    value: int for varint(0)/fixed(1,5), bytes for length-delimited(2).
    """
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            val, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            val = buf[i:i + ln]
            i += ln
        elif wt == 1:
            val = int.from_bytes(buf[i:i + 8], "little")
            i += 8
        elif wt == 5:
            val = int.from_bytes(buf[i:i + 4], "little")
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt} at {i}")
        yield fno, wt, val


@dataclasses.dataclass
class Event:
    name: str
    offset_ps: int
    duration_ps: int


@dataclasses.dataclass
class Line:
    name: str
    timestamp_ns: int
    events: list


@dataclasses.dataclass
class Plane:
    name: str
    lines: list


def _parse_event(buf: bytes, meta: dict) -> Event:
    mid = off = dur = 0
    for fno, _, val in fields(buf):
        if fno == 1:
            mid = val
        elif fno == 2:
            off = val
        elif fno == 3:
            dur = val
    return Event(meta.get(mid, f"#{mid}"), off, dur)


def _parse_line(buf: bytes, meta: dict) -> Line:
    name = ""
    ts = 0
    events = []
    for fno, _, val in fields(buf):
        if fno == 2:
            name = val.decode("utf-8", "replace")
        elif fno == 3:
            ts = val
        elif fno == 4:
            events.append(_parse_event(val, meta))
    return Line(name, ts, events)


def _parse_event_metadata(buf: bytes):
    mid = 0
    name = display = ""
    for fno, _, val in fields(buf):
        if fno == 1:
            mid = val
        elif fno == 2:
            name = val.decode("utf-8", "replace")
        elif fno == 3:
            display = val.decode("utf-8", "replace")
    return mid, display or name


def _parse_plane(buf: bytes) -> Plane:
    name = ""
    line_bufs = []
    meta = {}
    for fno, _, val in fields(buf):
        if fno == 2:
            name = val.decode("utf-8", "replace")
        elif fno == 3:
            line_bufs.append(val)
        elif fno == 4:  # map entry: key=1 varint, value=2 XEventMetadata
            mid = None
            md = None
            for kfno, _, kval in fields(val):
                if kfno == 1:
                    mid = kval
                elif kfno == 2:
                    md = kval
            if md is not None:
                pid, pname = _parse_event_metadata(md)
                meta[mid if mid is not None else pid] = pname
    return Plane(name, [_parse_line(b, meta) for b in line_bufs])


def parse_xspace(path: str) -> list[Plane]:
    with open(path, "rb") as f:
        buf = f.read()
    return [_parse_plane(val) for fno, _, val in fields(buf) if fno == 1]


def find_xplane_files(trace_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                            recursive=True))


def device_planes(planes: list[Plane]) -> list[Plane]:
    """Planes that look like accelerator timelines (not host threads)."""
    out = [p for p in planes
           if "TPU" in p.name or "GPU" in p.name or "/device:" in p.name]
    return out or [p for p in planes if any(
        "XLA Op" in ln.name or "Steps" in ln.name for ln in p.lines)]


def op_totals(plane: Plane, *, line_filter=None) -> dict:
    """Aggregate event durations per op name across a plane's lines.

    Returns {name: {"total_ps": int, "count": int}} sorted by total desc.
    """
    agg = {}
    for ln in plane.lines:
        if line_filter is not None and not line_filter(ln.name):
            continue
        for ev in ln.events:
            d = agg.setdefault(ev.name, {"total_ps": 0, "count": 0})
            d["total_ps"] += ev.duration_ps
            d["count"] += 1
    return dict(sorted(agg.items(), key=lambda kv: -kv[1]["total_ps"]))
