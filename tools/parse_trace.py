"""Offline jax.profiler trace analysis (no TensorBoard).

Parses the ``*.xplane.pb`` files a ``jax.profiler.trace`` capture writes and
prints per-op device time, aggregated by op name, for the "XLA Ops" line only
(the "Async XLA Ops" line double-counts in-flight windows).  Use it to locate
the step-time budget on hardware where TensorBoard isn't available:

    python tools/parse_trace.py <trace_dir_or_xplane.pb> [top_n]

Requires the pure-python protobuf runtime for tensorflow's profiler protos
(set automatically below; must happen before protobuf import).
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def find_xplanes(path: str):
    if os.path.isfile(path):
        return [path]
    hits = []
    for root, _, files in os.walk(path):
        hits.extend(os.path.join(root, f) for f in files
                    if f.endswith(".xplane.pb"))
    return sorted(hits)


def parse(path: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    per_op = {}
    total_ps = 0
    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                per_op[name] = per_op.get(name, 0) + ev.duration_ps
                total_ps += ev.duration_ps
    return per_op, total_ps


def main():
    if len(sys.argv) < 2:
        print("usage: python tools/parse_trace.py <trace_dir_or_xplane.pb> "
              "[top_n]", file=sys.stderr)
        raise SystemExit(2)
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    per_op, total_ps = {}, 0
    for xp in find_xplanes(path):
        ops, tot = parse(xp)
        for k, v in ops.items():
            per_op[k] = per_op.get(k, 0) + v
        total_ps += tot
    if not total_ps:
        print("no XLA Ops events found", file=sys.stderr)
        return
    print(f"total device time: {total_ps / 1e9:.3f} ms over {len(per_op)} ops")
    for name, ps in sorted(per_op.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{ps / 1e9:10.3f} ms  {100 * ps / total_ps:5.1f}%  {name}")


if __name__ == "__main__":
    main()
