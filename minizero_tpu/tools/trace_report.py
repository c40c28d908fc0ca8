"""XPlane trace report: aggregate device op time from a jax.profiler trace.

Makes the JAX profiler actionable without TensorBoard (SURVEY §5.1 — the
reference has no profiler at all; here per-op device-time attribution is a
one-liner). Reads the ``*.xplane.pb`` produced by ``jax.profiler.trace`` /
``tools/profile.py -trace_dir``, walks the TPU device planes, and prints the
top-k XLA ops by total self time, grouped either by op name or by the JAX
source line recorded in the op metadata.

    python -m minizero_tpu.tools.trace_report -trace_dir /tmp/mz_trace
    python -m minizero_tpu.tools.trace_report -trace_dir /tmp/mz_trace -by source
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re


def _load_xspaces(trace_dir: str):
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    spaces = []
    for p in sorted(paths):
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        spaces.append((p, xs))
    return spaces


def aggregate(trace_dir: str, by: str = "op", device_filter: str = "TPU"):
    """Return (rows, total_ps): rows = [(key, total_ps, count)] sorted desc.

    ``by``: 'op' groups by event/metadata name; 'source' groups by the JAX
    source location stanza in the op's metadata (tf_op / source stats).
    """
    spaces = _load_xspaces(trace_dir)
    totals = collections.Counter()
    counts = collections.Counter()
    total_ps = 0
    for _, xs in spaces:
        for plane in xs.planes:
            if device_filter not in plane.name:
                continue
            ev_meta = plane.event_metadata
            stat_meta = plane.stat_metadata
            for line in plane.lines:
                # XLA op lines carry per-op events; "XLA Modules"/steps are
                # aggregates — skip them to avoid double counting
                if "XLA Ops" not in line.name and "XLA TraceMe" not in line.name \
                        and not re.match(r".*[Oo]ps.*", line.name):
                    continue
                for ev in line.events:
                    md = ev_meta.get(ev.metadata_id)
                    name = md.name if md else str(ev.metadata_id)
                    dur = ev.duration_ps
                    key = name
                    if by == "source":
                        # the JAX source location rides the EVENT METADATA's
                        # stats (XEventMetadata.stats, "source"/"tf_op"), not
                        # the per-event stats (those carry only timings)
                        key = "<unknown>"
                        md_stats = list(md.stats) if md else []
                        for st in list(ev.stats) + md_stats:
                            smd = stat_meta.get(st.metadata_id)
                            if smd and smd.name in ("tf_op", "source", "equation"):
                                which = st.WhichOneof("value")
                                if which == "ref_value":
                                    sm2 = stat_meta.get(st.ref_value)
                                    key = sm2.name if sm2 else key
                                elif which == "str_value":
                                    key = st.str_value
                                break
                        if key == "<unknown>":
                            # fall back to the op-name prefix before a dot
                            key = name.split(".")[0]
                    totals[key] += dur
                    counts[key] += 1
                    total_ps += dur
    rows = [(k, v, counts[k]) for k, v in totals.most_common()]
    return rows, total_ps


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-trace_dir", required=True)
    parser.add_argument("-by", choices=["op", "source"], default="op")
    parser.add_argument("-top", type=int, default=40)
    args = parser.parse_args(argv)

    rows, total_ps = aggregate(args.trace_dir, by=args.by)
    if not rows:
        print("no device op events found (is this a device trace?)")
        return 1
    print(f"total device op time: {total_ps / 1e9:.3f} ms over {len(rows)} keys")
    for key, ps, cnt in rows[: args.top]:
        print(f"{ps / 1e9:10.3f} ms  {cnt:7d}x  {key}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
