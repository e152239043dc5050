"""Aggregate a jax.profiler xplane trace into a device-op category table.

Parses the .xplane.pb written by ``TRACE=1 python benchmarks/step_cost.py``
(or any ``jax.profiler.trace`` capture) and sums device-lane event time by
XLA HLO category — the table format of BENCHMARKS.md "Trace-level
attribution".  Categories come from the trace's own ``hlo_category`` stat
when present, falling back to op-name heuristics.

Usage: python benchmarks/trace_categories.py /tmp/prof_scale5 [--ops N]
       (--ops N also prints the N most expensive individual ops)
"""
import glob
import os
import re
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def load_xspace(root: str) -> xplane_pb2.XSpace:
    pbs = sorted(glob.glob(os.path.join(root, "**", "*.xplane.pb"),
                           recursive=True))
    if not pbs:
        raise SystemExit(f"no .xplane.pb under {root}")
    xs = xplane_pb2.XSpace()
    with open(pbs[-1], "rb") as f:  # latest capture
        xs.ParseFromString(f.read())
    return xs, pbs[-1]


def heuristic_category(name: str) -> str:
    n = name.lower()
    if "convolution" in n or re.match(r"^conv", n):
        return "convolution fusion"
    if n.startswith("while"):
        return "while loop"
    if "custom-call" in n or n.startswith("custom_call") or "tpu_custom_call" in n:
        return "custom call (pallas)"
    if n.startswith(("copy", "transpose", "bitcast", "reshape", "concatenate",
                     "slice", "dynamic")):
        return "data formatting"
    if "fusion" in n:
        return "loop/elementwise fusion"
    if n.startswith(("rng", "threefry")):
        return "rng"
    if n.startswith(("all-reduce", "all-gather", "reduce-scatter",
                     "collective")):
        return "collective"
    return "other"


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_scale5"
    top_ops = 0
    if "--ops" in sys.argv:
        top_ops = int(sys.argv[sys.argv.index("--ops") + 1])
    xs, path = load_xspace(root)
    print(f"parsed {path}")

    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        stat_meta = plane.stat_metadata
        by_cat = defaultdict(float)      # ps
        by_op = defaultdict(float)       # ps
        cat_of_op = {}
        n_events = 0
        async_ms = 0.0
        serial_span_ms = 0.0
        for line in plane.lines:
            # XLA device lanes: "XLA Ops" is the serial execution lane;
            # "Async XLA Ops" carries overlapped copies (VMEM prefetch /
            # alternate-memory traffic) whose spans overlap compute —
            # summing them into the table would double-count, so they are
            # reported as one aggregate line instead.  Module/step lanes
            # duplicate the op lane wholesale.
            lname = line.name.lower()
            if "module" in lname or "step" in lname:
                continue
            if "async" in lname:
                async_ms += sum(e.duration_ps for e in line.events) / 1e9
                continue
            if line.events:
                t0 = min(e.offset_ps for e in line.events)
                t1 = max(e.offset_ps + e.duration_ps for e in line.events)
                serial_span_ms = max(serial_span_ms, (t1 - t0) / 1e9)
            for ev in line.events:
                md = ev_meta[ev.metadata_id]
                name = md.name
                cat = None
                for st in ev.stats:
                    sname = stat_meta[st.metadata_id].name
                    if sname == "hlo_category":
                        cat = (st.str_value
                               or stat_meta[st.value_metadata_id].name)
                for st in md.stats:
                    sname = stat_meta[st.metadata_id].name
                    if cat is None and sname == "hlo_category":
                        cat = (st.str_value
                               or stat_meta[st.value_metadata_id].name)
                if not cat:
                    cat = heuristic_category(name)
                by_cat[cat] += ev.duration_ps
                by_op[name] += ev.duration_ps
                cat_of_op[name] = cat
                n_events += 1
        if not by_cat:
            continue
        total = sum(by_cat.values())
        print(f"\nplane: {plane.name}  ({n_events} events, "
              f"{total / 1e9:.1f} ms serial-lane busy over a "
              f"{serial_span_ms:.1f} ms span; "
              f"{async_ms:.1f} ms of overlapped async-copy spans)")
        print(f"{'category':<32}{'ms':>10}{'share':>8}")
        for cat, ps in sorted(by_cat.items(), key=lambda kv: -kv[1]):
            print(f"{cat:<32}{ps / 1e9:>10.1f}{ps / total:>8.1%}")
        if top_ops:
            print(f"\ntop {top_ops} ops:")
            for name, ps in sorted(by_op.items(),
                                   key=lambda kv: -kv[1])[:top_ops]:
                print(f"  {ps / 1e9:>8.2f} ms  [{cat_of_op[name]}]  {name}")


if __name__ == "__main__":
    main()
