"""Parse jax.profiler XSpace traces into per-op device-time tables.

Why this exists: wall-clock timing through the axon tunnel carries a
variable dispatch/fetch cost (measured 0.01-0.5 s per invocation, and the
SAME binary read 577 vs 434 img/s hours apart on 2026-08-19), so the
headline bench number moved round to round for reasons that had nothing to
do with the model. The device timeline in the profiler trace has none of
that noise: the `while` envelope of a fori_loop-of-forwards measures
exactly K forwards of device time including intra-loop scheduling gaps.
bench.py and scripts/profile_eval.py both parse traces through here.

The reference has no analogue (torch benchmarking on a local GPU doesn't
face a tunnel); the closest is its compute_flops_and_speeds harness
(reference eval_all.py / test.py timing loops).
"""

from __future__ import annotations

import glob
import importlib
import os
from typing import Dict, List, Tuple

# per-op record: [total_seconds, event_count, category]
OpTable = Dict[str, List]


def _load_xplane_proto():
    """The xplane proto ships under different module paths depending on
    which profiler plugin the image bundles — probe the known homes."""
    for modpath in (
        "xprof.protobuf.xplane_pb2",
        "tensorboard_plugin_profile.protobuf.xplane_pb2",
        "tensorflow.tsl.profiler.protobuf.xplane_pb2",
    ):
        try:
            return importlib.import_module(modpath)
        except ImportError:
            continue
    return None


def name_category(name: str) -> str:
    """Heuristic HLO category from the instruction name (the axon trace
    carries no per-event category stat): '%loop_convolution_fusion.9' ->
    convolution, '%dot.12' -> dot, '%fusion.4433' -> fusion:fusion ..."""
    base = name.lstrip("%").split(" ")[0].split("=")[0]
    base = base.rstrip("0123456789").rstrip(".")
    for key in ("convolution", "dot", "while", "copy", "all-reduce",
                "reduce", "custom-call", "infeed", "outfeed"):
        if key in base:
            return key
    if "fusion" in base:
        return "fusion:" + base
    return base or "uncategorized"


def parse_trace(trace_dir: str) -> Tuple[OpTable, float]:
    """Aggregate device op time from the newest xplane.pb under trace_dir.

    Only the synchronous "XLA Ops" timeline is counted: "Async XLA Ops"
    events are DMA windows that OVERLAP compute, so adding them inflates
    and distorts the breakdown. Returns ({name: [seconds, count, category]},
    total_seconds). Raises RuntimeError when no trace or proto is found.
    """
    xplane_pb2 = _load_xplane_proto()
    if xplane_pb2 is None:
        raise RuntimeError("no xplane_pb2 proto module available")
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        raise RuntimeError(f"no xplane.pb under {trace_dir}")
    path = max(paths, key=os.path.getmtime)

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    per_op: OpTable = {}
    total = 0.0
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        stats_meta = {k: v.name for k, v in plane.stat_metadata.items()}
        ev_meta = {k: v for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = ev_meta.get(ev.metadata_id)
                name = md.name if md else str(ev.metadata_id)
                dur = ev.duration_ps / 1e12
                cat = None
                for st in ev.stats:
                    sname = stats_meta.get(st.metadata_id, "")
                    if sname in ("hlo_category", "category"):
                        cat = st.str_value or None
                if cat is None:
                    cat = name_category(name)
                rec = per_op.setdefault(name, [0.0, 0, cat])
                rec[0] += dur
                rec[1] += 1
                if cat and not rec[2]:
                    rec[2] = cat
                total += dur
    return per_op, total


def while_envelope_seconds(per_op: OpTable) -> float:
    """Device time of the outermost `while` loop in the trace.

    A jitted fori_loop lowers to a single while whose body ops ALSO appear
    as individual events — the envelope is the truest end-to-end device
    time for the looped region. Nested whiles (none in this model today,
    but e.g. a lax.scan inside the body would add one) would each
    contribute their own envelope, so take the LARGEST per-op total, not
    the sum. Returns 0.0 when the trace has no while."""
    best = 0.0
    for name, (dur, _cnt, _cat) in per_op.items():
        if name.lstrip("%").startswith("while"):
            best = max(best, dur)
    return best
