"""Device-trace summarization: the ``torch.profiler.key_averages().table()``
analog for ``jax.profiler.trace`` captures.

Parses the Chrome-trace json (``*.trace.json.gz``) that XLA's profiler writes
alongside the xplane proto and aggregates per-op durations on the device
lanes, producing a sorted text table.  Works on any backend that emits
device events (TPU/CPU).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
from collections import defaultdict
from typing import List, Optional, Tuple


def find_latest_trace(trace_dir: str) -> Optional[str]:
    pats = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                            recursive=True))
    return pats[-1] if pats else None


def summarize_trace(trace_dir: str, top_k: int = 15,
                    exclude_substrings: Tuple[str, ...] = (),
                    group_by: str = "op") -> str:
    """Aggregate device-lane op durations from the latest capture under
    ``trace_dir``; returns a formatted table string.

    ``group_by``: 'op' (fusion names), 'source' (framework source line that
    emitted the op — XLA keeps our file:line in the op metadata, so this
    attributes device time straight back to module code), or 'category'
    (hlo_category: convolution fusion / loop fusion / ...).
    """
    path = find_latest_trace(trace_dir)
    if path is None:
        return f"(no trace.json.gz found under {trace_dir})"
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # identify device process ids (TPU/device lanes; fall back to all complete
    # events if no device-labelled process exists)
    device_pids = set()
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = str(ev.get("args", {}).get("name", "")).lower()
            if any(t in name for t in ("tpu", "device", "gpu", "/xla")):
                device_pids.add(ev.get("pid"))
    totals = defaultdict(float)
    counts = defaultdict(int)
    total_dur = 0.0
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if device_pids and ev.get("pid") not in device_pids:
            continue
        args = ev.get("args", {}) or {}
        if group_by == "source":
            name = str(args.get("source", "")) or ev.get("name", "?")
            name = name.replace("/root/repo/convnet_approximater_tpu/", "")
        elif group_by == "category":
            name = str(args.get("hlo_category", "")) or "(uncategorized)"
        else:
            name = ev.get("name", "?")
        if any(s in name for s in exclude_substrings):
            continue
        # only count leaf device ops when grouping by metadata (envelope
        # events like the jit module wrapper have no per-op args)
        if group_by in ("source", "category") and "hlo_category" not in args:
            continue
        dur = float(ev["dur"])  # microseconds
        totals[name] += dur
        counts[name] += 1
        total_dur += dur
    if not totals:
        return f"(no device op events in {path})"
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[:top_k]
    width = max(min(max(len(n) for n, _ in rows), 60), 20)
    lines = [
        f"{'op':<{width}} | {'total ms':>9} | {'count':>6} | {'%':>6}",
        "-" * (width + 32),
    ]
    for name, dur in rows:
        disp = name if len(name) <= width else name[: width - 1] + "…"
        lines.append(
            f"{disp:<{width}} | {dur / 1e3:9.3f} | {counts[name]:6d} | "
            f"{dur / total_dur * 100:5.1f}%"
        )
    lines.append(f"{'TOTAL (device ops)':<{width}} | {total_dur / 1e3:9.3f} |")
    return "\n".join(lines)
