"""Convert a jax profiler trace (xplane.pb) into a per-HLO-op time table.

Companion to `tools/probe_scaling.py --trace DIR`: the probe captures traces
of the flagship search step at several batch sizes; this tool names where
the time goes — per-op category totals and the top individual fusions —
so scaling gaps can be attributed to specific HLOs rather than to "XLA
scheduling" (VERDICT r3 #2).

Uses the tensorboard profile plugin's converters (available in this image)
on the .xplane.pb files that `jax.profiler.trace` writes under
`<dir>/plugins/profile/<run>/`.

Usage:
    python tools/parse_trace.py <trace_dir> [--top N]
    # <trace_dir> = the directory passed to jax.profiler.trace(...)
"""

import argparse
import glob
import json
import os
import sys


def find_xplanes(trace_dir):
    pats = [os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb"),
            os.path.join(trace_dir, "**/*.xplane.pb")]
    for p in pats:
        hits = sorted(glob.glob(p, recursive=True))
        if hits:
            return hits
    return []


def hlo_op_table(xplane_path):
    """Return list of dicts: one row per (program, hlo op) with self-time."""
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    # tool names vary across plugin versions; try the known spellings
    last_err = None
    for tool in ("hlo_stats", "hlo_stats^", "hlo_op_stats"):
        try:
            data, _ = rtd.xspace_to_tool_data([xplane_path], tool, {})
            return data
        except Exception as e:  # noqa: BLE001 - version probing
            last_err = e
    raise RuntimeError(f"no hlo-stats converter worked: {last_err}")


def parse_hlo_stats_json(data, top=25):
    """hlo_stats emits a gviz-style JSON table; reduce it to
    (category totals, top self-time ops)."""
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    obj = json.loads(data)
    cols = [c.get("label") or c.get("id") for c in obj["cols"]]
    rows = [[(c or {}).get("v") for c in r["c"]] for r in obj["rows"]]

    def col(name_parts):
        for i, c in enumerate(cols):
            lc = (c or "").lower()
            if all(p in lc for p in name_parts):
                return i
        return None

    i_name = col(["hlo", "op", "name"]) or col(["op", "name"])
    i_cat = col(["category"])
    i_self = col(["total", "self", "time"]) or col(["self", "time"])
    i_expr = col(["expression"])
    if i_self is None or i_name is None:
        raise RuntimeError(f"unrecognized hlo_stats columns: {cols}")

    cats, ops = {}, []
    for r in rows:
        t = float(r[i_self] or 0.0)
        cat = (r[i_cat] if i_cat is not None else "?") or "?"
        cats[cat] = cats.get(cat, 0.0) + t
        ops.append((t, r[i_name],
                    (r[i_expr][:160] if i_expr is not None and r[i_expr]
                     else "")))
    ops.sort(reverse=True)
    return cats, ops[:top]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    a = ap.parse_args()

    xs = find_xplanes(a.trace_dir)
    if not xs:
        print(f"no .xplane.pb under {a.trace_dir}", file=sys.stderr)
        sys.exit(1)
    print(f"xplane: {xs[-1]}")
    data = hlo_op_table(xs[-1])
    cats, ops = parse_hlo_stats_json(data, a.top)

    total = sum(cats.values())
    print(f"\n== category self-time (total {total/1e6:.1f} ms of device "
          f"time traced) ==")
    for cat, t in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:40s} {t/1e6:9.2f} ms  {100*t/max(total,1e-9):5.1f}%")
    print(f"\n== top {a.top} ops by self-time ==")
    for t, name, expr in ops:
        print(f"  {t/1e6:8.2f} ms  {name}")
        if expr:
            print(f"             {expr}")


if __name__ == "__main__":
    main()
