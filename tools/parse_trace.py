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
    # xprof is the maintained converter in this image; the older
    # tensorboard_plugin_profile wheel here is incompatible with the
    # installed TF pywrap (no xspace_to_tools_data)
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except Exception:
        from tensorboard_plugin_profile.convert import (
            raw_to_tool_data as rtd)

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

    def first(*cands):
        # explicit None check: a legitimate match at column 0 is falsy
        for c in cands:
            if c is not None:
                return c
        return None

    i_name = first(col(["hlo", "op", "name"]), col(["op", "name"]))
    i_cat = col(["category"])
    i_self = first(col(["total", "self", "time"]), col(["self", "time"]))
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


def find_json_traces(trace_dir):
    pats = [os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"),
            os.path.join(trace_dir, "**/*.trace.json.gz")]
    for p in pats:
        hits = sorted(glob.glob(p, recursive=True))
        if hits:
            return hits
    return []


def agg_json_trace(path):
    """Aggregate the perfetto-style trace.json.gz the jax profiler writes:
    per-op (name, total_dur_us, count, long_name) on the TPU 'XLA Ops'
    lane, plus the step count from the 'Steps' lane.

    This path is the reliable one on this image: the xprof hlo_stats
    converter undercounts device time ~1000x on these xplanes (5.7 ms
    reported for a trace whose Steps lane holds 5785 ms), while the JSON
    lanes tile the while-loop span exactly.
    """
    import gzip

    with gzip.open(path) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pnames, tnames = {}, {}
    for e in ev:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pnames[e["pid"]] = e["args"].get("name")
            if e.get("name") == "thread_name":
                tnames[(e["pid"], e.get("tid"))] = e["args"].get("name")
    tpu = {p for p, n in pnames.items() if "TPU" in (n or "")}
    ops, steps = {}, 0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in tpu:
            continue
        lane = tnames.get((e["pid"], e.get("tid")))
        if lane == "Steps":
            steps += 1
        elif lane == "XLA Ops":
            nm = e["name"]
            d, c, ln = ops.get(nm, (0.0, 0, ""))
            ops[nm] = (d + e.get("dur", 0), c + 1,
                       ln or str(e.get("args", {}).get("long_name", "")))
    return ops, max(steps, 1)


_BUCKETS = (
    # (label, predicate on (name, long_name)) — first match wins.
    # Shapes: the augment front runs at (b*d, M, ...) rank-5/one-hot-65536
    # shapes; BN-stat fusions reduce a bf16 activation into f32[C] vectors;
    # weight-grads write f32[kh,kw,ci,co] param-shaped outputs.
    ("while(step)", lambda n, ln: n.startswith("while")),
    ("aug_front", lambda n, ln: ",6,3]" in ln or ",6,254," in ln
        or ",6,256," in ln or "65536" in ln or ",6,3," in ln),
    ("bn_stats+act", lambda n, ln: n.startswith("convert_reduce_fusion")),
    ("weight_grad", lambda n, ln: n.startswith("multiply_add_fusion")),
    ("copy/format", lambda n, ln: n.startswith(("copy", "transpose",
                                                "bitcast", "reshape"))),
)


def bucket_of(name, long_name):
    for label, pred in _BUCKETS:
        try:
            if pred(name, long_name):
                return label
        except Exception:
            pass
    return "conv/other"


def report_json(path, top=25, imgs_per_step=None, steps_override=None):
    ops, steps = agg_json_trace(path)
    # the profiler's Steps lane groups multiple scan iterations per
    # "step" event (measured: 9 events for 3 calls x 10 lax.scan
    # iterations) — pass the true semantic step count when known
    if steps_override:
        steps = steps_override
    # the while op spans the whole step; exclude it from totals so buckets
    # partition the actual busy time
    body = {n: v for n, v in ops.items() if not n.startswith("while")}
    total = sum(d for d, _, _ in body.values())
    print(f"{path}\n  steps traced: {steps}; device busy "
          f"{total/steps/1e3:.2f} ms/step (body ops)")
    buckets = {}
    for n, (d, c, ln) in body.items():
        buckets.setdefault(bucket_of(n, ln), [0.0, 0])[0] += d
    print("  == bucket ms/step ==")
    for b, (d, _) in sorted(buckets.items(), key=lambda kv: -kv[1][0]):
        line = f"    {b:14s} {d/steps/1e3:8.2f} ms  {100*d/total:5.1f}%"
        if imgs_per_step:
            line += f"  {d/steps/imgs_per_step:8.2f} us/img"
        print(line)
    rows = sorted(body.items(), key=lambda kv: -kv[1][0])[:top]
    print(f"  == top {top} ops (ms/step) ==")
    for n, (d, c, ln) in rows:
        print(f"    {d/steps/1e3:7.3f} ms x{c//steps:<3d} "
              f"[{bucket_of(n, ln):12s}] {n}")
        if ln:
            print(f"             {ln[:150]}")
    return {b: d / steps / 1e3 for b, (d, _) in buckets.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--raw", action="store_true",
                    help="aggregate the trace.json.gz directly (reliable "
                         "on this image; see agg_json_trace docstring)")
    ap.add_argument("--imgs-per-step", type=int, default=None)
    ap.add_argument("--steps", type=int, default=None,
                    help="true semantic step count in the trace (calls x "
                         "scan length); the Steps lane undercounts")
    a = ap.parse_args()

    if a.raw:
        js = find_json_traces(a.trace_dir)
        if not js:
            print(f"no .trace.json.gz under {a.trace_dir}", file=sys.stderr)
            sys.exit(1)
        report_json(js[-1], a.top, a.imgs_per_step, a.steps)
        return

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
