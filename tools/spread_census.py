#!/usr/bin/env python3
"""Per-query spread census over COMMITTED bench captures (r17 verdict
item 4) — no new runs, just the artifacts already on disk.

Question it answers: is the global regression band (1.5x + 0.3s floor,
Bench.regressionsSplit) calibrated to this suite's MEASURED cross-round
variance, or should it tighten / loosen / grow per-query jitterBand
entries?

Sources, grouped by SF tier:
  - sf0.1: BENCH_r01..rN.json (driver capture wrappers whose `tail`
    embeds the bench "total" line — the queries map survives at the
    tail end, so each round contributes its tail-visible subset) plus
    BENCH_LOCAL.json (the committed quiet baseline, full line format).
  - sf30 / sf100: BENCH_SF30_SUITE.json / BENCH_SF100_SUITE.json +
    BENCH_SF100_FIRST10_R17.json (single captures — values reported,
    spread only where >= 2 captures exist).

Cross-round variance at sf0.1 CONFOUNDS host drift with code change in
the early rounds, so the decision stats use the stable window (the
rounds since the operator surface froze, --stable-from, default r10)
and the full history is reported alongside for context.

Usage: tools/spread_census.py [--repo /root/repo] [--stable-from 10]
       [--out SPREAD_CENSUS_R18.json]
Prints a human summary; writes one JSON artifact.
"""
import argparse
import glob
import json
import os
import re
import statistics
import sys

PAIR = re.compile(r'"(q_[a-z0-9_]+)":([0-9]+\.[0-9]+)')


def queries_from_total_line(obj):
    if obj.get("metric") == "total" and isinstance(obj.get("queries"), dict):
        return {k: float(v) for k, v in obj["queries"].items()}
    return None


def from_line_format(path):
    """Full Bench line format: one JSON object per line."""
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                q = queries_from_total_line(json.loads(line))
                if q:
                    return q
            except json.JSONDecodeError:
                continue
    return None


def from_wrapper(path):
    """Driver capture wrapper {"n":N,"rc":0,"tail":"..."}: recover the
    tail-visible slice of the queries map. The queries map is the LAST
    q_-keyed map on the total line, immediately before "value": — walk
    back from the final "value": to the preceding '}' and harvest
    well-formed "q_x":float pairs (a head-truncated first pair is
    dropped by the regex)."""
    with open(path) as f:
        w = json.load(f)
    if not isinstance(w, dict) or "tail" not in w:
        return None
    tail = w["tail"]
    # Prefer a complete embedded total line when the tail holds one.
    for m in re.finditer(r'\{"metric":"total",.*', tail):
        frag = m.group(0).split("\n", 1)[0]
        try:
            q = queries_from_total_line(json.loads(frag))
            if q:
                return q
        except json.JSONDecodeError:
            pass
    anchor = tail.rfind('},"value":')
    if anchor < 0:
        return None
    # The queries map opens at the last '"queries":{' if visible, else
    # at the tail head (truncated mid-map).
    start = tail.rfind('"queries":{', 0, anchor)
    start = start + len('"queries":{') if start >= 0 else 0
    return {k: float(v) for k, v in PAIR.findall(tail[start:anchor])}


def round_scales(samples):
    """Robust per-round global drift factor: the median, over the
    queries a round shares with the cross-round per-query median, of
    sec/median. The per-round regression lint compares against an
    ANCHOR-SCALED prior, so global host drift never reaches the 1.5x
    gate — a band calibration must remove it the same way or it reads
    one contended round (r14: ~1.8x across the board) as 28 per-query
    band breaches."""
    med = {}
    byq = {}
    for q, xs in samples.items():
        byq[q] = dict(xs)
        med[q] = statistics.median(s for _, s in xs)
    tags = sorted({t for xs in samples.values() for t, _ in xs})
    scales = {}
    for t in tags:
        ratios = [byq[q][t] / med[q] for q in byq
                  if t in byq[q] and med[q] > 0]
        scales[t] = statistics.median(ratios) if ratios else 1.0
    return scales


def normalized(samples, scales):
    return {q: [(t, s / scales[t]) for t, s in xs]
            for q, xs in samples.items()}


def census(samples):
    """samples: {query: [(roundTag, sec), ...]} -> per-query stats."""
    out = {}
    for q, xs in sorted(samples.items()):
        secs = sorted(s for _, s in xs)
        mn, mx = secs[0], secs[-1]
        # Trimmed spread (drop one extreme each end at n >= 5): a single
        # contended capture (r14: per-query co-scheduling spikes of
        # 3-12x while the round MEDIAN drifted only 1.33x) must not
        # calibrate a band that every quiet round then inherits. The
        # raw max stays visible alongside.
        trimmed = secs[1:-1] if len(secs) >= 5 else secs
        tmn, tmx = trimmed[0], trimmed[-1]
        out[q] = {
            "n": len(secs),
            "min": round(mn, 4),
            "median": round(statistics.median(secs), 4),
            "max": round(mx, 4),
            "spread": round(mx / mn, 3) if mn > 0 else None,
            "spread_trimmed": round(tmx / tmn, 3) if tmn > 0 else None,
            "abs_delta_trimmed": round(tmx - tmn, 4),
            "abs_delta": round(mx - mn, 4),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default="/root/repo")
    ap.add_argument("--stable-from", type=int, default=10,
                    help="first round of the stable-surface window")
    ap.add_argument("--out", default="SPREAD_CENSUS_R18.json")
    a = ap.parse_args()
    os.chdir(a.repo)

    full, stable = {}, {}
    rounds_used, rounds_stable = [], []
    for path in sorted(glob.glob("BENCH_r[0-9]*.json")):
        rn = int(re.search(r"BENCH_r(\d+)\.json", path).group(1))
        q = from_wrapper(path) or from_line_format(path)
        if not q:
            continue
        rounds_used.append(rn)
        for k, v in q.items():
            full.setdefault(k, []).append((f"r{rn}", v))
        if rn >= a.stable_from:
            rounds_stable.append(rn)
            for k, v in q.items():
                stable.setdefault(k, []).append((f"r{rn}", v))
    lq = from_line_format("BENCH_LOCAL.json")
    if lq:
        for k, v in lq.items():
            full.setdefault(k, []).append(("local", v))
            stable.setdefault(k, []).append(("local", v))

    big = {}
    for tier, paths in (("sf30", ["BENCH_SF30_SUITE.json"]),
                        ("sf100", ["BENCH_SF100_SUITE.json",
                                   "BENCH_SF100_FIRST10_R17.json"])):
        acc = {}
        for p in paths:
            if not os.path.exists(p):
                continue
            q = from_line_format(p) or from_wrapper(p)
            if q:
                for k, v in q.items():
                    acc.setdefault(k, []).append((p, v))
        big[tier] = census(acc)

    scales = round_scales(stable)
    st_raw = census(stable)
    st = census(normalized(stable, scales))
    fu = census(full)
    # Decision inputs: stable-window queries with >= 3 samples whose
    # DRIFT-NORMALIZED spread exceeds the 1.5x gate AND whose absolute
    # delta exceeds the 0.3 s floor — exactly the population the
    # per-round lint could false-positive on after its own anchor
    # scaling. Queries breaching only one gate are noise the AND-ed
    # gate already absorbs.
    would_flag = {q: s for q, s in st.items()
                  if s["n"] >= 5 and s["spread_trimmed"]
                  and s["spread_trimmed"] > 1.5
                  and s["abs_delta_trimmed"] > 0.3}
    near = {q: s for q, s in st.items()
            if s["n"] >= 5 and s["spread_trimmed"]
            and 1.3 < s["spread_trimmed"] <= 1.5
            and s["abs_delta_trimmed"] > 0.3}

    artifact = {
        "metric": "spread_census",
        "rounds": rounds_used,
        "stable_window": rounds_stable + (["local"] if lq else []),
        "gate": {"ratio": 1.5, "abs_floor_sec": 0.3},
        "round_drift_scales": {t: round(s, 4) for t, s in scales.items()},
        "stable": st,
        "stable_raw_unnormalized": st_raw,
        "full_history": fu,
        "big_sf": big,
        "band_breachers_stable": would_flag,
        "near_band_stable": near,
    }
    with open(a.out, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)

    n_st = len(st)
    print(f"[census] rounds parsed: {rounds_used} "
          f"(stable window: r{a.stable_from}+ -> {len(rounds_stable)} rounds"
          f"{' + local' if lq else ''})")
    print("[census] per-round drift scales: "
          + " ".join(f"{t}={s:.2f}" for t, s in sorted(scales.items())))
    print(f"[census] stable-window queries with >=3 samples: "
          f"{sum(1 for s in st.values() if s['n'] >= 3)}/{n_st}")
    print(f"[census] gate breachers (trimmed spread>1.5x AND trimmed "
          f"delta>0.3s, n>=5): {len(would_flag)}")
    for q, s in sorted(would_flag.items(),
                       key=lambda kv: -kv[1]["spread_trimmed"]):
        print(f"  BREACH {q}: n={s['n']} min={s['min']} med={s['median']} "
              f"max={s['max']} spread={s['spread']}x "
              f"trimmed={s['spread_trimmed']}x "
              f"tdelta={s['abs_delta_trimmed']}s")
    print(f"[census] near-band (trimmed 1.3x..1.5x AND tdelta>0.3s): "
          f"{len(near)}")
    for q, s in sorted(near.items(),
                       key=lambda kv: -kv[1]["spread_trimmed"]):
        print(f"  NEAR   {q}: n={s['n']} min={s['min']} med={s['median']} "
              f"max={s['max']} spread={s['spread']}x "
              f"trimmed={s['spread_trimmed']}x "
              f"tdelta={s['abs_delta_trimmed']}s")
    print(f"[census] wrote {a.out}")


if __name__ == "__main__":
    sys.exit(main())
