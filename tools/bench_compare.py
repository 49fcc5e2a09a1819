"""CI-style bench regression gate: diff a bench run against ANCHORS.json.

    python tools/bench_compare.py                     # BENCH_FULL.json
    python tools/bench_compare.py path/to/bench.json  # any bench dump
    python tools/bench_compare.py --factor 2.0        # ratio bar
    python tools/bench_compare.py --min-delta 0.5     # absolute-seconds bar

Exit codes: 0 = no query exceeds factor x its anchor; 1 = violations
(each printed with current / anchor / ratio); 2 = inputs unusable.

A query with NO anchor (first bench after registration) is reported
informationally and never fails the gate — run tools/bench_anchors.py
--merge afterwards to ratchet it in. The 2x default is the judge's bar
from BASELINE.md. A violation must ALSO exceed the anchor by
``--min-delta`` seconds (default 0.5): anchors are min-of-history, so
sub-second queries sit at the machine's lucky noise floor and double on
any ordinarily-loaded run — measured round 6, a clean 310 s full bench
still showed 16 sub-second "2x" exceedances while every multi-second
query was fine. The delta floor keeps the gate about plan regressions,
which cost whole seconds, not scheduler jitter.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("bench", nargs="?",
                    default=os.path.join(REPO, "BENCH_FULL.json"))
    ap.add_argument("--factor", type=float, default=2.0)
    ap.add_argument("--min-delta", type=float, default=0.5)
    ap.add_argument("--warn-factor", type=float, default=1.5,
                    help="ratio above which a query is WARNED (never fails "
                         "the gate) so drift is tracked before it trips the "
                         "hard bar; same --min-delta floor applies")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_anchors import ANCHOR_FLOOR

    ap.add_argument("--anchor-floor", type=float, default=ANCHOR_FLOOR,
                    help="effective anchor = max(recorded, floor). Recorded "
                         "minima under ~1 s are era artifacts (JIT-hot "
                         "mid-bench positions; the rotation later moves the "
                         "query to the cold prefix) — round 9's one "
                         "VIOLATION was a 0.856 s-anchored query whose quiet "
                         "fresh-session minimum is 1.3 s with unchanged "
                         "code. Policy + rationale: BASELINE.md round-10 "
                         "'Anchor-floor policy'.")
    ap.add_argument("--raw-factor", type=float, default=8.0,
                    help="catastrophic-regression bar judged against the "
                         "RAW anchor (no floor): the floor grants every "
                         "sub-second query a pass up to ~2 s, which is the "
                         "right noise immunity (VM drift measures <=3x) but "
                         "would also hide a 0.07 s query regressing to "
                         "1.9 s. A timing above raw-factor x raw anchor AND "
                         "1.0 s absolute over it violates regardless of the "
                         "floor.")
    ns = ap.parse_args()
    factor, min_delta = ns.factor, ns.min_delta
    bench_path = ns.bench
    anchors_path = os.path.join(REPO, "ANCHORS.json")

    try:
        bench = json.load(open(bench_path))
        anchors = json.load(open(anchors_path))
    except (OSError, json.JSONDecodeError) as exc:
        print(f"bench_compare: cannot load inputs: {exc}")
        return 2
    timings = bench.get("queries") or {}
    if not timings:
        print(f"bench_compare: no timings in {bench_path}")
        return 2

    violations, warnings_, drift, fresh = [], [], [], []
    for name, sec in sorted(timings.items()):
        raw = anchors.get(name)
        if raw is None:
            fresh.append((name, sec))
            continue
        anchor = max(raw, ns.anchor_floor)
        if sec - anchor > min_delta and sec > factor * anchor:
            violations.append((name, sec, anchor, sec / anchor))
        elif sec > ns.raw_factor * raw and sec - raw > 1.0:
            # catastrophic sub-floor regression: the floored check above
            # passes, but an 8x-the-raw-anchor blowup is far outside VM
            # drift (worst observed after warm retries: 3.75x) — a
            # 0.07 s query at 1.9 s is a plan regression, not jitter.
            violations.append((name, sec, raw, sec / raw))
        elif sec - anchor > min_delta and sec > ns.warn_factor * anchor:
            warnings_.append((name, sec, anchor, sec / anchor))
        elif raw < anchor and sec > factor * raw and sec - raw > min_delta:
            # sub-floor drift tracking: the floor grants sub-second
            # anchors noise immunity up to the hard tiers above, which
            # also made genuine 2-8x regressions of that class invisible
            # (a 0.9 s anchor at 1.9 s trips nothing). Keep them
            # machine-visible vs the RAW anchor — informational only,
            # never fails the gate, and counted apart from WARNING so
            # the warn tier keeps its quiet-VM signal.
            drift.append((name, sec, raw, sec / raw))

    # Era annotation (round-12 judge item 3), printed FIRST so the
    # reader (and the driver's truncated capture) has the discounting
    # context before any per-query line: a run whose recorded era
    # vector has a dimension far below the era the anchors were set
    # under gets its drift attributed to the named mechanism instead of
    # re-derived from timing shapes. (The round-12 bench proved the
    # need for the vector form: 8 violations on untouched queries under
    # a HEALTHY fault probe; the degraded dimension that day was disk.)
    from bench_anchors import (ERA_REF, ERA_SENSITIVITY, degraded_era_dims,
                               era_dims_min, local_era)

    probe = bench.get("era_probe") or bench.get("era")
    degraded = degraded_era_dims(probe)
    run_era = era_dims_min(probe)
    # Round-14: full dumps carry a probe every ~80 queries plus the run
    # order; each query is judged against the per-dim MIN of its two
    # BRACKETING probes, so a violation in a degraded 20-minute window
    # is labeled by the era it actually ran under, not the run's global
    # min (the r13 driver bench drifted 0.096 -> 0.366 GB/s disk across
    # one run — a single pre/post pair can't attribute that).
    timeline = bench.get("era_timeline")
    qseq = bench.get("query_seq")

    def query_era(name: str) -> tuple[dict, str]:
        """(era vector, scope label) — the query's bracketing-segment
        era when the record carries a timeline, else the whole run's."""
        loc = local_era(name, timeline, qseq)
        return (loc, "segment") if loc else (run_era, "run")

    # Per-query anchor-era stamps (round-13 judge item 3): which era the
    # run that SET each minimum was recorded under. Violations/warnings
    # get a sub-line comparing the current run's era to the anchor's —
    # a disk-bound query violating while the run's disk era sits far
    # below the anchor-setting run's is the documented VM window, shown
    # in place instead of requiring a manual triage session.
    try:
        anchor_eras = json.load(
            open(os.path.join(REPO, "ANCHOR_ERAS.json")))
    except (OSError, json.JSONDecodeError):
        anchor_eras = {}

    def era_note(name: str) -> str | None:
        info = anchor_eras.get(name)
        sens = ERA_SENSITIVITY.get(name)
        cur_era, scope = query_era(name)
        # mechanism fallback: when the anchor's era is unrecorded but the
        # query's binding dimension is known, compare the run against the
        # healthy REFERENCE for that dimension — a mechanism beats an
        # unexplained ratio
        sens_part = ""
        if sens:
            cur, ref = cur_era.get(sens), ERA_REF.get(sens)
            if isinstance(cur, (int, float)) and ref:
                sens_part = (f"; {sens}-bound query — {scope} {cur:g} vs "
                             f"healthy ref {ref:g} ({cur / ref:.2f}x)")
            else:
                sens_part = f"; {sens}-bound query"
        a_era = info.get("era") if info else None
        if not a_era:
            src = info.get("src", "?") if info else "no ANCHOR_ERAS entry"
            return (f"    anchor-era: unrecorded (anchor from {src} — no "
                    f"era vector survives for the run that set this "
                    f"minimum){sens_part}")
        parts = []
        for dim in sorted(a_era):
            ref, cur = a_era[dim], cur_era.get(dim)
            if isinstance(cur, (int, float)) and isinstance(
                    ref, (int, float)) and ref > 0:
                mark = " <<" if cur < ref / 2 else ""
                if dim == sens:
                    mark += " [sensitive]"
                parts.append(f"{dim} {cur:g} vs {ref:g} "
                             f"({cur / ref:.2f}x{mark})")
        if not parts:
            # stamped anchor but the CURRENT run carries no comparable
            # probe (pre-era-format record): still print the stamp and
            # the mechanism — the better-provenanced case must never
            # produce less output than an unstamped one (r13 self-review)
            stamp = "; ".join(f"{d} {a_era[d]:g}" for d in sorted(a_era)
                              if isinstance(a_era[d], (int, float)))
            return (f"    anchor-era [{info.get('src', '?')}]: {stamp} — "
                    f"current run has no era probe to compare{sens_part}")
        return (f"    anchor-era [{info.get('src', '?')}] {scope} vs "
                f"anchor-run: " + "; ".join(parts))
    if degraded:
        print(f"ERA-DEGRADED run on {degraded}: probe {probe} vs "
              f"anchors' era {ERA_REF} — uniform 1.2-3x drift on "
              f"affected queries is the documented VM mechanism "
              f"(BASELINE.md rounds 11-12); weigh any VIOLATION/WARNING "
              f"lines accordingly")
    elif probe:
        print(f"era: probe {probe} (anchors' era {ERA_REF})")
    # one label per probe point: which dims (if any) sat below half
    # their healthy reference AT THAT POINT — the run self-reports its
    # degraded windows instead of a single whole-run verdict
    from bench_anchors import era_seg_summary

    if segs := era_seg_summary(timeline):
        print("era-timeline: "
              + " | ".join(f"n={n} {label}" for n, label in segs))

    for name, sec in fresh:
        print(f"NO-ANCHOR {name}: {sec:.2f}s (informational; "
              "bench_anchors.py --merge to adopt)")
    for name, sec, raw, ratio in sorted(drift, key=lambda v: -v[3]):
        print(f"DRIFT {name}: {sec:.2f}s vs raw anchor {raw:.2f}s "
              f"({ratio:.2f}x; sub-floor, informational only)")
    for name, sec, anchor, ratio in sorted(warnings_, key=lambda v: -v[3]):
        print(f"WARNING {name}: {sec:.2f}s vs anchor {anchor:.2f}s "
              f"({ratio:.2f}x > {ns.warn_factor:.1f}x; gate passes, watch)")
        note = era_note(name)
        if note:
            print(note)
    for name, sec, anchor, ratio in sorted(violations, key=lambda v: -v[3]):
        print(f"VIOLATION {name}: {sec:.2f}s vs anchor {anchor:.2f}s "
              f"({ratio:.2f}x > {factor:.1f}x)")
        note = era_note(name)
        if note:
            print(note)
    # Override-expiry audit (round-10 judge item 4): warn — never fail —
    # when this run meets an OVERRIDES entry's removal condition, so an
    # override cannot outlive its justification unnoticed.
    from bench_anchors import expired_overrides

    expired = expired_overrides(bench)
    for name, cur, thr in expired:
        print(f"OVERRIDE-EXPIRED {name}: {cur:.2f}s <= documented "
              f"threshold {thr:.2f}s — removal condition met; delete "
              "its OVERRIDES entry in tools/bench_anchors.py this round")
    n_ok = len(timings) - len(violations) - len(fresh)
    print(f"bench_compare: {n_ok} within {factor:.1f}x anchor "
          f"({len(warnings_)} warned > {ns.warn_factor:.1f}x, "
          f"{len(drift)} sub-floor drift), "
          f"{len(violations)} violations, {len(fresh)} unanchored, "
          f"{len(expired)} expired overrides, "
          f"errors in run: {len(bench.get('errors') or {})}")
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
