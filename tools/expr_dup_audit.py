"""Per-row expression-duplication audit over the query corpus.

Catalyst's subexpression elimination does NOT reach inside lambda
functions (higher-order ``aggregate``/``transform``/``filter`` bodies),
and both projection collapse and filter pushdown substitute aliases by
wholesale expression copy — so an expensive per-row expression written
once in the DataFrame API can appear N times in the EXECUTED plan and
run N times per row. Round 10 found three such spots by hand (lang_id
ran the tokenization ~10x per row; see BASELINE.md "expression-
duplication hunt"); this tool makes the hunt repeatable.

Method: for every registered query, render the executed plan at a tiny
SF and count occurrences of each expensive-expression MARKER *within a
single plan line* (one line = one operator node). Repeats within a node
are per-row duplication by construction. Counts across different nodes
are usually legitimate (separate branches, or the lineage text of a
cached frame — InMemoryTableScan repeats the child plan string), so the
node-local count is the honest signal; the plan-wide count is reported
for context only.

    python tools/expr_dup_audit.py                 # whole corpus, default markers
    python tools/expr_dup_audit.py --threshold 3   # only node-local count >= 3
    python tools/expr_dup_audit.py q1 q2 ...       # explicit query names

Exit code 0 always — this is a hunting aid, not a gate: a flagged node
can be an accepted trade (e.g. filter pushdown that prunes rows before
a shuffle, where the conjuncts short-circuit per row). Verdicts belong
in BASELINE.md next to a measurement.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Markers for per-row work that is expensive enough that a duplicate
# evaluation is worth a look. Each is a plan-string fragment.
MARKERS = {
    "tokenize": "split(trim",          # tokens(): split+trim+filter chain
    "fold": "aggregate(",              # higher-order fold (O(array) per eval)
    "intersect": "array_intersect(",   # O(n*m) per eval
    "arr_sort": "array_sort(",         # O(n log n) per eval
    "re_replace": "regexp_replace(",   # regex scan of the full string
    "levenshtein": "levenshtein(",     # O(len^2) (or banded) DP per eval
}


def _array_cast_in_lambda(line: str) -> int:
    """Count ARRAY casts nested inside higher-order-function bodies on
    one plan line. Round 11: ``norm(col.cast("array<double>"), dim)``
    put the array cast INSIDE the fold — interpreted ArrayAggregate
    re-evaluates every non-lambda subexpression on each element access,
    so the whole-array cast (an O(dim) loop plus an allocation) ran
    once per fold STEP: O(dim²) per row, a 428 s single task at the
    sf10fresh control. The duplicate-marker scan above cannot see it
    (one textual occurrence), so it gets its own structural check:
    a ``cast( ... as array<`` whose span lies inside the balanced-paren
    extent of an ``aggregate(``/``transform(`` call."""
    n = 0
    for hof in ("aggregate(", "transform("):
        start = 0
        while True:
            i = line.find(hof, start)
            if i < 0:
                break
            depth, j = 0, i + len(hof) - 1
            while j < len(line):
                if line[j] == "(":
                    depth += 1
                elif line[j] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            n += line.count(" as array<", i, j)
            start = i + 1
    return n


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    threshold = 2
    if "--threshold" in sys.argv:
        threshold = int(sys.argv[sys.argv.index("--threshold") + 1])
        args = [a for a in args if a != str(threshold)]

    from quantum_rag_data_pipeline_spark.queries import QUERIES
    from quantum_rag_data_pipeline_spark.session import get_spark

    names = args or list(QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_AUDIT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark(app_name="expr_dup_audit")
    spark.sparkContext.setLogLevel("ERROR")

    flagged = 0
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"SKIP  {name}: not registered")
            continue
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # plan-build failures are their own signal
            print(f"ERROR {name}: {type(exc).__name__}: {exc}")
            continue
        # strip expression ids (#123) and lambda variable ids before
        # fingerprinting: catalyst assigns fresh ids to each COPY of a
        # duplicated expression, so raw text would make true duplicates
        # look distinct.
        import re
        plan_n = re.sub(r"#\d+", "#", plan)
        lines = plan_n.split("\n")
        # Count IDENTICAL duplicated expressions: two *different* folds in
        # one projection are each single-evaluation (fine); the same
        # marker+prefix twice in one node is the real per-row duplicate.
        # The 60-char fingerprint disambiguates nested higher-order
        # functions and distinct literal lists without full expression
        # parsing. Cached-lineage text (InMemoryTableScan child plans)
        # repeats across lines, not within a node, so node-local counting
        # already ignores it.
        hits = []
        for marker_name, marker in MARKERS.items():
            node_max = 0
            for ln in lines:
                sigs: dict[str, int] = {}
                start = 0
                while True:
                    i = ln.find(marker, start)
                    if i < 0:
                        break
                    sig = ln[i:i + len(marker) + 60]
                    sigs[sig] = sigs.get(sig, 0) + 1
                    start = i + 1
                if sigs:
                    node_max = max(node_max, max(sigs.values()))
            if node_max >= threshold:
                total = plan.count(marker)
                hits.append(f"{marker_name} x{node_max}/node (x{total} plan-wide)")
        # structural check, threshold-independent: ONE occurrence is
        # already an O(dim²)-per-row bug (see _array_cast_in_lambda)
        cast_max = max((_array_cast_in_lambda(ln) for ln in lines), default=0)
        if cast_max >= 1:
            hits.append(f"array_cast_in_lambda x{cast_max}/node")
        if hits:
            flagged += 1
            print(f"DUP   {name}: " + "; ".join(hits))
    print(f"expr_dup_audit: {flagged} of {len(names)} queries with a node-local "
          f"duplicate >= {threshold} (hunting aid, not a gate)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
