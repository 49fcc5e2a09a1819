"""One-shot refactoring script: split the 23k-line queries.py monolith
into the quantum_rag_data_pipeline_spark/queries/ package (round-4 judge
item 3). Contiguous registration-order segments — NOT a semantic
re-shuffle — so the audited registration order (tools/verify_ledger.py)
is preserved byte-for-byte. Free-variable analysis via symtable decides
each module's imports exactly. Kept in tools/ for provenance; only
meaningful against the original monolith.
"""

from __future__ import annotations

import ast
import builtins
import os
import symtable

PKG = "quantum_rag_data_pipeline_spark"
SRC = os.path.join(PKG, "queries.py")
OUT = os.path.join(PKG, "queries")

GROUPS = [
    ("core_relational", 1, 50,
     "reference surface — aggregates, projections, joins, windows, text, "
     "dedup + ANN baselines, SQL constructs"),
    ("curation_clustering", 51, 99,
     "connected components, data curation, k-means/IVF, dedup pipeline, "
     "sketches, retrieval eval"),
    ("layout_formats", 100, 149,
     "storage layout (z-order, zone maps, bloom, merkle), format ingest, "
     "streaming state, robust stats"),
    ("analytics_ml", 150, 183,
     "SQL surface audits, governance, regression/PCA/CV, A/B tests, "
     "streaming join semantics"),
    ("retrieval_tpch", 184, 217,
     "rollups, TPC-H Q3/Q5/Q10, association rules, vector retrieval, "
     "personalized pagerank"),
    ("graph_text_streams", 218, 249,
     "phash near-dup, label propagation, WL, Bellman-Ford, funnels, "
     "TPC-H Q1/Q18, calibration"),
    ("product_analytics", 250, 270,
     "engagement/SLO/inventory analytics, record linkage, information "
     "theory, decision stumps"),
    ("ir_timeseries", 271, 288,
     "Holt smoothing, MMR, naive Bayes, HITS, query likelihood, trend "
     "tests, graph mixing, moments"),
    ("tpch_econometrics", 289, 310,
     "TPC-H Q6-Q14, DP histogram, nonparametric tests, causal designs, "
     "stylometry"),
    ("decision_science", 311, 327,
     "newsvendor/safety stock, Hurst, Shapley, extreme values, "
     "changepoints, scoring rules, DBSCAN"),
]

ALIAS_IMPORTS = {
    "pd": "import pandas as pd  # noqa: F401 — pandas_udf resolves string annotations in module globals",
    "F": "from pyspark.sql import functions as F",
    "agg_ops": f"from {PKG}.operators import aggregates as agg_ops",
    "cur_ops": f"from {PKG}.operators import curation as cur_ops",
    "dedup_ops": f"from {PKG}.operators import dedup as dedup_ops",
    "graph_ops": f"from {PKG}.operators import graph as graph_ops",
    "join_ops": f"from {PKG}.operators import joins as join_ops",
    "proj_ops": f"from {PKG}.operators import projection as proj_ops",
    "sim_ops": f"from {PKG}.operators import similarity as sim_ops",
    "skew_ops": f"from {PKG}.operators import skew as skew_ops",
    "text_ops": f"from {PKG}.operators import text as text_ops",
    "win_ops": f"from {PKG}.operators import windows as win_ops",
    "load_table": f"from {PKG}.sources.registry import load_table",
}
REGISTRY_NAMES = {"query", "_t", "QUERIES", "ORACLE"}
BUILTINS = set(dir(builtins))


def free_names(snippet: str) -> set[str]:
    st = symtable.symtable(snippet, "<chunk>", "exec")
    free: set[str] = set()

    def walk(t, depth):
        children = {c.get_name() for c in t.get_children()}
        for sym in t.get_symbols():
            name = sym.get_name()
            if depth == 0:
                if (sym.is_referenced() and not sym.is_assigned()
                        and not sym.is_imported() and name not in children):
                    free.add(name)
            elif sym.is_global():
                free.add(name)
        for c in t.get_children():
            walk(c, depth + 1)

    walk(st, 0)
    return free - BUILTINS


def target_names(node):
    if isinstance(node, ast.FunctionDef):
        return [node.name]
    out = []
    if isinstance(node, ast.Assign):
        for t in node.targets:
            if isinstance(t, ast.Name):
                out.append(t.id)
            elif isinstance(t, ast.Tuple):
                out.extend(e.id for e in t.elts if isinstance(e, ast.Name))
    elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
        out.append(node.target.id)
    return out


def main():
    src = open(SRC).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)

    items = []
    prev_end = 0
    qidx = 0
    rotation_text = None
    seen_any = False
    for node in tree.body:
        seg = "".join(lines[prev_end:node.end_lineno])
        prev_end = node.end_lineno
        if (isinstance(node, ast.Expr) and isinstance(node.value, ast.Constant)
                and isinstance(node.value.value, str) and not seen_any):
            continue
        seen_any = True
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            continue
        names = target_names(node)
        if any(n.startswith("_VERIFY_ROTATION_R") for n in names):
            rotation_text = seg
            continue
        if any(n in ("QUERIES", "ORACLE") for n in names):
            continue
        if isinstance(node, ast.FunctionDef) and node.name in (
                "query", "_t", "_reorder_exports"):
            continue
        if (isinstance(node, ast.Expr) and isinstance(node.value, ast.Call)
                and getattr(node.value.func, "id", "") == "_reorder_exports"):
            continue
        is_query = isinstance(node, ast.FunctionDef) and any(
            isinstance(d, ast.Call) and getattr(d.func, "id", "") == "query"
            for d in node.decorator_list)
        if is_query:
            qidx += 1
        items.append((is_query, seg, names, qidx))
    assert qidx == 327, qidx
    assert rotation_text

    def group_of(qi):
        for g, lo, hi, _ in GROUPS:
            if lo <= qi <= hi:
                return g
        raise AssertionError(qi)

    module_items: dict[str, list] = {g: [] for g, *_ in GROUPS}
    pending = []
    for is_query, seg, names, qi in items:
        if not is_query:
            pending.append((seg, names))
            continue
        g = group_of(qi)
        module_items[g].extend(pending)
        pending = []
        module_items[g].append((seg, names))
    assert not pending

    os.makedirs(OUT, exist_ok=True)
    defined_by_module: dict[str, str] = {}
    module_order = [g for g, *_ in GROUPS]
    problems = []

    for g, lo, hi, desc in GROUPS:
        body = "".join(seg for seg, _ in module_items[g])
        defined = {n for _, names in module_items[g] for n in names}
        free = free_names(body) - defined
        hdr = ['"""Corpus segment: %s.\n\nQueries %d-%d of the registration order. The monolithic queries.py\nwas split in round 5 into contiguous registration-order slices; this\nfile\'s internal order plus the package __init__\'s import sequence\npreserve the order that tools/verify_ledger.py audits.\n"""\n'
               % (desc, lo, hi),
               "\nfrom __future__ import annotations\n\n"]
        if "pd" in free:
            hdr.append(ALIAS_IMPORTS["pd"] + "\n\n")
            free.discard("pd")
        spark_bits = [n for n in ("Column", "DataFrame", "SparkSession") if n in free]
        if spark_bits:
            hdr.append("from pyspark.sql import " + ", ".join(spark_bits) + "\n")
            free -= set(spark_bits)
        if "F" in free:
            hdr.append(ALIAS_IMPORTS["F"] + "\n")
            free.discard("F")
        hdr.append("\n")
        for alias in sorted(a for a in ALIAS_IMPORTS
                            if a in free and a not in ("pd", "F")):
            hdr.append(ALIAS_IMPORTS[alias] + "\n")
            free.discard(alias)
        reg = sorted(REGISTRY_NAMES & (free | {"query"}))
        hdr.append(f"from {PKG}.queries._registry import " + ", ".join(reg) + "\n")
        free -= REGISTRY_NAMES
        cross: dict[str, list[str]] = {}
        for n in sorted(free):
            m = defined_by_module.get(n)
            if m:
                cross.setdefault(m, []).append(n)
        for m in module_order:
            if m in cross:
                hdr.append(f"from {PKG}.queries.{m} import "
                           + ", ".join(sorted(cross[m])) + "\n")
                free -= set(cross[m])
        if free:
            problems.append((g, sorted(free)))
        open(os.path.join(OUT, g + ".py"), "w").write("".join(hdr) + "\n" + body)
        for n in defined:
            defined_by_module[n] = g
        print(f"  {g}.py: {body.count(chr(10))} body lines, "
              f"{sum(1 for _, n in module_items[g])} nodes")

    for g, names in problems:
        print(f"  !! {g}: UNRESOLVED {names}")
    if not problems:
        print("  all names resolved")
    # stash rotation text for the __init__ author
    open(os.path.join(OUT, "_rotation.txt"), "w").write(rotation_text)


if __name__ == "__main__":
    main()
