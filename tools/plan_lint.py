#!/usr/bin/env python
"""Registry-wide physical-plan lint (VERDICT r10 #2 / r11 #3).

Walks every registered query's formatted plan and flags the three
shapes that are correct-at-small-SF but melt at 100 TB:

- **partition-less Window** — a global ``Window.orderBy(...)`` funnels
  the whole input through ONE task's sort. Allowed only for the
  documented constant-bounded pools (see ``ALLOWED_PARTITIONLESS``).
- **BroadcastNestedLoopJoin / CartesianProduct** — allowed only for
  the documented 1-row / bounded-frame broadcasts (PLANS.md "NLJ
  audit" list, mirrored in ``ALLOWED_NLJ``).

Detection parses ``explain("formatted")`` node details: a ``Window``
node's ``Arguments`` line carries ``[exprs], [partSpec], [orderSpec]``
— the partition-less form drops the middle group, leaving exactly two
groups where the second is an order spec (contains ASC/DESC sort
directions; a ``partitionBy`` with no ``orderBy`` also prints two
groups but its second group has no direction markers).
``WindowGroupLimit`` prints ``[partSpec], [orderSpec], fn, k, mode`` —
partition-less iff the first group is empty.

Run standalone: ``python tools/plan_lint.py [sf_dir]``; the pytest
wrapper is ``tests/test_plan_lint.py`` (fails on any unallowlisted
occurrence, and self-tests the detector on a planted global window).
"""

from __future__ import annotations

import contextlib
import io
import re

# Queries whose partition-less Window runs over a CONSTANT-BOUNDED
# pool, never the corpus — each entry names the bound:
ALLOWED_PARTITIONLESS = {
    # two 50-row retrieval pools ranked after orderBy().limit(RRF_POOL)
    "doc_hybrid_rrf_topk",
    # the nbuckets-row (default 32) bucket-offset frame of the
    # two-phase prefix sum (plans/textops.py:pack_sequences)
    "doc_pack_sequences",
    # KM_K seed rows numbered once at init (plans/kmeans.py:131)
    "emb_kmeans_assign",
    "emb_kmeans_centroids",
    "emb_ann_kmeans_topk",
    # |nations| = 25 post-aggregation rows (plans/windows.py:142)
    "nation_revenue_ranks",
    # guarded fallback only: plans/dsir.py:_dsir_top_k ranks globally
    # ONLY when the quantile-bracket guard fails (degenerate mass-tie
    # distribution); the production path is bracket-and-rank. The
    # fallback branch never appears in the default plan, so these
    # entries stay out of this list on purpose.
}

# Queries whose BroadcastNestedLoopJoin/CartesianProduct occurrences
# are deliberate broadcasts of 1-row or constant-bounded frames
# (PLANS.md "NLJ audit" has the per-query justification):
ALLOWED_NLJ = {
    "build_quality_model",
    "corpus_quality_filter",
    "curated_training_corpus",
    "doc_bm25_topk",
    "doc_dsir_importance",
    "doc_dsir_sample",
    "doc_hybrid_rrf_topk",
    "doc_quality_classifier",
    "doc_quality_classifier_model",
    "doc_temperature_sample",
    "emb_ann_ivf_topk",
    "emb_ann_ivf_trained_topk",
    "emb_ann_kmeans_topk",
    "emb_ann_lsh_topk",
    "emb_ann_lsh_topk_batch",
    "emb_ivfpq_topk",
    # r17: the Lloyd trainer broadcasts its <=k centroid ARRAYS as ONE
    # collected row per iteration (global aggregate — structurally
    # bounded below); the two training-output rows inherit that shape.
    "emb_kmeans_assign",
    "emb_kmeans_centroids",
    "emb_knn_cosine",
    "emb_pq_adc_topk",
    "emb_pq_codes",
    "events_daily_with_fill",
    "q11_major_revenue_parts",
    "q22_idle_rich_customers",
    "signup_purchase_funnel",
}

_DIRECTION = re.compile(r"\b(ASC|DESC)\b")


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _toplevel_groups(s: str) -> list[str]:
    """Split an Arguments line into its top-level ``[...]`` groups
    (depth-aware: windowspecdefinition parens and nested brackets stay
    inside their group)."""
    groups: list[str] = []
    depth = 0
    cur = ""
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = ""
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(cur)
                continue
        if depth >= 1:
            cur += ch
    return groups


def count_partitionless_windows(plan: str) -> int:
    n = 0
    for body in re.split(r"\n\(\d+\) ", plan)[1:]:
        head = body.split("\n", 1)[0].strip()
        m = re.search(r"Arguments: (.*)", body)
        if not m:
            continue
        g = _toplevel_groups(m.group(1))
        if head == "Window":
            if len(g) == 1 or (len(g) == 2 and _DIRECTION.search(g[1])):
                n += 1
        elif head == "WindowGroupLimit" and g and g[0].strip() == "":
            n += 1
    return n


def count_nlj(plan: str) -> int:
    return len(
        re.findall(r"\(\d+\) (?:BroadcastNestedLoopJoin|CartesianProduct)", plan)
    )


# ------------------------- structural NLJ bound check (VERDICT r12 #8)
# The ALLOWED_NLJ allowlist used to be justified only in PLANS.md
# prose, so a plan edit could silently grow an allowlisted query's
# broadcast side unbounded. The lint now parses the plan TREE and
# requires every NLJ's build side (the BroadcastExchange subtree; for
# CartesianProduct, either child) to contain a node that bounds its
# row count by construction:
#   - a global aggregate (HashAggregate/SortAggregate with `Keys: []`
#     — at most one row per upstream partition, collapsed by the final
#     aggregate),
#   - a constant limit (GlobalLimit/LocalLimit/CollectLimit/
#     TakeOrderedAndProject),
#   - a LocalTableScan (a literal driver-side frame, bounded by
#     construction — codebooks, centroid lists, probe batches).
# A ReusedExchange build side is bounded iff the exchange it reuses is.

_TREE_NODE = re.compile(r"^[\s:+|-]*([A-Za-z][\w]*(?:[ ]\w[\w=]*)*)\s.*?\((\d+)\)")
_BOUNDING_LEAVES = {
    "LocalTableScan",
    "TakeOrderedAndProject",
    "GlobalLimit",
    "LocalLimit",
    "CollectLimit",
}
_AGG_NODES = {"HashAggregate", "SortAggregate", "ObjectHashAggregate"}


def _parse_tree(plan: str) -> list[dict]:
    """The formatted plan's tree section as nodes with (name, id,
    depth, children) — indentation-driven, duplicate-id detail safe."""
    lines = plan.splitlines()
    nodes: list[dict] = []
    stack: list[dict] = []
    for ln in lines:
        if ln.startswith("("):  # details section begins
            break
        m = re.search(r"([A-Za-z][\w .]*?)\s*\((\d+)\)", ln)
        if not m:
            continue
        depth = m.start(1)
        node = {
            "name": m.group(1).strip(),
            "id": int(m.group(2)),
            "depth": depth,
            "children": [],
        }
        while stack and stack[-1]["depth"] >= depth:
            stack.pop()
        if stack:
            stack[-1]["children"].append(node)
        nodes.append(node)
        stack.append(node)
    return nodes


def _details(plan: str) -> dict[int, str]:
    out: dict[int, str] = {}
    for m in re.finditer(r"(?ms)^\((\d+)\) (.*?)(?=^\(\d+\) |\Z)", plan):
        out.setdefault(int(m.group(1)), m.group(2))
    return out


# Largest row count a pushed key-range probe may claim as "bounded" —
# generous for query vectors / training prefixes / probe batches, far
# below anything that could melt a broadcast at 100 TB.
_PROBE_ROW_CAP = 100_000


def _scan_is_key_probe(detail: str) -> bool:
    """A parquet scan bounded by a PUSHED filter on the
    catalog-declared primary key of its table: ``EqualTo(pk, v)`` (the
    query-vector probe, ≤1 row), ``In(pk, [...])`` (probe batch,
    ≤|list|), or ``LessThan(pk, N)`` with N ≤ _PROBE_ROW_CAP (the
    dense-key training prefix — vec_id < 6400). Uniqueness/density
    come from the catalog declaration (chsql.SAMPLE_KEYS), not prose —
    a non-key equality (``status='F'``) does NOT bound and stays a
    violation."""
    from clickhouse_build_spark.functions.chsql import SAMPLE_KEYS

    loc = re.search(r"Location: \w+ \[[^\]]*/(\w+)\.parquet\]", detail)
    if not loc:
        return False
    pk = SAMPLE_KEYS.get(loc.group(1))
    if not pk:
        return False
    pushed = re.search(r"PushedFilters: \[([^\]]*(?:\[[^\]]*\][^\]]*)*)\]", detail)
    if not pushed:
        return False
    filters = pushed.group(1)
    if re.search(rf"(?<!Not\()(?:EqualTo|In)\({pk},", filters):
        return True
    lt = re.search(rf"(?:LessThan|LessThanOrEqual)\({pk},(\d+)\)", filters)
    return bool(lt and int(lt.group(1)) <= _PROBE_ROW_CAP)


def _subtree_bounded(node: dict, details: dict[int, str], plan: str) -> bool:
    name = node["name"].split()[0]
    if name in _BOUNDING_LEAVES:
        return True
    if name == "Scan":
        rest = node["name"]
        if "ExistingRDD" in rest:
            return True  # driver-created frame, bounded by construction
        if "parquet" in rest and _scan_is_key_probe(
            details.get(node["id"], "")
        ):
            return True
    if name in _AGG_NODES:
        if "Keys: []" in details.get(node["id"], ""):
            return True
    if name == "ReusedExchange":
        # bounded iff the SPECIFIC exchange this node reuses is bounded
        # — the detail carries "Reuses operator id: N" (ADVICE r13: the
        # old any-bounded-broadcast check was a false negative when an
        # unrelated bounded broadcast coexisted with an unbounded reuse)
        det = details.get(node["id"], "")
        m = re.search(r"Reuses operator id:\s*(\d+)", det) or re.search(
            r"Reuses operator id:\s*(\d+)", node["name"]
        )
        if not m:
            return False  # unresolvable reuse: stay loud
        target_id = int(m.group(1))
        tree = _parse_tree(plan)
        for n in tree:
            if n["id"] == target_id and not n["name"].startswith(
                "ReusedExchange"
            ):
                return any(
                    _subtree_bounded(c, details, plan)
                    for c in n["children"]
                )
        return False
    return any(_subtree_bounded(c, details, plan) for c in node["children"])


def count_unbounded_nlj(plan: str) -> int:
    """NLJ/cartesian nodes whose build side has NO structural row
    bound. 0 for a clean plan; every allowlisted NLJ must also be 0."""
    nodes = _parse_tree(plan)
    details = _details(plan)
    bad = 0
    for n in nodes:
        head = n["name"].split()[0]
        if head not in ("BroadcastNestedLoopJoin", "CartesianProduct"):
            continue
        sides = n["children"]
        build = [
            c
            for c in sides
            if c["name"].split()[0]
            in ("BroadcastExchange", "ReusedExchange")
        ]
        check = build or sides  # cartesian: either child may bound it
        if not any(_subtree_bounded(c, details, plan) for c in check):
            bad += 1
    return bad


def lint_registry(spark, sf_dir: str) -> list[str]:
    """Return human-readable violation strings (empty = clean)."""
    from clickhouse_build_spark.plans import REGISTRY

    violations: list[str] = []
    for name in sorted(REGISTRY):
        plan = formatted_plan(REGISTRY[name].builder(spark, sf_dir))
        pw = count_partitionless_windows(plan)
        if pw and name not in ALLOWED_PARTITIONLESS:
            violations.append(
                f"{name}: {pw} partition-less Window node(s) — a global"
                " sort funnel; partition it or add a documented bound"
            )
        nlj = count_nlj(plan)
        if nlj and name not in ALLOWED_NLJ:
            violations.append(
                f"{name}: {nlj} nested-loop/cartesian join(s) — only"
                " documented 1-row broadcasts are allowed"
            )
        elif nlj:
            bad = count_unbounded_nlj(plan)
            if bad:
                violations.append(
                    f"{name}: {bad} allowlisted NLJ(s) whose build side"
                    " has NO structural row bound (global aggregate /"
                    " constant limit / literal frame) — the allowlist"
                    " only covers bounded broadcasts"
                )
    return violations


def main() -> None:
    import sys

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from clickhouse_build_spark.session import get_spark

    spark = get_spark(app_name="plan_lint")
    spark.sparkContext.setLogLevel("ERROR")
    violations = lint_registry(spark, sf_dir)
    for v in violations:
        print("VIOLATION:", v)
    print(f"plan lint: {len(violations)} violation(s)")
    sys.exit(1 if violations else 0)


if __name__ == "__main__":
    main()
