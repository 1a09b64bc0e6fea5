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
