"""Scale-ladder rung inside the gate (r14, VERDICT r13 #7).

The r13 judge-round ladder caught a real quadratic (the frozen nlist
clamp reverting SemDeDup candidate mass to n²/nlist) that no gate test
guarded. This smoke builds a 1× and a 10× content-salted rung (the
ladder's recipe: per-copy sign-flips on embeddings, per-copy token
suffixes on documents — copies are NOT near-dups of each other, so the
corpus's dup structure replicates linearly and the probe measures the
ENGINE, not the corpus) and asserts the scaling law on DETERMINISTIC
quantities:

- semdedup candidate mass Σ|fine cell|² grows ≤ ~linear ×
  generous margin (wall-clock would flake under full-suite load; mass
  is the exact quantity the r13 ladder measured at 99.5×);
- the level-2 split is ACTIVE at the 10× rung (a future clamp that
  re-freezes cell growth fails here first);
- the control family (MinHash+LSH dup pairs on salted docs) scales
  linearly in OUTPUT, pinning the salted-vs-clone distinction the sf1
  adjudications lean on. (SimHash pairs are NOT the control: the r14
  smoke measured them 75.7× at 10× salted docs — short-doc tie-biased
  signatures cluster, so 32-bit hamming collisions grow ~n²; that
  measurement is recorded on the row's quadratic-output adjudication
  and the ladder's simhash family, not asserted away here.)
"""

from __future__ import annotations

import glob
import hashlib
import shutil

import pytest
from pyspark.sql import functions as F

from tools.scale_ladder import _salt_documents, _salt_embeddings, OFFS

SRC = "/root/testdata/sf0.1"
# old √n law at these rungs: mass ratio ≈ 31×; healthy constant-
# occupancy law ≈ 10-16× (linear × k-means imbalance). The bound sits
# between with daylight on both sides.
MASS_RATIO_BOUND = 24.0


def _build_rung(spark, out: str, copies: int, tables=("embeddings", "documents")):
    for table in tables:
        src = spark.read.parquet(f"{SRC}/{table}.parquet")
        key = {"embeddings": "vec_id", "documents": "doc_id"}[table]
        parts = []
        for i in range(copies):
            df = src.withColumn(key, F.col(key) + F.lit(i * OFFS))
            df = (
                _salt_embeddings(df, i)
                if table == "embeddings"
                else _salt_documents(df, i)
            )
            parts.append(df)
        outdf = parts[0]
        for p in parts[1:]:
            outdf = outdf.unionByName(p)
        outdf.write.mode("overwrite").parquet(f"{out}/{table}.parquet")


def _drop_exports(rung_dir: str) -> None:
    """Mirror the ladder's post-probe cleanup: a big rung's at-rest
    export would otherwise stay inside the semdedup oracle's
    cross-export glob for the rest of the suite."""
    from clickhouse_build_spark.plans.similarity import _AT_REST_BASE

    h = hashlib.md5(rung_dir.encode()).hexdigest()[:12]
    for d in glob.glob(f"{_AT_REST_BASE}/*/ivfpq/{h}") + glob.glob(
        f"{_AT_REST_BASE}/*/ivfpq_probes/*/{h}"
    ):
        shutil.rmtree(d, ignore_errors=True)


def _semdedup_mass(spark, sf_dir: str) -> tuple[int, bool]:
    """Σ|fine cell|² of the two-level assignment (the SemDeDup
    candidate-join row count before the vec_a < vec_b filter), plus
    whether any cell actually split. Uses the assignment chain without
    the PQ encode — the quantity under guard is cell growth."""
    import clickhouse_build_spark.plans.similarity as sim
    from clickhouse_build_spark.operators.similarity import ivf_assign

    cent = sim.shared_ivf_centroids(
        spark, sf_dir, k=sim.ivfpq_cells(spark, sf_dir), iters=5
    )
    assigned = ivf_assign(sim._unit_vectors(spark, sf_dir), cent).select(
        "vec_id", "cell"
    )
    fine = sim._with_subcell(spark, sf_dir, assigned)
    rows = fine.groupBy("cell", "subcell").count().collect()
    mass = sum(r["count"] ** 2 for r in rows)
    split = any(r["subcell"] > 0 for r in rows)
    return mass, split


@pytest.mark.slow
def test_scale_smoke_semdedup_mass_and_simhash_output(spark, tmp_path):
    from clickhouse_build_spark.plans import REGISTRY

    r1 = str(tmp_path / "rung1")
    r10 = str(tmp_path / "rung10")
    _build_rung(spark, r1, 1)
    _build_rung(spark, r10, 10)
    try:
        m1, split1 = _semdedup_mass(spark, r1)
        m10, split10 = _semdedup_mass(spark, r10)
        # the 10× rung MUST split (2000→20000 vectors crosses the
        # target occupancy); the 1× rung must not (pre-r14 layout)
        assert not split1
        assert split10, "level-2 split did not activate at 10× rows"
        ratio = m10 / m1
        assert ratio <= MASS_RATIO_BOUND, (
            f"semdedup candidate mass grew {ratio:.1f}× at 10× rows "
            f"(bound {MASS_RATIO_BOUND}) — cell growth has re-frozen"
        )

        # control: salted-corpus MinHash+LSH dup-pair OUTPUT is ~linear
        # (cross-copy shingles never share min-hashes; each copy only
        # replicates the corpus's own dup structure)
        p1 = REGISTRY["doc_minhash_lsh_dedup"].builder(spark, r1).count()
        p10 = REGISTRY["doc_minhash_lsh_dedup"].builder(spark, r10).count()
        assert p1 > 0
        assert p10 <= 12 * p1, (
            f"salted minhash pairs grew {p10 / p1:.1f}× at 10× docs — "
            "the salted recipe no longer isolates output mass"
        )
    finally:
        _drop_exports(r1)
        _drop_exports(r10)
