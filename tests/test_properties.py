"""Property-based tests (hypothesis) for the cross-engine foundations:
the portable hash family must agree between Spark and DuckDB on
arbitrary input — it is the load-bearing trick that lets the oracle
gate check probabilistic operators exactly — and the skew helpers must
be result-transparent."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from clickhouse_build_spark.operators.dedup import (
    minhash_component,
    minhash_component_sql,
    portable_hash,
    portable_hash_sql,
)
from clickhouse_build_spark.operators.skew import salted_group_count, salted_join

# Text without NULs (parquet/duckdb varchar cannot carry \x00) and
# without surrogates; single quotes excluded because the SQL twin
# inlines literals in these tests (the engine binds them as columns).
TEXT = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",), blacklist_characters="\x00'"
    ),
    min_size=0,
    max_size=80,
)


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(texts=st.lists(TEXT, min_size=1, max_size=24, unique=True))
def test_portable_hash_agrees_with_duckdb(spark, con, texts):
    df = spark.createDataFrame([(t,) for t in texts], ["s"])
    got = {
        r.s: (r.h, r.m0, r.m3)
        for r in df.select(
            "s",
            portable_hash(F.col("s"), 7).alias("h"),
            minhash_component(F.col("s"), 0).alias("m0"),
            minhash_component(F.col("s"), 3).alias("m3"),
        ).collect()
    }
    for t in texts:
        lit = "'" + t.replace("'", "''") + "'"
        sql = (
            f"SELECT {portable_hash_sql(lit, 7)}, "
            f"{minhash_component_sql(lit, 0)}, {minhash_component_sql(lit, 3)}"
        )
        assert got[t] == con.execute(sql).fetchone(), repr(t)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    hot_n=st.integers(min_value=50, max_value=300),
    n_keys=st.integers(min_value=2, max_value=10),
    n_salts=st.integers(min_value=2, max_value=8),
)
def test_salted_join_equals_plain_join(spark, hot_n, n_keys, n_salts):
    # key 0 is hot (hot_n rows), the rest have 3 rows each
    big_rows = [(0, i) for i in range(hot_n)] + [
        (k, i) for k in range(1, n_keys) for i in range(3)
    ]
    big = spark.createDataFrame(big_rows, ["k", "payload"])
    small = spark.createDataFrame([(k, f"dim{k}") for k in range(n_keys)], ["k", "name"])
    plain = sorted(
        (r.k, r.payload, r.name) for r in big.join(small, ["k"]).collect()
    )
    salted = sorted(
        (r.k, r.payload, r.name)
        for r in salted_join(big, small, ["k"], n_salts=n_salts).collect()
    )
    assert salted == plain


def test_salted_group_count_equals_plain(spark):
    rows = [(0,)] * 500 + [(k,) for k in range(1, 20) for _ in range(3)]
    df = spark.createDataFrame(rows, ["k"])
    plain = {r.k: r["count"] for r in df.groupBy("k").count().collect()}
    salted = {r.k: r["count"] for r in salted_group_count(df, "k").collect()}
    assert salted == plain


def test_salted_join_rejects_right_joins(spark):
    df = spark.createDataFrame([(1, 1)], ["k", "v"])
    with pytest.raises(ValueError):
        salted_join(df, df, ["k"], how="right")


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    ops=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=14),  # key
            st.sampled_from(["u", "d"]),  # upsert / delete
        ),
        min_size=1,
        max_size=30,
    ),
    n_batches=st.integers(min_value=1, max_value=3),
)
def test_cdc_merge_matches_dict_model(spark, tmp_path_factory, ops, n_batches):
    """Model-based CDC check: any sequence of upserts/deletes applied in
    version order must leave the replica equal to a plain dict replay.
    Catches merge bugs no fixed scenario covers (delete-then-reinsert,
    same-key repeats within a batch, empty buckets)."""
    from clickhouse_build_spark.sources.replication import Replicator, TableMapping

    root = tmp_path_factory.mktemp("cdc_model")
    rep = Replicator(
        spark=spark,
        target_root=str(root),
        key_cols=["k"],
        version_col="v",
        n_buckets=4,
    )
    mapping = TableMapping("public", "t", "t")

    # versioned op stream; split into batches applied in order
    versioned = [(k, op, i) for i, (k, op) in enumerate(ops)]
    model: dict[int, int] = {}
    for k, op, v in versioned:
        if op == "d":
            model.pop(k, None)
        else:
            model[k] = v

    size = -(-len(versioned) // n_batches)
    for b in range(n_batches):
        chunk = versioned[b * size : (b + 1) * size]
        if not chunk:
            continue
        batch = spark.createDataFrame(
            [(k, v, "d" if op == "d" else "u") for k, op, v in chunk],
            "k long, v long, _op string",
        ).coalesce(1)
        rep.apply_changes(batch, mapping)

    got = {r.k: r.v for r in rep.read(mapping).collect()}
    assert got == model


@given(ids=st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=16, unique=True))
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_media_digest_agrees_with_duckdb_md5(con, ids):
    """The multimodal oracle foundation: the digest the fake-codec
    kernels read back from payload bytes (`payload[:16].hex()`) must
    equal DuckDB's `md5('media:' || id)` for arbitrary ids — this is
    what lets the mapInPandas media pipeline be hash-verified in SQL.
    Pure-Python vs DuckDB (no Spark needed: the kernel calls the same
    hashlib path the executors run)."""
    from clickhouse_build_spark.operators.multimodal import (
        _det_bytes,
        _payload_digest,
    )

    for i in ids:
        for size in (64, 4096):
            py = _payload_digest(_det_bytes(f"media:{i}", size))
            db = con.execute(f"SELECT md5('media:' || CAST({i} AS VARCHAR))").fetchone()[0]
            assert py == db, i


# ------------------------- jsonb containment property (r13c)
# The @> expansion is translate-time code with per-type branches
# (strings by JSON text, numbers numerically, arrays by subset,
# nested objects recursively) — property-test it against a direct
# Python implementation of jsonb containment semantics.

_JKEY = st.text(alphabet="abkxy", min_size=1, max_size=3)
_JSCALAR = st.one_of(
    st.integers(min_value=-99, max_value=99),
    st.booleans(),
    st.none(),
    st.text(alphabet="mnpq", min_size=0, max_size=4),
)
_JDOC = st.dictionaries(
    _JKEY,
    st.one_of(
        _JSCALAR,
        st.lists(_JSCALAR, max_size=3),
        st.dictionaries(_JKEY, _JSCALAR, max_size=2),
    ),
    max_size=4,
)


def _py_jsonb_contains(doc, probe) -> bool:
    """Direct jsonb @> semantics for the supported shape."""
    if not isinstance(doc, dict) or not isinstance(probe, dict):
        return False
    for k, pv in probe.items():
        if k not in doc:
            return False
        dv = doc[k]
        if isinstance(pv, dict):
            if not _py_jsonb_contains(dv, pv):
                return False
        elif isinstance(pv, list):
            if not isinstance(dv, list):
                return False
            for e in pv:
                if isinstance(e, bool):
                    ok = any(x is True if e else x is False for x in dv)
                elif isinstance(e, (int, float)):
                    ok = any(
                        not isinstance(x, bool)
                        and isinstance(x, (int, float))
                        and float(x) == float(e)
                        for x in dv
                    )
                elif e is None:
                    ok = any(x is None for x in dv)
                else:
                    ok = any(isinstance(x, str) and x == e for x in dv)
                if not ok:
                    return False
        elif isinstance(pv, bool):
            if dv is not pv:
                return False
        elif pv is None:
            if dv is not None:
                return False
        elif isinstance(pv, str):
            if not (isinstance(dv, str) and dv == pv):
                return False
        else:  # number — numeric equality, never bool
            if isinstance(dv, bool) or not isinstance(dv, (int, float)):
                return False
            if float(dv) != float(pv):
                return False
    return True


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    docs=st.lists(_JDOC, min_size=1, max_size=8),
    probe=_JDOC.filter(lambda d: d),
)
def test_jsonb_containment_matches_python_reference(spark, docs, probe):
    import json as _json

    from clickhouse_build_spark.functions.chsql import run_pg_sql

    probe_lit = _json.dumps(probe).replace("'", "''")
    rows = run_pg_sql(
        spark,
        "SELECT i, (j @> '" + probe_lit + "') AS c FROM VALUES "
        + ", ".join(
            f"({i}, '{_json.dumps(d).replace(chr(39), chr(39) * 2)}')"
            for i, d in enumerate(docs)
        )
        + " AS t(i, j) ORDER BY i",
    ).collect()
    got = [bool(r["c"]) for r in rows]
    want = [_py_jsonb_contains(d, probe) for d in docs]
    assert got == want, (docs, probe, got, want)


# ------------------------- jsonb mutation property (r15)
# The jsonb_set / jsonb_insert / minus-delete / #- compilers are
# translate-time VARIANT→rebuild codegen with per-shape branches —
# property-test them against a direct Python implementation of the
# DOCUMENTED subset semantics (PG behavior on the supported shapes;
# lax pass-through where PG raises — the contract the docstrings pin).

_MKEY = st.text(alphabet="abk", min_size=1, max_size=2)
_MVAL = st.one_of(
    st.integers(min_value=-9, max_value=9),
    st.booleans(),
    st.none(),
    st.text(alphabet="mq", min_size=0, max_size=3),
)
_MDOC = st.one_of(
    st.dictionaries(
        _MKEY,
        st.one_of(
            _MVAL,
            st.lists(_MVAL, max_size=3),
            st.dictionaries(_MKEY, _MVAL, max_size=2),
        ),
        max_size=3,
    ),
    st.lists(_MVAL, max_size=4),
    _MVAL,
)
_MPATH = st.one_of(
    st.tuples(_MKEY),
    st.tuples(st.integers(min_value=0, max_value=4)),
    st.tuples(_MKEY, _MKEY),
    st.tuples(_MKEY, st.integers(min_value=0, max_value=4)),
)


def _py_jsonb_set(doc, path, val, create=True):
    import copy

    doc = copy.deepcopy(doc)
    if len(path) == 1:
        (k,) = path
        # PG rule: a digit segment is an object KEY when the target
        # is an object, an array index when it is an array
        if isinstance(k, int) and isinstance(doc, dict):
            k = str(k)
        if isinstance(k, int):
            if not isinstance(doc, list) or isinstance(doc, bool):
                return doc
            if k >= len(doc):
                return doc + [val] if create else doc
            doc[k] = val
            return doc
        if not isinstance(doc, dict):
            return doc
        if not create and k not in doc:
            return doc
        doc[k] = val
        return doc
    a, b = path
    if not isinstance(doc, dict):
        return doc
    inner = doc.get(a)
    if isinstance(b, int) and isinstance(inner, dict):
        b = str(b)
    if isinstance(b, int):
        if not isinstance(inner, list):
            return doc
        if b >= len(inner):
            if create:
                doc[a] = inner + [val]
            return doc
        inner[b] = val
        return doc
    if not isinstance(inner, dict):
        return doc
    if not create and b not in inner:
        return doc
    inner[b] = val
    return doc


def _py_jsonb_insert(doc, path, val, after=False):
    import copy

    doc = copy.deepcopy(doc)
    if len(path) == 1:
        (k,) = path
        if isinstance(k, int) and isinstance(doc, dict):
            k = str(k)
        if isinstance(k, int):
            if not isinstance(doc, list):
                return doc
            doc.insert(k + 1 if after else k, val)
            return doc
        if not isinstance(doc, dict) or k in doc:
            return doc
        doc[k] = val
        return doc
    a, b = path
    if not isinstance(doc, dict):
        return doc
    inner = doc.get(a)
    if isinstance(b, int) and isinstance(inner, dict):
        b = str(b)
    if isinstance(b, int):
        if not isinstance(inner, list):
            return doc
        inner.insert(b + 1 if after else b, val)
        return doc
    if not isinstance(inner, dict) or b in inner:
        return doc
    inner[b] = val
    return doc


def _py_jsonb_del(doc, path):
    import copy

    doc = copy.deepcopy(doc)
    if len(path) == 1:
        (k,) = path
        if isinstance(k, int):
            if isinstance(doc, list) and 0 <= k < len(doc):
                del doc[k]
            return doc
        if isinstance(doc, dict):
            doc.pop(k, None)
        elif isinstance(doc, list):
            doc = [x for x in doc if not (isinstance(x, str) and x == k)]
        return doc
    a, b = path
    if not isinstance(doc, dict):
        return doc
    inner = doc.get(a)
    if isinstance(b, int) and isinstance(inner, dict):
        b = str(b)
    if isinstance(b, int):
        if isinstance(inner, list) and 0 <= b < len(inner):
            del inner[b]
        return doc
    if isinstance(inner, dict):
        inner.pop(b, None)
    return doc


def _py_jsonb_concat(doc, rhs):
    import copy

    doc = copy.deepcopy(doc)
    # PG rule: object || object merges (RHS wins); any other
    # combination wraps the non-array side(s) into 1-element arrays
    # and concatenates.
    if isinstance(rhs, dict) and isinstance(doc, dict):
        doc.update(copy.deepcopy(rhs))
        return doc
    left = doc if isinstance(doc, list) else [doc]
    right = rhs if isinstance(rhs, list) else [rhs]
    return left + copy.deepcopy(right)


def _path_lit(path):
    return "'{" + ",".join(str(p) for p in path) + "}'"


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    docs=st.lists(_MDOC, min_size=1, max_size=5),
    path=_MPATH,
    val=_MVAL,
    rhs=_MDOC,
    create=st.booleans(),
    after=st.booleans(),
)
def test_jsonb_mutations_match_python_reference(
    spark, docs, path, val, rhs, create, after
):
    import json as _json

    from clickhouse_build_spark.functions.chsql import run_pg_sql

    def q(s):
        return s.replace("'", "''")

    vlit = "'" + q(_json.dumps(val)) + "'"
    plit = _path_lit(path)
    rlit = "'" + q(_json.dumps(rhs)) + "'"
    # r16: jsonb_insert translates {key,key} too (insert-if-absent
    # into a nested object), so the full path is always usable
    ins_path = path
    iplit = _path_lit(ins_path)
    # #- translates only str-first 2-step paths; minus-delete handles
    # the 1-step forms — pick the matching delete spelling per path
    if len(path) == 1:
        dele = (
            f"j::jsonb - {path[0]}"
            if isinstance(path[0], int)
            else "j::jsonb - '" + q(str(path[0])) + "'"
        )
    else:
        dele = f"j #- {plit}"
    rows = run_pg_sql(
        spark,
        f"""SELECT i,
              jsonb_set(j, {plit}, {vlit}, {'true' if create else 'false'}) AS s,
              jsonb_insert(j, {iplit}, {vlit}, {'true' if after else 'false'}) AS ins,
              {dele} AS d,
              j::jsonb || {rlit} AS c
            FROM VALUES """
        + ", ".join(
            f"({i}, '{q(_json.dumps(d))}')" for i, d in enumerate(docs)
        )
        + " AS t(i, j) ORDER BY i",
    ).collect()
    for i, (r, d) in enumerate(zip(rows, docs)):
        for col, ref in (
            ("s", _py_jsonb_set(d, path, val, create)),
            ("ins", _py_jsonb_insert(d, ins_path, val, after)),
            ("d", _py_jsonb_del(d, path)),
            ("c", _py_jsonb_concat(d, rhs)),
        ):
            got = _json.loads(r[col]) if r[col] is not None else None
            assert got == ref and type(got) is type(ref), (
                col, d, path, val, rhs, create, after, got, ref,
            )
