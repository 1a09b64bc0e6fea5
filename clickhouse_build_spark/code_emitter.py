"""Deterministic code-migrator emitter — the reference's third
capability, without the LLM.

The reference's ``code_migrator`` agent (``src/agents/
code_migrator.py:57-127``) reads the latest scanner artifact, installs
``@clickhouse/client``, loads a golden corpus example, and writes a
strategy-pattern TypeScript client that routes OLAP reads to ClickHouse
behind a ``USE_CLICKHOUSE`` env toggle while PostgreSQL stays the
default — every file passing the QA gate before it is written
(``src/prompts/code_migrator.py:26-111``). Its golden output for the
no-ORM app is ``src/corpus/orm_none.txt:249-557``.

This module reimplements that loop as a deterministic template
emitter driven by the scanner's findings:

- each scanned analytical query becomes one strongly-typed strategy
  method, the PG text kept VERBATIM (the prompt's "never rewrite
  postgres queries" rule) and the CH variant derived by a rule-based
  PG→CH rewrite (the same F1–F9 mappings the dialect layer implements:
  DATE_TRUNC→toStartOfMonth, COALESCE(col,label)→if(empty(col),...),
  COALESCE(SUM(x),0)→sum(x), $N→{pN:String});
- the emitted files are the golden corpus's five-file layout
  (client wrapper, types, two strategies, env-toggled factory);
- every file is passed through this repo's own deterministic QA gate
  (``qa_gate.qa_check``) before being returned — rejection is a hard
  error, mirroring the agent's qa_approve-before-write contract;
- the summary JSON matches the prompt's step-7 return shape.

The emitted CH query texts are executable by this engine directly:
``Engine.sql(text, dialect="clickhouse")`` — the round-trip the e2e
test pins (scan → emit → QA-approve → execute CH variant ≡ PG
original).
"""

from __future__ import annotations

import dataclasses
import os
import re
from typing import Any

from clickhouse_build_spark.qa_gate import qa_check

__all__ = [
    "extract_sql",
    "pg_sql_to_ch",
    "emit_migration",
    "migrate_code",
]

_LOCKFILES = [
    ("package-lock.json", "npm", "npm install @clickhouse/client"),
    ("yarn.lock", "yarn", "yarn add @clickhouse/client"),
    ("pnpm-lock.yaml", "pnpm", "pnpm add @clickhouse/client"),
    ("bun.lockb", "bun", "bun add @clickhouse/client"),
]


def detect_package_manager(repo_path: str) -> tuple[str, str]:
    """(package_manager, install_command) from the repo's lockfile —
    the prompt's step 2/3 detection order; npm is the default."""
    for name, pm, cmd in _LOCKFILES:
        if os.path.exists(os.path.join(repo_path, name)):
            return pm, cmd
    return "npm", "npm install @clickhouse/client"


# ------------------------------------------------------- SQL extraction


def extract_sql(code: str) -> str | None:
    """Pull the SQL text out of a scanned code snippet: the first
    backtick template literal or quoted string containing SELECT.
    ``${whereClause}`` interpolations are kept as placeholders.
    String-concatenated builders (``query += \\`GROUP BY ...\\```, the
    prisma app's raw monthly query) are stitched back together: after
    the SELECT literal, subsequent literals that BEGIN with a clause
    keyword are appended in order."""
    _CONT = re.compile(
        r"^\s*(AND|WHERE|GROUP\s+BY|ORDER\s+BY|HAVING|LIMIT|OFFSET)\b",
        re.IGNORECASE,
    )
    for pat in (r"`([^`]*)`", r"'([^']*)'", r'"([^"]*)"'):
        lits = [m.group(1) for m in re.finditer(pat, code, re.DOTALL)]
        for i, lit in enumerate(lits):
            if re.search(r"\bSELECT\b", lit, re.IGNORECASE):
                parts = [lit]
                for nxt in lits[i + 1 :]:
                    if _CONT.match(nxt):
                        parts.append(nxt)
                return re.sub(r"\s+", " ", " ".join(parts)).strip()
    # Bare SQL from a scanned .sql file (r13 real-app fixture): the
    # statement IS the code — no literal to unwrap. An analytical VIEW
    # definition contributes its underlying SELECT (the view body is
    # the query; the DDL shell is the migrator's concern, not a method).
    bare = re.sub(r"(?m)^\s*--.*$", "", code).strip()
    vm = re.match(
        r"(?is)^CREATE\s+(?:OR\s+REPLACE\s+)?(?:MATERIALIZED\s+)?"
        r"VIEW\s+[\w.]+\s+AS\s+(SELECT\b.*)$",
        bare,
    )
    if vm:
        return re.sub(r"\s+", " ", vm.group(1)).strip().rstrip(";")
    if re.match(r"(?is)^(?:WITH|SELECT)\b", bare):
        return re.sub(r"\s+", " ", bare).strip().rstrip(";")
    return None


_INTERP = re.compile(r"\$\{(\w+)\}")


def _check_interpolations(sql: str) -> None:
    for m in _INTERP.finditer(sql):
        if m.group(1) != "whereClause":
            raise ValueError(
                f"unsupported template interpolation ${{{m.group(1)}}} — "
                "the deterministic emitter handles the corpus's "
                "whereClause pattern only"
            )


# ------------------------------------------------------- PG → CH rewrite


def pg_sql_to_ch(sql: str) -> str:
    """Rule-based PG→CH rewrite of one analytical query — the exact
    transformations the golden corpus applied (F1–F9 dialect pairs),
    applied mechanically. Postgres text is NEVER altered in place; this
    derives the parallel CH variant."""
    out = sql
    # COALESCE(SUM(x), 0) → sum(x): CH aggregates over zero rows give 0
    out = re.sub(
        r"COALESCE\(\s*SUM\(([^()]*)\)\s*,\s*0\s*\)",
        r"sum(\1)",
        out,
        flags=re.IGNORECASE,
    )
    # COALESCE(col, 'label') → if(empty(col), 'label', col)  (F2)
    out = re.sub(
        r"COALESCE\(\s*(\w+)\s*,\s*('[^']*')\s*\)",
        r"if(empty(\1), \2, \1)",
        out,
        flags=re.IGNORECASE,
    )
    # DATE_TRUNC('month', col) → toStartOfMonth(col)  (F1)
    out = re.sub(
        r"DATE_TRUNC\(\s*'month'\s*,\s*(\w+)\s*\)",
        r"toStartOfMonth(\1)",
        out,
        flags=re.IGNORECASE,
    )
    # positional $N params → CH named binding markers
    out = re.sub(r"\$(\d+)", r"{p\1:String}", out)
    return out


# ------------------------------------------------------ query analysis


@dataclasses.dataclass
class MethodSpec:
    name: str
    result_iface: str
    pg_sql: str  # raw apps: scanned text VERBATIM; ORM apps: derived equivalent
    ch_sql: str
    fields: list[tuple[str, str]]  # (name, ts_type)
    location: str
    query_type: str
    orm: str = "none"  # none | drizzle | prisma
    orm_call: str = ""  # the scanned ORM call, kept verbatim for the PG arm
    prisma_kind: str = ""  # aggregate | groupBy (prisma specs only)
    prisma_sumcol: str = ""
    group_col: str = ""


# --------------------------------------------- ORM call parsers (r10)
#
# The reference's golden corpora cover three app shapes (orm_none /
# orm_drizzleorm / orm_prismaorm). For ORM apps the PG strategy keeps
# the ORM CALL verbatim (never rewrite the postgres side) while the CH
# strategy gets raw CH SQL derived from the call's semantics with the
# golden idioms: drizzle's string-typed sum() becomes
# sum(toFloat64(col)) (corpus/orm_drizzleorm.txt:453-513), prisma's
# _sum stays sum(col) (corpus/orm_prismaorm.txt), COALESCE labels
# become if(empty(...)), DATE_TRUNC('month') becomes toStartOfMonth.
# A PG-equivalent raw SQL is ALSO derived for each ORM call — not
# emitted into the client (the ORM call is the PG truth) but reported
# in the summary and used by the e2e round-trip to prove the CH
# variant computes the same rows.


def _drizzle_raw(sql_tpl: str) -> str:
    return re.sub(r"\$\{expenses\.(\w+)\}", r"\1", sql_tpl).strip()


def _builder_deferred(code: str, chain_start: int) -> bool:
    """A builder chain ASSIGNED without ``await`` is a deferred/partial
    chain — grouping/filtering may be applied by a helper elsewhere;
    emitting the visible arm would silently drop it (r13)."""
    head = code[:chain_start]
    # the receiver may sit between '=' and the chain start
    # (`const base = ds` + `.createQueryBuilder(` — r14 typeorm)
    am = re.search(
        r"(?:let|const|var)\s+\w+\s*=\s*[\w.$]*\s*$", head.rstrip()
    )
    return am is not None and "await" not in head


_KYSELY_FN = {"count": "COUNT", "sum": "SUM", "avg": "AVG", "min": "MIN", "max": "MAX"}

# Chain methods the kysely/knex translators UNDERSTAND. Any other
# .method( in the chain (where/having/offset/distinct/unionAll/...)
# must fail loudly — silently dropping a .where() would emit a method
# that returns MORE rows than the app's query (r13c audit).
_KYSELY_METHODS = {
    "selectFrom", "innerJoin", "leftJoin", "rightJoin", "fullJoin",
    "select", "where", "groupBy", "orderBy", "limit", "execute",
    # inner expression calls inside select items
    "count", "sum", "avg", "min", "max", "as",
}
_KNEX_METHODS = {
    "select", "where", "andWhere", "orWhere", "count", "sum", "avg",
    "min", "max", "groupBy", "orderBy", "limit", "raw",
    "whereIn", "whereNotIn", "whereNull", "whereNotNull",
}


def _reject_unknown_chain_methods(
    code: str, allowed: set[str], kind: str
) -> None:
    for m in re.finditer(r"\.\s*(\w+)\s*\(", code):
        if m.group(1) not in allowed:
            raise ValueError(
                f"untranslatable {kind} chain method .{m.group(1)}(...) — "
                "emitting without it would silently change the query "
                f"(e.g. drop a filter): {code[:120]!r}"
            )


def _assert_chain_consumed(
    code: str, consumed: dict[str, int], kind: str
) -> None:
    """Loud-failure backstop (ADVICE r14, high): a chain method whose
    NAME passes :func:`_reject_unknown_chain_methods` but whose
    ARGUMENTS miss the parse regex must raise, never vanish from the
    emitted SQL — a join lost to a trailing comment, a backtick-quoted
    projection, a non-literal ``.limit(n)`` all change the row set
    silently. Each key is a method-name alternation; its value is how
    many calls the parser actually translated. Any call present in the
    code but not consumed raises."""
    for meth, n_parsed in consumed.items():
        n_code = len(re.findall(rf"\.\s*(?:{meth})\s*\(", code))
        if n_code != n_parsed:
            raise ValueError(
                f"{kind} chain: {n_code} .{meth}(...) call(s) in the "
                f"code but only {n_parsed} translated — the rest carry "
                "arguments this translator cannot parse faithfully "
                "(non-literal value, backtick template, or trailing "
                f"comment); refusing to emit without them: {code[:120]!r}"
            )


_JS_OPS = {"=", "!=", "<>", "<", "<=", ">", ">="}

# Escape sequences the literal translators decode to their ACTUAL
# characters (ADVICE r15, low: '\n' must become a newline in the SQL
# literal, not the bare letter 'n'). Anything else (\u..., \x..,
# \b, \0, ...) raises — a guessed decode would silently change the
# value the app compares against.
_LIT_ESC = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", "'": "'", '"': '"'}


def _unescape_literal(s: str, kind: str) -> str:
    out, i = [], 0
    while i < len(s):
        ch = s[i]
        if ch == "\\":
            nxt = s[i + 1] if i + 1 < len(s) else ""
            if nxt not in _LIT_ESC:
                raise ValueError(
                    f"unsupported escape sequence \\{nxt} in {kind} "
                    f"string literal (only \\n \\t \\r \\\\ \\' \\\" "
                    f"are translated faithfully): {s[:60]!r}"
                )
            out.append(_LIT_ESC[nxt])
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _js_literal_sql(v: str) -> str:
    """A JS argument literal → SQL literal; loud on anything dynamic
    (identifiers, template strings, member chains)."""
    v = v.strip()
    m = re.fullmatch(r"'((?:[^'\\]|\\.)*)'|\"((?:[^\"\\]|\\.)*)\"", v)
    if m is not None:
        s = m.group(1) if m.group(1) is not None else m.group(2)
        s = _unescape_literal(s, "JS")
        return "'" + s.replace("'", "''") + "'"
    if re.fullmatch(r"-?\d+(?:\.\d+)?", v):
        return v
    if v in ("true", "false"):
        return v.upper()
    raise ValueError(
        f"untranslatable builder literal (quoted strings / numbers / "
        f"booleans only): {v!r}"
    )


def _split_top_commas(body: str) -> list[str]:
    """Split on depth-0 commas, quote-aware (the shared JS argument
    splitter for builder chains). A backslash inside a quote escapes
    the next character (ADVICE r16, low: ``'it\\'s, ok'`` must not
    close the quote at the escaped apostrophe and mis-split on the
    embedded comma)."""
    args, depth, cur, quote = [], 0, [], None
    skip = False
    for ch in body:
        if quote:
            cur.append(ch)
            if skip:
                skip = False
            elif ch == "\\":
                skip = True
            elif ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
        elif ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        if ch == "," and depth == 0:
            args.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    args.append("".join(cur))
    return args


def _object_literal_conds(body: str, kind: str) -> list[str]:
    """A JS object literal ``{a: 1, b: 'x'}`` → equality conditions
    (knex's object-``where`` ANDs them, exactly like this). Loud on
    computed keys, spreads, shorthand properties, non-literal
    values."""
    conds = []
    for pair in _split_top_commas(body):
        pair = pair.strip()
        if not pair:
            continue
        km = re.fullmatch(
            r"(?:(\w+)|['\"]([\w.]+)['\"])\s*:\s*(.+)", pair, re.DOTALL
        )
        if km is None:
            raise ValueError(
                f"untranslatable {kind} object-where entry (literal "
                f"key: value pairs only): {pair[:60]!r}"
            )
        key = km.group(1) or km.group(2)
        conds.append(f"{key} = {_js_literal_sql(km.group(3))}")
    if not conds:
        raise ValueError(f"empty {kind} object-where")
    return conds


def _raise_unbound(name: str, cond: str) -> str:
    raise ValueError(
        f"typeorm .where references :{name} with no literal binding "
        f"in the parameters object: {cond[:60]!r}"
    )


def _builder_wheres(code: str, kind: str) -> tuple[list[str], int, bool]:
    """Translate ``.where/.andWhere/.orWhere(...)`` calls with LITERAL
    arguments into SQL conditions (r15b — the same found-or-loud
    upgrade Django's filter got; r16 adds the kysely single-expression
    callback form ``(eb) => eb('col','op',val)``, the knex object form
    ``{a: 1}``, and TypeORM ``'col = :v', {v: 1}`` literal binds; r17
    adds ``.orWhere`` for knex/TypeORM — the chain folds positionally
    into OR-split AND-groups, knex's own left-to-right boolean, and
    returns as ONE parenthesized condition).
    Returns ``(conds, n_calls, has_or)``; raises on any call outside
    the literal subset (multi-expression callbacks, dynamic binds) —
    the count backstop in each parser keeps a missed call loud."""
    conds: list[str] = []
    ors: list[bool] = []
    n_calls = 0
    for wm in re.finditer(r"\.\s*(where|andWhere|orWhere)\s*\(", code):
        is_or = wm.group(1) == "orWhere"
        if is_or and kind == "kysely":
            raise ValueError(
                "kysely has no .orWhere — compose with "
                "(eb) => eb.or([...]) instead"
            )
        n_calls += 1
        ors.append(is_or)
        body = _balanced_args(code, wm.end() - 1)
        if kind == "kysely":
            cb = re.match(r"\s*\(?\s*(\w+)\s*\)?\s*=>\s*", body)
            if cb:
                # r16: (eb) => eb('col','op',val); r17 (VERDICT #3):
                # eb.and([...]) / eb.or([...]) / eb.not(...)
                # compositions build the boolean tree recursively
                conds.append(_kysely_eb_sql(cb.group(1), body[cb.end():]))
                continue
        args = _split_top_commas(body)
        if kind == "typeorm":
            am = re.fullmatch(
                r"\s*(['\"])((?:(?!\1).)*)\1\s*", args[0], re.DOTALL
            )
            if am is None:
                raise ValueError(
                    "typeorm .where translates only a literal "
                    f"condition string: {args[0][:60]!r}"
                )
            cond = am.group(2)
            if len(args) == 2:
                # ':param' markers bound from a LITERAL parameters
                # object splice at scan time (r16, VERDICT #7 — the
                # same bind-time expansion run_pg_sql's params do)
                pm_ = re.fullmatch(r"\s*\{(.*)\}\s*", args[1], re.DOTALL)
                if pm_ is None:
                    raise ValueError(
                        "typeorm .where parameters must be a literal "
                        f"object to bind at scan time: {args[1][:60]!r}"
                    )
                binds = {}
                for pair in _split_top_commas(pm_.group(1)):
                    pair = pair.strip()
                    if not pair:
                        continue
                    km = re.fullmatch(
                        r"(\w+)\s*:\s*(.+)", pair, re.DOTALL
                    )
                    if km is None:
                        raise ValueError(
                            "untranslatable typeorm parameter entry "
                            f"(literal key: value only): {pair[:60]!r}"
                        )
                    binds[km.group(1)] = _js_literal_sql(km.group(2))
                cond = re.sub(
                    r":(\w+)",
                    lambda mm: binds.get(mm.group(1))
                    or _raise_unbound(mm.group(1), cond),
                    cond,
                )
            elif len(args) != 1:
                raise ValueError(
                    "typeorm .where takes a condition string and at "
                    f"most one parameters object: {args!r}"
                )
            if re.search(r":\w+", cond):
                raise ValueError(
                    "typeorm .where has unbound :params (bind at "
                    f"runtime): {cond[:60]!r}"
                )
            conds.append(f"({cond})")
            continue
        if len(args) == 1 and kind == "knex":
            om_ = re.fullmatch(r"\s*\{(.*)\}\s*", args[0], re.DOTALL)
            if om_ is None:
                raise ValueError(
                    "untranslatable knex .where shape (literal "
                    "('col', 'op', value), ('col', value), or "
                    f"{{col: value}} only): {args!r}"
                )
            # ONE condition per call — the chain-consumed backstop
            # counts .where calls against len(conds)
            pairs = _object_literal_conds(om_.group(1), kind)
            conds.append(
                f"({' AND '.join(pairs)})" if len(pairs) > 1 else pairs[0]
            )
            continue
        conds.append(_js_where_cond(args, kind))
    assert len(ors) == len(conds)
    has_or = any(ors)
    if not has_or:
        return conds, n_calls, False
    # fold positionally: OR starts a new group; AND binds tighter on
    # both sides, so the unparenthesized inner join preserves knex's
    # left-to-right boolean exactly
    groups: list[list[str]] = []
    cur: list[str] = []
    for is_or, c in zip(ors, conds):
        if is_or and cur:
            groups.append(cur)
            cur = [c]
        else:
            cur.append(c)
    groups.append(cur)
    folded = " OR ".join(" AND ".join(g) for g in groups)
    return [f"({folded})"], n_calls, True


def _js_where_cond(args: list[str], kind: str) -> str:
    """One positional ``('col', ['op',] value)`` argument list → a
    SQL condition (the shared leaf translator for builder chains and
    kysely expression trees)."""
    if len(args) == 2 and kind == "knex":
        col, lit = args
        op = "="
    elif len(args) == 3:
        col, op_raw, lit = args
        om = re.fullmatch(
            r"\s*['\"]([=<>!]{1,2}|in|not\s+in|is|is\s+not)['\"]\s*",
            op_raw,
            re.IGNORECASE,
        )
        if om is None or (
            re.fullmatch(r"[=<>!]{1,2}", om.group(1))
            and om.group(1) not in _JS_OPS
        ):
            raise ValueError(
                f"untranslatable {kind} .where operator: "
                f"{op_raw!r}"
            )
        op = " ".join(om.group(1).lower().split())
        op = "!=" if op == "<>" else op
    else:
        raise ValueError(
            f"untranslatable {kind} .where shape (literal "
            "('col', 'op', value) only — callbacks, object args "
            f"and bind params stay runtime concerns): {args!r}"
        )
    cm = re.fullmatch(r"\s*['\"]([\w.]+)['\"]\s*", col)
    if cm is None:
        raise ValueError(
            f"untranslatable {kind} .where column: {col!r}"
        )
    if op in ("in", "not in"):
        return (
            f"{cm.group(1)} {op.upper()} "
            f"({_js_array_literal_sql(lit, kind)})"
        )
    if op in ("is", "is not"):
        if lit.strip() != "null":
            raise ValueError(
                f"{kind} .where '{op}' translates only against a "
                f"null literal: {lit[:60]!r}"
            )
        return (
            f"{cm.group(1)} IS NULL" if op == "is" else
            f"{cm.group(1)} IS NOT NULL"
        )
    return f"{cm.group(1)} {op} {_js_literal_sql(lit)}"


def _kysely_eb_sql(var: str, expr: str) -> str:
    """A kysely expression-builder callback body → SQL (r17, VERDICT
    #3): the single-expression leaf ``eb('col', 'op', value)`` plus
    the boolean compositions ``eb.and([...])``, ``eb.or([...])`` and
    ``eb.not(...)``, recursively. Anything outside that literal
    grammar (references, ternaries, dynamic arrays) raises."""
    expr = expr.strip()
    cm = re.match(rf"{re.escape(var)}\s*\.\s*(and|or|not)\s*\(", expr)
    if cm:
        open_idx = cm.end() - 1
        inner = _balanced_args(expr, open_idx)
        if expr[open_idx + len(inner) + 2 :].strip():
            raise ValueError(
                "untranslatable kysely callback (trailing content "
                f"after eb.{cm.group(1)}(...)): {expr[:80]!r}"
            )
        if cm.group(1) == "not":
            return f"NOT ({_kysely_eb_sql(var, inner)})"
        am = re.fullmatch(r"\s*\[(.*)\]\s*", inner, re.DOTALL)
        if am is None:
            raise ValueError(
                f"kysely eb.{cm.group(1)} takes a literal array of "
                f"expressions: {inner[:80]!r}"
            )
        items = [
            it for it in _split_top_commas(am.group(1)) if it.strip()
        ]
        if not items:
            raise ValueError(
                f"kysely eb.{cm.group(1)} with an empty array: "
                f"{expr[:80]!r}"
            )
        joiner = " AND " if cm.group(1) == "and" else " OR "
        return "(" + joiner.join(
            _kysely_eb_sql(var, it) for it in items
        ) + ")"
    lm = re.fullmatch(rf"{re.escape(var)}\s*\((.*)\)", expr, re.DOTALL)
    if lm is None:
        raise ValueError(
            "untranslatable kysely .where callback (the literal "
            f"{var}('col','op',value) / {var}.and / {var}.or / "
            f"{var}.not grammar only): {expr[:80]!r}"
        )
    return _js_where_cond(_split_top_commas(lm.group(1)), "kysely")


def _js_array_literal_sql(lit: str, kind: str) -> str:
    """A JS array literal ``['a', 1]`` → comma-joined SQL literals
    (the IN-list body); loud on spreads / non-literal elements."""
    am = re.fullmatch(r"\s*\[(.*)\]\s*", lit, re.DOTALL)
    if am is None:
        raise ValueError(
            f"{kind} IN-list must be a literal array: {lit[:60]!r}"
        )
    lits = [
        _js_literal_sql(x)
        for x in _split_top_commas(am.group(1))
        if x.strip()
    ]
    if not lits:
        raise ValueError(f"{kind} IN-list is empty: {lit[:60]!r}")
    return ", ".join(lits)


def _where_arm(conds: list[str]) -> str:
    """The raw-SQL splice arm: translated conditions compose with the
    runtime DateFilter through the literal ``WHERE 1=1`` (the strategy
    rewrites it); with no conditions the ``${whereClause}`` splice
    stands alone."""
    if conds:
        return "WHERE 1=1 AND " + " AND ".join(conds)
    return "${whereClause}"



def _group_by_cols(code: str, kind: str) -> tuple[list[str], int]:
    """``.groupBy(...)`` columns across the vararg ``('a', 'b')`` and
    array ``(['a', 'b'])`` spellings (r16) → (columns, n_calls). Loud
    on any non-literal item."""
    cols: list[str] = []
    n = 0
    for gm in re.finditer(r"\.\s*groupBy\s*\(", code):
        n += 1
        body = _balanced_args(code, gm.end() - 1).strip()
        am = re.fullmatch(r"\[(.*)\]", body, re.DOTALL)
        if am is not None:
            body = am.group(1)
        for it in _split_top_commas(body):
            it = it.strip()
            if not it:
                continue
            qm = re.fullmatch(r"['\"]([\w.]+)['\"]", it)
            if qm is None:
                raise ValueError(
                    f"untranslatable {kind} .groupBy item: {it[:60]!r}"
                )
            cols.append(qm.group(1))
    return cols, n


def parse_kysely(code: str) -> str | None:
    """kysely builder chain → raw PG SQL with the ``${whereClause}``
    splice point (r13 — the real-app fixture's chain shape). Returns
    None when the code is not a kysely chain; raises on kysely chains
    whose pieces it cannot translate faithfully (loud, never a guess).

    Supported: ``db.selectFrom('t')``, ``.innerJoin/.leftJoin('t2',
    'a.col', 'b.col')``, ``.select([...])`` (optionally the
    ``({ fn }) => [...]`` callback form) with string projections
    (``'t.col as alias'``) and ``fn.count/sum/avg/min/max('col')
    .as('alias')``, ``.groupBy('col')``, ``.orderBy('col'[, 'desc'])``,
    ``.limit(n)``. The derived SQL goes through the same raw-SQL
    machinery as a scanned literal (CH arm via pg_sql_to_ch)."""
    m = re.search(r"db\s*\.\s*selectFrom\(\s*['\"](\w+)['\"]\s*\)", code)
    if m is None:
        return None
    if _builder_deferred(code, m.start()):
        raise ValueError(
            "deferred kysely builder (assigned without await) — the "
            "chain may be completed elsewhere; scanned block cannot be "
            f"emitted faithfully: {code[:120]!r}"
        )
    _reject_unknown_chain_methods(code, _KYSELY_METHODS, "kysely")
    wheres, n_wcalls, _ = _builder_wheres(code, "kysely")
    table = m.group(1)
    joins = []
    for jm in re.finditer(
        r"\.(innerJoin|leftJoin|rightJoin|fullJoin)\(\s*['\"](\w+)['\"]\s*,"
        r"\s*['\"]([\w.]+)['\"]\s*,\s*['\"]([\w.]+)['\"]\s*\)",
        code,
    ):
        kind = {
            "innerJoin": "JOIN",
            "leftJoin": "LEFT JOIN",
            "rightJoin": "RIGHT JOIN",
            "fullJoin": "FULL JOIN",
        }[jm.group(1)]
        joins.append(f"{kind} {jm.group(2)} ON {jm.group(3)} = {jm.group(4)}")
    sm = re.search(
        r"\.select\(\s*(?:\(\s*\{\s*fn\s*\}\s*\)\s*=>\s*)?\[(.*?)\]\s*\)",
        code,
        re.DOTALL,
    )
    if sm is None:
        raise ValueError(
            f"kysely chain without a parseable .select([...]): {code[:120]!r}"
        )
    items, depth, cur = [], 0, []
    for ch in sm.group(1):
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            items.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        items.append("".join(cur).strip())
    sels = []
    for it in items:
        lm = re.fullmatch(r"['\"]([\w.]+)(?:\s+as\s+(\w+))?['\"]", it)
        if lm:
            sels.append(
                f"{lm.group(1)} AS {lm.group(2)}" if lm.group(2) else lm.group(1)
            )
            continue
        fm = re.fullmatch(
            r"fn\s*\.\s*(\w+)\(\s*['\"]([\w.]+)['\"]\s*\)"
            r"\s*\.\s*as\(\s*['\"](\w+)['\"]\s*\)",
            it,
        )
        if fm and fm.group(1) in _KYSELY_FN:
            sels.append(
                f"{_KYSELY_FN[fm.group(1)]}({fm.group(2)}) AS {fm.group(3)}"
            )
            continue
        raise ValueError(f"untranslatable kysely select item: {it!r}")
    group, n_group_calls = _group_by_cols(code, "kysely")
    order = [
        f"{om.group(1)} {(om.group(2) or 'asc').upper()}"
        for om in re.finditer(
            r"\.orderBy\(\s*['\"]([\w.]+)['\"]\s*"
            r"(?:,\s*['\"](asc|desc)['\"]\s*)?\)",
            code,
        )
    ]
    lm = re.search(r"\.limit\(\s*(\d+)\s*\)", code)
    _assert_chain_consumed(
        code,
        {
            "innerJoin|leftJoin|rightJoin|fullJoin": len(joins),
            "select": 1,
            "where|andWhere|orWhere": n_wcalls,
            "groupBy": n_group_calls,
            "orderBy": len(order),
            "limit": 1 if lm else 0,
        },
        "kysely",
    )
    sql = f"SELECT {', '.join(sels)} FROM {table}"
    for j in joins:
        sql += f" {j}"
    sql += " " + _where_arm(wheres)
    if group:
        sql += f" GROUP BY {', '.join(group)}"
    if order:
        sql += f" ORDER BY {', '.join(order)}"
    if lm:
        sql += f" LIMIT {lm.group(1)}"
    return sql


def parse_knex(code: str) -> str | None:
    """knex builder chain → raw PG SQL with the splice point (r13).
    Supported: ``knex('t')``, ``.select(...)`` of quoted columns and
    ``knex.raw("...")`` fragments, ``.count/.sum/.avg/.min/.max('col
    [as alias]')``, ``.groupBy/.orderBy('col'[, 'desc'])``,
    ``.limit(n)``, literal ``.where`` forms (3-arg / 2-arg / object,
    r15b-r16), and the dedicated ``.whereIn/.whereNotIn('col',
    [literals])`` + ``.whereNull/.whereNotNull('col')`` methods (r16).
    Loud on anything else."""
    m = re.search(r"\bknex\(\s*['\"](\w+)['\"]\s*\)", code)
    if m is None:
        return None
    if _builder_deferred(code, m.start()):
        raise ValueError(
            "deferred knex builder (assigned without await) — the chain "
            f"may be completed elsewhere: {code[:120]!r}"
        )
    _reject_unknown_chain_methods(code, _KNEX_METHODS, "knex")
    wheres, n_wcalls, has_or = _builder_wheres(code, "knex")
    # knex's dedicated null/IN where methods (r16). With .orWhere in
    # the chain their POSITION changes the boolean (knex appends each
    # clause left-to-right: .where(A).orWhere(B).whereIn(..) is
    # A OR (B AND in)) — the fold below appends them as a trailing
    # AND, so the combination refuses rather than regrouping silently.
    if has_or and re.search(
        r"\.\s*(whereIn|whereNotIn|whereNull|whereNotNull)\s*\(", code
    ):
        raise ValueError(
            "knex .orWhere mixed with whereIn/whereNull-family calls "
            "is not translatable (their position changes the boolean "
            f"grouping): {code[:120]!r}"
        )
    n_wnull = 0
    for nm in re.finditer(
        r"\.\s*(whereNull|whereNotNull)\(\s*['\"]([\w.]+)['\"]\s*\)", code
    ):
        wheres.append(
            f"{nm.group(2)} IS NULL" if nm.group(1) == "whereNull"
            else f"{nm.group(2)} IS NOT NULL"
        )
        n_wnull += 1
    n_win = 0
    for im_ in re.finditer(r"\.\s*(whereIn|whereNotIn)\s*\(", code):
        body = _balanced_args(code, im_.end() - 1)
        iargs = _split_top_commas(body)
        icm = (
            re.fullmatch(r"\s*['\"]([\w.]+)['\"]\s*", iargs[0])
            if len(iargs) == 2
            else None
        )
        if icm is None:
            raise ValueError(
                f"untranslatable knex .{im_.group(1)} shape (literal "
                f"('col', [values]) only): {body[:60]!r}"
            )
        inlist = _js_array_literal_sql(iargs[1], "knex")
        neg = "NOT IN" if im_.group(1) == "whereNotIn" else "IN"
        wheres.append(f"{icm.group(1)} {neg} ({inlist})")
        n_win += 1
    table = m.group(1)
    sels = []
    sm = re.search(r"\.select\(\s*(.*?)\s*\)\s*[\n.;]", code, re.DOTALL)
    if sm:
        for it in re.split(r",(?![^()]*\))", sm.group(1)):
            it = it.strip()
            rm = re.fullmatch(
                r"knex\.raw\(\s*([\"'])(.*?)\1\s*\)", it, re.DOTALL
            )
            if rm:
                sels.append(rm.group(2))
                continue
            qm = re.fullmatch(r"['\"]([\w.]+(?:\s+as\s+\w+)?)['\"]", it)
            if qm:
                sels.append(re.sub(r"\s+as\s+", " AS ", qm.group(1)))
                continue
            raise ValueError(f"untranslatable knex select item: {it!r}")
    n_aggs = 0
    for am in re.finditer(
        r"\.(count|sum|avg|min|max)\(\s*['\"]([\w.]+)"
        r"(?:\s+as\s+(\w+))?['\"]\s*\)",
        code,
    ):
        fn, col, alias = am.group(1).upper(), am.group(2), am.group(3)
        sels.append(f"{fn}({col}) AS {alias}" if alias else f"{fn}({col})")
        n_aggs += 1
    if not sels:
        raise ValueError(
            f"knex chain without a translatable projection: {code[:120]!r}"
        )
    group, n_group_calls = _group_by_cols(code, "knex")
    order = [
        f"{om.group(1)} {(om.group(2) or 'asc').upper()}"
        for om in re.finditer(
            r"\.orderBy\(\s*['\"]([\w.]+)['\"]\s*"
            r"(?:,\s*['\"](asc|desc)['\"]\s*)?\)",
            code,
        )
    ]
    lm = re.search(r"\.limit\(\s*(\d+)\s*\)", code)
    _assert_chain_consumed(
        code,
        {
            "select": 1 if sm else 0,
            "count|sum|avg|min|max": n_aggs,
            "where|andWhere|orWhere": n_wcalls,
            "whereNull|whereNotNull": n_wnull,
            "whereIn|whereNotIn": n_win,
            "groupBy": n_group_calls,
            "orderBy": len(order),
            "limit": 1 if lm else 0,
        },
        "knex",
    )
    sql = f"SELECT {', '.join(sels)} FROM {table} " + _where_arm(wheres)
    if group:
        sql += f" GROUP BY {', '.join(group)}"
    if order:
        sql += f" ORDER BY {', '.join(order)}"
    if lm:
        sql += f" LIMIT {lm.group(1)}"
    return sql


_TYPEORM_METHODS = {
    "createQueryBuilder", "from", "select", "addSelect",
    "where", "andWhere", "orWhere",
    "innerJoin", "leftJoin",
    "groupBy", "addGroupBy", "orderBy", "addOrderBy",
    "limit", "take", "getRawMany", "getRawOne",
}


def parse_typeorm(code: str, table_hint: str | None = None) -> str | None:
    """TypeORM ``createQueryBuilder()`` chain → raw PG SQL with the
    ``${whereClause}`` splice point (r14, VERDICT #3 — the reference's
    external eval includes the twenty app class,
    ``clone_test_oss_repos.sh:31-37``). Returns None when the code has
    no ``createQueryBuilder``; raises on chains it cannot translate
    faithfully — loud, never a guess.

    Supported: ``dataSource.createQueryBuilder().from('table',
    'alias')`` (the string-named form — the table is visible in the
    chain), ``.select(expr[, alias])`` / ``.addSelect(expr[, alias])``
    with raw-SQL expression strings (TypeORM passes them through
    verbatim, so we do too), ``.innerJoin/.leftJoin('table', 'alias',
    'condition')``, ``.groupBy/.addGroupBy(expr)``,
    ``.orderBy/.addOrderBy(expr[, 'ASC'|'DESC'])``, ``.limit/.take(n)``,
    terminal ``.getRawMany()/.getRawOne()``.

    Repository-scoped ``repo.createQueryBuilder('alias')`` chains (no
    ``.from``) translate ONLY when the caller resolved the entity's
    table from a repo-visible ``@Entity('name')`` declaration and
    passed it as ``table_hint`` (r15, VERDICT #3 —
    :func:`build_method_specs` walks the source file for the
    ``getRepository(Class)`` binding); otherwise loud.

    ``.where/.andWhere`` translate for literal condition strings,
    including ``:param`` markers bound from a LITERAL parameters
    object spliced at scan time (r16, VERDICT #7 — the same bind-time
    expansion ``run_pg_sql(params=...)`` does).

    NOT supported (loud): a repository chain whose entity declaration
    is not visible in the repo; ``.from(EntityClass, ...)``;
    entity-property joins (``.innerJoin('e.category', ...)``);
    ``.where`` with dynamic binds or ``.having/...`` (dropping one
    would silently change the query — same contract as kysely/knex).
    """
    m = re.search(r"\.\s*createQueryBuilder\s*\(", code)
    if m is None:
        return None
    if _builder_deferred(code, m.start()):
        raise ValueError(
            "deferred typeorm builder (assigned without await) — the "
            "chain may be completed elsewhere; scanned block cannot be "
            f"emitted faithfully: {code[:120]!r}"
        )
    _reject_unknown_chain_methods(code, _TYPEORM_METHODS, "typeorm")
    wheres, n_wcalls, _ = _builder_wheres(code, "typeorm")
    fm = re.search(
        r"\.from\(\s*['\"](\w+)['\"]\s*(?:,\s*['\"](\w+)['\"]\s*)?\)", code
    )
    if fm is not None:
        table = fm.group(1) + (f" {fm.group(2)}" if fm.group(2) else "")
    elif table_hint is not None:
        alias = re.search(
            r"\.\s*createQueryBuilder\s*\(\s*['\"](\w+)['\"]", code
        )
        table = table_hint + (f" {alias.group(1)}" if alias else "")
    else:
        raise ValueError(
            "typeorm chain without .from('table'): the entity's table "
            "name lives in the @Entity decorator, not the scanned "
            "chain — a repository.createQueryBuilder(...) emits only "
            "when the repo declares @Entity('name')/@Entity({name}) "
            "for the repository's class (and .from(EntityClass, ...) "
            f"is never translatable): {code[:120]!r}"
        )
    joins = []
    for jm in re.finditer(
        r"\.(innerJoin|leftJoin)\(\s*(.*?)\)\s*(?:[\n.;]|//|/\*|$)", code
    ):
        args = re.fullmatch(
            r"['\"](\w+)['\"]\s*,\s*['\"](\w+)['\"]\s*,\s*"
            r"['\"]([^'\"]+)['\"]\s*",
            jm.group(2),
        )
        if args is None:
            raise ValueError(
                "untranslatable typeorm join (entity-property joins "
                "need the @Entity mapping; only ('table', 'alias', "
                f"'condition') is translatable): {jm.group(0)[:80]!r}"
            )
        kind = "JOIN" if jm.group(1) == "innerJoin" else "LEFT JOIN"
        joins.append(
            f"{kind} {args.group(1)} {args.group(2)} ON {args.group(3)}"
        )
    sels = []
    n_sel_calls = 0
    for sm_ in re.finditer(
        r"\.(?:select|addSelect)\(\s*(['\"])(.+?)\1\s*"
        r"(?:,\s*['\"](\w+)['\"]\s*)?\)",
        code,
    ):
        expr, alias = sm_.group(2), sm_.group(3)
        sels.append(f"{expr} AS {alias}" if alias else expr)
        n_sel_calls += 1
    am = re.search(r"\.select\(\s*\[(.*?)\]\s*\)", code, re.DOTALL)
    if am is not None:
        n_sel_calls += 1
        for it in am.group(1).split(","):
            it = it.strip()
            if not it:
                continue
            qm = re.fullmatch(r"['\"]([\w.]+)['\"]", it)
            if qm is None:
                raise ValueError(
                    f"untranslatable typeorm select item: {it!r}"
                )
            sels.append(qm.group(1))
    if not sels:
        raise ValueError(
            f"typeorm chain without a translatable projection: "
            f"{code[:120]!r}"
        )
    group = [
        gm.group(2)
        for gm in re.finditer(
            r"\.(?:groupBy|addGroupBy)\(\s*(['\"])(.+?)\1\s*\)", code
        )
    ]
    order = [
        f"{om.group(2)} {(om.group(3) or 'ASC').upper()}"
        for om in re.finditer(
            r"\.(?:orderBy|addOrderBy)\(\s*(['\"])(.+?)\1\s*"
            r"(?:,\s*['\"](ASC|DESC)['\"]\s*)?\)",
            code,
            re.IGNORECASE,
        )
    ]
    lm = re.search(r"\.(?:limit|take)\(\s*(\d+)\s*\)", code)
    _assert_chain_consumed(
        code,
        {
            "innerJoin|leftJoin": len(joins),
            "select|addSelect": n_sel_calls,
            "groupBy|addGroupBy": len(group),
            "orderBy|addOrderBy": len(order),
            "where|andWhere|orWhere": n_wcalls,
            "limit|take": 1 if lm else 0,
            "from": 1 if fm is not None else 0,
        },
        "typeorm",
    )
    sql = f"SELECT {', '.join(sels)} FROM {table}"
    for j in joins:
        sql += f" {j}"
    sql += " " + _where_arm(wheres)
    if group:
        sql += f" GROUP BY {', '.join(group)}"
    if order:
        sql += f" ORDER BY {', '.join(order)}"
    if lm:
        sql += f" LIMIT {lm.group(1)}"
    return sql


def _resolve_typeorm_entity(
    code: str,
    location: str,
    repo_path: str | None,
    model_tables: dict[str, str] | None,
) -> str | None:
    """Resolve the table behind a repository-scoped
    ``createQueryBuilder`` chain (r15, VERDICT #3). The chain's
    receiver variable is bound to its entity OUTSIDE the scanned
    snippet (``const repo = ds.getRepository(Expense)`` or a
    ``Repository<Expense>`` type annotation), so this walks the
    snippet's SOURCE FILE for that binding and maps the class through
    the repo-visible ``@Entity`` declarations in ``model_tables``.
    Returns None when any link is missing — the caller then refuses
    loudly, never guesses."""
    if not model_tables or not repo_path:
        return None
    rm = re.search(r"(\w+)\s*\.\s*createQueryBuilder\s*\(", code)
    if rm is None:
        return None
    recv = rm.group(1)
    path = os.path.join(repo_path, location.split(":")[0])
    try:
        text = open(path, encoding="utf-8", errors="ignore").read()
    except OSError:
        return None
    bm = re.search(
        rf"(?:const|let|var)\s+{re.escape(recv)}\b[^=\n]*=\s*"
        rf"(?:await\s+)?[\w.$]*\bgetRepository\(\s*(\w+)\s*\)",
        text,
    ) or re.search(
        rf"\b{re.escape(recv)}\s*:\s*Repository<\s*(\w+)\s*>", text
    )
    if bm is None:
        return None
    return model_tables.get(bm.group(1))


_DJANGO_FN = {"Sum": "SUM", "Count": "COUNT", "Avg": "AVG", "Min": "MIN", "Max": "MAX"}
# chain methods the Django translator understands; Sum/Count/... appear
# as `.Sum(` only in the `models.Sum(...)` spelling — allowed
_DJANGO_METHODS = {
    "all", "values", "annotate", "aggregate", "order_by",
    "filter", "exclude",
} | set(_DJANGO_FN)

# QuerySet field lookups the filter translator maps (r15b). `in` and
# `isnull` are handled structurally; text lookups map to LIKE/ILIKE
# patterns (r16, VERDICT #2); anything else — relation traversals
# (workspace__slug), regex lookups, F expressions — is loud.
_DJANGO_LOOKUPS = {"exact": "=", "gt": ">", "gte": ">=", "lt": "<", "lte": "<="}
# lookup -> (SQL operator, pattern template around the LIKE-escaped
# literal). Django compiles the i-variants through UPPER/ILIKE; PG and
# ClickHouse both speak ILIKE natively.
_DJANGO_TEXT_LOOKUPS = {
    "contains": ("LIKE", "%{}%"),
    "icontains": ("ILIKE", "%{}%"),
    "startswith": ("LIKE", "{}%"),
    "istartswith": ("ILIKE", "{}%"),
    "endswith": ("LIKE", "%{}"),
    "iendswith": ("ILIKE", "%{}"),
    "iexact": ("ILIKE", "{}"),
}


def _django_literal_sql(v: str) -> str:
    """A Django filter VALUE literal → SQL literal; loud on anything
    dynamic (variables, attribute chains, f-strings)."""
    v = v.strip()
    m = re.fullmatch(r"'((?:[^'\\]|\\.)*)'|\"((?:[^\"\\]|\\.)*)\"", v)
    if m is not None:
        s = (m.group(1) if m.group(1) is not None else m.group(2))
        s = _unescape_literal(s, "Django")
        return "'" + s.replace("'", "''") + "'"
    if re.fullmatch(r"-?\d+(?:\.\d+)?", v):
        return v
    if v in ("True", "False"):
        return v.upper()
    raise ValueError(
        f"untranslatable Django filter value (literals only): {v!r}"
    )


def _django_filter_conds(
    args: str, allow_q: bool = True
) -> tuple[list[tuple[str, str | None, str]], set[str]]:
    """One ``.filter(...)``/``.exclude(...)`` argument list → SQL
    conditions (kwargs AND together, exactly Django) plus the set of
    referenced field names (the caller rejects annotate-alias
    references — Django compiles those into HAVING). Loud on
    positional args other than flat Q trees, relation traversals, and
    non-literal values. The splitter tracks quote state (r16, VERDICT
    nit #1) so a literal value containing a comma splits correctly."""
    conds: list[tuple[str, str | None, str, str]] = []
    fields: set[str] = set()
    items, depth, cur, quote = [], 0, [], None
    skip = False
    for ch in args:
        if quote:
            cur.append(ch)
            if skip:
                skip = False
            elif ch == "\\":
                skip = True
            elif ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
        elif ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        if ch == "," and depth == 0:
            items.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    items.append("".join(cur))
    for it in items:
        it = it.strip()
        if not it:
            continue
        m = re.fullmatch(r"([A-Za-z_]\w*)\s*=\s*(.+)", it, re.DOTALL)
        if m is None:
            if allow_q and re.match(r"[Q~(]", it):
                sql, guarded, flds = _django_q_sql(it)
                conds.append((sql, None, "q", guarded))
                fields |= flds
                continue
            raise ValueError(
                "untranslatable Django filter argument (Q trees "
                "of literal lookups translate; F expressions and "
                f"other positional args do not): {it[:60]!r}"
            )
        sql, field, lookup = _django_kwarg_cond(m.group(1), m.group(2).strip())
        # the guarded form is the leaf under an ODD number of
        # negations: Django's build_filter adds an IS NOT NULL guard
        # per negated non-isnull leaf, so NOT keeps NULL rows
        guarded = (
            sql if lookup == "isnull"
            else f"({sql} AND {field} IS NOT NULL)"
        )
        conds.append((sql, field, lookup, guarded))
        fields.add(field)
    if not conds:
        raise ValueError("empty Django filter call")
    return conds, fields


def _django_like_pattern(val: str, template: str) -> str:
    """A quoted Python string literal → SQL LIKE pattern literal:
    decode escapes, LIKE-escape the metacharacters (backslash escape —
    PG, ClickHouse, and Spark all default to it), drop into the
    lookup's template."""
    m = re.fullmatch(r"'((?:[^'\\]|\\.)*)'|\"((?:[^\"\\]|\\.)*)\"", val)
    if m is None:
        raise ValueError(
            f"text lookups need a quoted string literal: {val[:60]!r}"
        )
    s = _unescape_literal(
        m.group(1) if m.group(1) is not None else m.group(2), "Django"
    )
    s = (
        s.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
    )
    return "'" + template.format(s).replace("'", "''") + "'"


def _django_kwarg_cond(name: str, val: str) -> tuple[str, str, str]:
    """One ``field__lookup=value`` kwarg → ``(sql, field, lookup)``."""
    parts = name.split("__")
    field, lookup = parts[0], (parts[1] if len(parts) == 2 else "exact")
    if len(parts) > 2 or (
        len(parts) == 2
        and lookup not in _DJANGO_LOOKUPS
        and lookup not in _DJANGO_TEXT_LOOKUPS
        and lookup not in ("in", "isnull")
    ):
        raise ValueError(
            "untranslatable Django filter lookup (relation "
            "traversals and regex lookups need the model graph): "
            f"{name!r}"
        )
    if lookup == "isnull":
        if val not in ("True", "False"):
            raise ValueError(
                f"__isnull needs a literal True/False: {val!r}"
            )
        return (
            f"{field} IS NULL" if val == "True" else
            f"{field} IS NOT NULL",
            field,
            lookup,
        )
    if lookup == "in":
        lm = re.fullmatch(r"[\[(]\s*(.*?)\s*,?\s*[\])]", val, re.DOTALL)
        if lm is None:
            raise ValueError(
                f"__in needs a literal list/tuple: {val[:60]!r}"
            )
        lits = [
            _django_literal_sql(x)
            for x in re.split(r",(?=(?:[^']*'[^']*')*[^']*$)", lm.group(1))
            if x.strip()
        ]
        if not lits:
            raise ValueError("__in with an empty literal list")
        return f"{field} IN ({', '.join(lits)})", field, lookup
    if lookup in _DJANGO_TEXT_LOOKUPS:
        op, tpl = _DJANGO_TEXT_LOOKUPS[lookup]
        return (
            f"{field} {op} {_django_like_pattern(val, tpl)}",
            field,
            lookup,
        )
    return (
        f"{field} {_DJANGO_LOOKUPS[lookup]} {_django_literal_sql(val)}",
        field,
        lookup,
    )


def _django_q_sql(expr: str) -> tuple[str, str, set[str]]:
    """A positional Q expression → ``(sql, guarded_sql, fields)``
    (r16 flat trees; r17 VERDICT #3 upgrades the flat token scan to a
    real recursive-descent tree: ``~Q`` negation, parenthesized
    groups, and Q nested inside Q — ``Q(Q(a=1) | Q(b=2), c=3)`` —
    now translate). Python's precedence (``~`` over ``&`` over ``|``)
    maps onto SQL's (NOT over AND over OR). ``guarded_sql`` is the
    rendering for a context under one enclosing negation (Django's
    build_filter adds an IS NOT NULL guard to every leaf whose
    CUMULATIVE negation parity is odd, so negation keeps NULL rows);
    each nested ``~`` flips the parity for its subtree."""
    fields: set[str] = set()
    # node: ("leaf", sql, guarded) | ("qgroup", [nodes]) — a Q(...)
    # call's AND of items, parenthesized when composite (pinned
    # style) | ("and"|"or", [nodes]) | ("not", node)

    def skip_ws(p: int) -> int:
        while p < len(expr) and expr[p].isspace():
            p += 1
        return p

    def parse_or(p: int):
        node, p = parse_and(p)
        terms = [node]
        while True:
            p = skip_ws(p)
            if p < len(expr) and expr[p] == "|":
                nxt, p = parse_and(p + 1)
                terms.append(nxt)
            else:
                break
        return (terms[0] if len(terms) == 1 else ("or", terms)), p

    def parse_and(p: int):
        node, p = parse_unary(p)
        terms = [node]
        while True:
            p = skip_ws(p)
            if p < len(expr) and expr[p] == "&":
                nxt, p = parse_unary(p + 1)
                terms.append(nxt)
            else:
                break
        return (terms[0] if len(terms) == 1 else ("and", terms)), p

    def parse_unary(p: int):
        p = skip_ws(p)
        if p < len(expr) and expr[p] == "~":
            node, p = parse_unary(p + 1)
            return ("not", node), p
        return parse_primary(p)

    def parse_primary(p: int):
        p = skip_ws(p)
        if p < len(expr) and expr[p] == "(":
            node, p = parse_or(p + 1)
            p = skip_ws(p)
            if p >= len(expr) or expr[p] != ")":
                raise ValueError(
                    "unbalanced parentheses in Django Q expression: "
                    f"{expr[:80]!r}"
                )
            return node, p + 1
        qm = re.match(r"Q\s*\(", expr[p:])
        if qm is None:
            raise ValueError(
                "untranslatable Django Q expression (Q trees of "
                "literal lookups — |, &, ~, parens, nested Q — "
                "translate; F expressions and dynamic values do "
                f"not): {expr[p : p + 80]!r}"
            )
        open_idx = p + qm.end() - 1
        args = _balanced_args(expr, open_idx)
        conds, flds = _django_filter_conds(args, allow_q=True)
        fields.update(flds)
        items = [
            ("leaf", sql, guarded) for sql, _, _, guarded in conds
        ]
        node = items[0] if len(items) == 1 else ("qgroup", items)
        return node, open_idx + len(args) + 2

    def emit(node, parity: int) -> str:
        kind = node[0]
        if kind == "leaf":
            return node[2] if parity else node[1]
        if kind == "not":
            return f"NOT ({emit(node[1], parity ^ 1)})"
        parts = [emit(c, parity) for c in node[1]]
        if kind == "qgroup":
            joined = " AND ".join(parts)
            return f"({joined})" if len(parts) > 1 else joined
        if kind == "and":
            return " AND ".join(parts)
        return "(" + " OR ".join(parts) + ")"

    root, p = parse_or(0)
    p = skip_ws(p)
    if p != len(expr):
        raise ValueError(
            f"untranslatable token {expr[p]!r} in Django Q "
            f"expression: {expr[:80]!r}"
        )
    # pinned top-level style: a composite &-chain gains one outer
    # paren pair (an or/qgroup/not already carries its own)
    sql = emit(root, 0)
    guarded = emit(root, 1)
    if root[0] == "and":
        sql, guarded = f"({sql})", f"({guarded})"
    return sql, guarded, fields


def _balanced_args(code: str, open_idx: int) -> str:
    """``code[open_idx]`` is '('; return the argument text up to the
    matching ')'. Tracks nesting AND quote state (r17, VERDICT nit:
    a paren inside a string literal — ``.where('c','=','a)b')`` —
    must not close the group); a backslash inside a quote escapes
    the next character."""
    depth, i, quote, skip = 1, open_idx + 1, None, False
    while i < len(code) and depth:
        ch = code[i]
        if quote:
            if skip:
                skip = False
            elif ch == "\\":
                skip = True
            elif ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        i += 1
    return code[open_idx + 1 : i - 1]


def parse_django(
    code: str, model_tables: dict[str, str] | None = None
) -> str | None:
    """Django QuerySet aggregate chain → raw PG SQL with the
    ``${whereClause}`` splice point (r15, VERDICT #2 — the reference's
    external eval includes the plane app class,
    ``clone_test_oss_repos.sh:44-49``). Returns None when the code is
    not a ``Model.objects`` annotate/aggregate site; raises on sites it
    cannot translate faithfully — loud, never a guess.

    Supported: ``Model.objects[.all()][.filter(...)/.exclude(...)]
    [.values('a', 'b')].annotate(alias=Sum('col'), ...)`` (grouped
    rollup — ``.values`` before ``annotate`` IS Django's GROUP BY) and
    ``Model.objects.aggregate(alias=Sum('col'), ...)`` (one-row global
    aggregate), plus ``.order_by('-alias', 'col')``. Filter kwargs
    translate for literal values and the simple lookups (exact / gt /
    gte / lt / lte / in / isnull), the text lookups
    (``__icontains``-family → ILIKE/LIKE patterns, r16 VERDICT #2),
    and flat positional ``Q(a=1) | Q(b=2)`` trees of literal lookups
    (Python's ``&``-over-``|`` precedence maps 1:1 onto SQL's
    AND-over-OR). ``exclude`` wraps NOT with Django's per-leaf IS NOT
    NULL guards, so NULL rows stay in the result exactly like the
    QuerySet. With filters the splice point becomes the literal
    ``WHERE 1=1`` so the runtime DateFilter composes. The table comes
    from ``model_tables`` — the repo-visible binding collected by
    :func:`clickhouse_build_spark.scanner.collect_model_tables`
    (``Meta.db_table`` or Django's default ``<app>_<model>`` naming).

    A ``.filter()`` AFTER ``.annotate()`` — Django's HAVING (the
    dedup idiom ``.values('a').annotate(n=Count('id'))
    .filter(n__gt=1)``) — EMITS a real HAVING clause with each
    annotate alias expanded to its aggregate expression (PG forbids
    output aliases in HAVING); simple lookups on aliases or grouped
    columns only (r16, ADVICE r15).

    NOT supported (loud): an invisible model class (no binding to
    derive the table from), F expressions, ``~Q`` / nested Q /
    parenthesized Q groups / Q inside ``.exclude()`` (they need the
    real expression tree), ``.exclude()`` after ``.annotate()``
    (negated HAVING needs per-leaf NULL guards over aggregates),
    an annotate-alias reference BEFORE ``.annotate()`` (Django raises
    FieldError), relation-traversal or regex
    lookups (``workspace__slug`` — they need the model graph),
    non-literal filter values,
    ``.distinct/...`` (the kysely/knex never-silently-drop contract),
    ``annotate`` without ``values`` (a per-row annotation, not a
    rollup), ``Count('pk')`` (the concrete pk column needs model
    introspection), and any aggregate argument beyond a single quoted
    column name."""
    hm = re.search(r"\b([A-Z]\w*)\s*\.\s*objects\b", code)
    if hm is None or not re.search(r"\.\s*(?:annotate|aggregate)\s*\(", code):
        return None
    for mm in re.finditer(r"\.\s*(\w+)\s*\(", code):
        if mm.group(1) not in _DJANGO_METHODS:
            raise ValueError(
                f"untranslatable Django chain method .{mm.group(1)}(...)"
                " — emitting without it would silently change the "
                f"query (e.g. drop a filter): {code[:120]!r}"
            )
    model = hm.group(1)
    table = (model_tables or {}).get(model)
    if table is None:
        raise ValueError(
            "Django ORM site (QuerySet annotate/aggregate): model "
            f"{model!r} has no visible models.Model class in the "
            "scanned repo — declare Meta.db_table (or keep the model "
            "class with Django's default <app>_<model> naming) so the "
            "table can be derived; migrating this site needs that "
            f"binding: {code[:120]!r}"
        )
    filter_calls = [
        (fm_.start(), fm_.group(1), _balanced_args(code, fm_.end() - 1))
        for fm_ in re.finditer(r"\.\s*(filter|exclude)\s*\(", code)
    ]
    group_cols: list[str] = []
    vms = list(re.finditer(r"\.\s*values\s*\(", code))
    if len(vms) > 1:
        raise ValueError(
            f"multiple Django .values() calls are not translatable: "
            f"{code[:120]!r}"
        )
    if vms:
        for it in _balanced_args(code, vms[0].end() - 1).split(","):
            it = it.strip()
            if not it:
                continue
            q = re.fullmatch(r"['\"](\w+)['\"]", it)
            if q is None:
                raise ValueError(
                    f"untranslatable Django .values() item: {it!r}"
                )
            group_cols.append(q.group(1))
    sels: list[str] = []
    kinds: set[str] = set()
    for am in re.finditer(r"\.\s*(annotate|aggregate)\s*\(", code):
        kinds.add(am.group(1))
        args = _balanced_args(code, am.end() - 1)
        items, depth, cur = [], 0, []
        for ch in args:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                items.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        items.append("".join(cur))
        for it in items:
            it = it.strip()
            if not it:
                continue
            fm = re.fullmatch(
                r"(\w+)\s*=\s*(?:models\s*\.\s*)?"
                r"(Sum|Count|Avg|Min|Max)\(\s*['\"](\w+)['\"]\s*\)",
                it,
            )
            if fm is None or fm.group(3) == "pk":
                raise ValueError(
                    "untranslatable Django aggregate item (only "
                    "alias=Sum/Count/Avg/Min/Max('column') with a "
                    f"concrete column name is supported): {it!r}"
                )
            sels.append(
                f"{_DJANGO_FN[fm.group(2)]}({fm.group(3)}) AS {fm.group(1)}"
            )
    alias_expr = {
        s.rsplit(" AS ", 1)[1]: s.rsplit(" AS ", 1)[0] for s in sels
    }
    aliases = set(alias_expr)
    # ADVICE r15 (medium): Django compiles a .filter() placed AFTER
    # .annotate() into HAVING, not WHERE (the dedup idiom
    # .values('a').annotate(n=Count('id')).filter(n__gt=1)). r16
    # EMITS that as a real HAVING clause — PG forbids output aliases
    # in HAVING, so each alias expands to its aggregate expression.
    # .exclude() after .annotate() stays loud (Django's negation adds
    # per-leaf NULL guards whose aggregate-NULL semantics need the
    # model), as does referencing an alias BEFORE .annotate() (Django
    # itself raises FieldError there).
    ann_m = re.search(r"\.\s*annotate\s*\(", code)
    wheres: list[str] = []
    havings: list[str] = []
    for fpos, fkind, fargs in filter_calls:
        if ann_m is not None and fpos > ann_m.start():
            if fkind == "exclude":
                raise ValueError(
                    "Django .exclude() after .annotate() compiles to "
                    "a negated HAVING with per-leaf NULL guards — "
                    f"not translatable: {code[:120]!r}"
                )
            conds, _flds = _django_filter_conds(fargs)
            for sql_c, f, lk, _g in conds:
                if f is None or lk in _DJANGO_TEXT_LOOKUPS:
                    raise ValueError(
                        "Django HAVING filter translates simple "
                        "lookups on annotate aliases or grouped "
                        f"columns only: {fargs[:60]!r}"
                    )
                if f in aliases:
                    sql_c = re.sub(
                        rf"^{re.escape(f)}\b",
                        alias_expr[f].replace("\\", "\\\\"),
                        sql_c,
                    )
                    havings.append(sql_c)
                elif f in group_cols:
                    # Django's split_having keeps plain grouped-column
                    # predicates in WHERE — equivalent results either
                    # way, but WHERE filters before the aggregate and
                    # matches Django's own compilation (ADVICE r16)
                    wheres.append(sql_c)
                else:
                    raise ValueError(
                        "Django filter after .annotate() references "
                        f"{f!r}, which is neither an annotate alias "
                        f"nor a grouped column: {code[:120]!r}"
                    )
            continue
        conds, flds = _django_filter_conds(fargs)
        hit = flds & aliases
        if hit:
            raise ValueError(
                "Django filter condition references annotate "
                f"alias(es) {sorted(hit)} before .annotate() — Django "
                f"raises FieldError on this chain: {code[:120]!r}"
            )
        if fkind == "exclude":
            # Django's negated filters add an IS NOT NULL guard per
            # non-isnull leaf (sql/query.py build_filter), so
            # .exclude(category='x') KEEPS NULL rows — plain SQL
            # NOT(category='x') would drop them (r16, VERDICT nit #2).
            # Q items carry their odd-parity rendering (r17 — the Q
            # tree computes per-leaf guards through nested ~).
            wheres.append(
                f"NOT ({' AND '.join(g for _, _, _, g in conds)})"
            )
        else:
            wheres.extend(sql_c for sql_c, _, _, _ in conds)
    # With translated filters the splice point becomes the literal
    # 'WHERE 1=1' (the strategy rewrites it), so the conditions and
    # the runtime DateFilter compose: WHERE 1=1 AND <conds> AND date…
    where_sql = (
        "WHERE 1=1 AND " + " AND ".join(wheres)
        if wheres
        else "${whereClause}"
    )
    order: list[str] = []
    for om in re.finditer(r"\.\s*order_by\s*\(", code):
        for it in _balanced_args(code, om.end() - 1).split(","):
            it = it.strip()
            if not it:
                continue
            q = re.fullmatch(r"['\"](-?)(\w+)['\"]", it)
            if q is None or (
                q.group(2) not in aliases and q.group(2) not in group_cols
            ):
                raise ValueError(
                    "untranslatable Django order_by item (must name a "
                    f"grouped column or an aggregate alias): {it!r}"
                )
            order.append(f"{q.group(2)} {'DESC' if q.group(1) else 'ASC'}")
    if kinds == {"aggregate"}:
        if group_cols or order:
            raise ValueError(
                "Django .aggregate() is a one-row terminal — combining "
                f"it with .values()/.order_by() is not translatable: "
                f"{code[:120]!r}"
            )
        return f"SELECT {', '.join(sels)} FROM {table} {where_sql}"
    if kinds != {"annotate"}:
        raise ValueError(
            "mixed Django annotate/aggregate chain is not translatable: "
            f"{code[:120]!r}"
        )
    if not group_cols:
        raise ValueError(
            "Django .annotate() without a preceding .values() grouping "
            "is a per-row annotation, not an aggregate rollup — not "
            f"translatable: {code[:120]!r}"
        )
    sql = (
        f"SELECT {', '.join(group_cols + sels)} FROM {table}"
        f" {where_sql}"
        f" GROUP BY {', '.join(group_cols)}"
    )
    if havings:
        sql += f" HAVING {' AND '.join(havings)}"
    if order:
        sql += f" ORDER BY {', '.join(order)}"
    return sql


_DRIZZLE_CMP = {
    "eq": "=", "ne": "!=", "gt": ">", "gte": ">=", "lt": "<", "lte": "<=",
}


def _drizzle_cond_sql(expr: str, table_obj: str) -> str:
    """A drizzle condition expression — ``eq(expenses.category,
    'Food')``, ``and(...)``/``or(...)`` combinators, ``isNull``/
    ``isNotNull``, ``inArray`` — → SQL (r16: these were previously
    DROPPED silently, the one never-silently-drop hole in the spec
    parsers). Loud on sql`` templates, cross-object references, and
    non-literal values."""
    expr = expr.strip()
    m = re.fullmatch(
        r"(eq|ne|gt|gte|lt|lte)\(\s*(\w+)\.(\w+)\s*,\s*(.+)\)",
        expr,
        re.DOTALL,
    )
    if m:
        if m.group(2) != table_obj:
            raise ValueError(
                f"drizzle where references {m.group(2)!r}, not the "
                f".from({table_obj}) object: {expr[:80]!r}"
            )
        return (
            f"{m.group(3)} {_DRIZZLE_CMP[m.group(1)]} "
            f"{_js_literal_sql(m.group(4))}"
        )
    m = re.fullmatch(r"(and|or)\((.*)\)", expr, re.DOTALL)
    if m:
        parts = [
            _drizzle_cond_sql(p, table_obj)
            for p in _split_top_commas(m.group(2))
            if p.strip()
        ]
        if not parts:
            raise ValueError(f"empty drizzle {m.group(1)}(): {expr[:80]!r}")
        joined = (" AND " if m.group(1) == "and" else " OR ").join(parts)
        return f"({joined})" if len(parts) > 1 else parts[0]
    m = re.fullmatch(r"(isNull|isNotNull)\(\s*(\w+)\.(\w+)\s*\)", expr)
    if m:
        if m.group(2) != table_obj:
            raise ValueError(
                f"drizzle where references {m.group(2)!r}, not the "
                f".from({table_obj}) object: {expr[:80]!r}"
            )
        return (
            f"{m.group(3)} IS NULL" if m.group(1) == "isNull"
            else f"{m.group(3)} IS NOT NULL"
        )
    m = re.fullmatch(
        r"inArray\(\s*(\w+)\.(\w+)\s*,\s*(\[.*\])\s*\)", expr, re.DOTALL
    )
    if m:
        if m.group(1) != table_obj:
            raise ValueError(
                f"drizzle where references {m.group(1)!r}, not the "
                f".from({table_obj}) object: {expr[:80]!r}"
            )
        return (
            f"{m.group(2)} IN "
            f"({_js_array_literal_sql(m.group(3), 'drizzle')})"
        )
    raise ValueError(
        "untranslatable drizzle where expression (literal eq/ne/gt/"
        "gte/lt/lte, and/or, isNull/isNotNull, inArray only — sql`` "
        f"templates and dynamic values stay runtime concerns): "
        f"{expr[:80]!r}"
    )


def parse_drizzle(code: str) -> dict | None:
    """``db.select({...}).from(expenses)...`` → canonical spec."""
    m = re.search(r"db\s*\.\s*select\(\{", code)
    if not m or ".from(" not in code:
        return None
    # A builder ASSIGNED without `await` is a deferred/partial chain —
    # the grouping/filtering may be applied by a helper elsewhere (the
    # hostile-fixture split-chain shape). Emitting the visible ungrouped
    # arm would silently drop that grouping; refuse instead (r13 — the
    # chain walk-back made these blocks syntactically parseable).
    if _builder_deferred(code, m.start()):
        raise ValueError(
            "deferred drizzle builder (assigned without await) — the "
            "chain may be completed elsewhere; scanned block cannot be "
            f"emitted faithfully: {code[:120]!r}"
        )
    # brace-depth scan: `${expenses.col}` interpolations nest braces
    depth, i = 1, m.end()
    while i < len(code) and depth:
        if code[i] == "{":
            depth += 1
        elif code[i] == "}":
            depth -= 1
        i += 1
    fields = []
    body = code[m.end() : i - 1]
    item_pat = re.compile(
        r"(\w+):\s*(count\(\)"
        r"|sum\(expenses\.(\w+)\)"
        r"|sql(?:<[^>]*>)?`([^`]*)`"
        r"|expenses\.(\w+))",
        re.DOTALL,
    )
    exprs: dict[str, str] = {}  # normalized source expr -> alias
    for im in item_pat.finditer(body):
        alias, kind = im.group(1), im.group(2)
        if kind == "count()":
            fields.append((alias, "COUNT(*)", "COUNT(*)", "number"))
            exprs["count()"] = alias
        elif im.group(3):
            col = im.group(3)
            fields.append(
                (alias, f"sum(toFloat64({col}))", f"SUM({col})", "number")
            )
            exprs[f"sum(expenses.{col})"] = alias
        elif im.group(4) is not None:
            raw = _drizzle_raw(im.group(4))
            fields.append(
                (alias, pg_sql_to_ch(raw), raw, _field_type(raw, alias))
            )
            exprs[re.sub(r"\s+", "", im.group(4))] = alias
        else:
            col = im.group(5)
            fields.append((alias, col, col, _field_type(col, alias)))
            exprs[f"expenses.{col}"] = alias

    def to_alias(ref: str) -> str | None:
        ref = ref.strip()
        sm = re.fullmatch(r"sql(?:<[^>]*>)?`([^`]*)`", ref, re.DOTALL)
        if sm:
            return exprs.get(re.sub(r"\s+", "", sm.group(1)))
        return exprs.get(re.sub(r"\s+", "", ref))

    group = None
    gm = re.search(r"\.groupBy\(\s*(.*?)\s*\)\s*[.;]", code, re.DOTALL)
    if gm:
        group = to_alias(
            gm.group(1) if gm.group(1).startswith("sql")
            else gm.group(1)
        )
        if group is None:
            raise ValueError(
                f"drizzle groupBy target not in the select list: {gm.group(1)!r}"
            )
    order = None
    om = re.search(r"\.orderBy\(\s*(desc\()?\s*(.*?)\s*\)?\s*\)\s*[.;]", code, re.DOTALL)
    if om:
        direction = "DESC" if om.group(1) else "ASC"
        target = to_alias(om.group(2))
        if target is None:
            raise ValueError(
                f"drizzle orderBy target not in the select list: {om.group(2)!r}"
            )
        order = (target, direction)
    lm = re.search(r"\.limit\((\d+)\)", code)
    # .where(...) conditions (r16): previously these never parsed AND
    # never refused — the silent-drop hole. Two shapes are the golden
    # corpus's own runtime DateFilter (route.ts builds whereCondition
    # from the date params and the emitted strategy re-injects it
    # through the splice): a BARE IDENTIFIER and the
    # `conds.length > 0 ? and(...conds) : undefined` ternary — those
    # map to ${whereClause}, not a drop. Literal condition
    # expressions translate into the WHERE arm; anything else raises.
    fobj = re.search(r"\.from\(\s*(\w+)\s*\)", code)
    table_obj = fobj.group(1) if fobj else None
    _TERNARY = (
        r"(\w+)\.length\s*>\s*0\s*\?\s*and\(\s*\.\.\.\1\s*\)"
        r"\s*:\s*undefined"
    )
    wheres = []
    for wm_ in re.finditer(r"\.\s*where\s*\(", code):
        body = _balanced_args(code, wm_.end() - 1).strip()
        if re.fullmatch(_TERNARY, body):
            continue  # the corpus's runtime DateFilter ternary
        im_ = re.fullmatch(r"\w+", body)
        if im_:
            # a bare identifier is NOT blindly the DateFilter splice
            # (ADVICE r16, medium: `const onlyFood = eq(...); .where(
            # onlyFood)` was silently replaced by the splice). Only
            # the corpus's documented runtime-DateFilter name keeps
            # the splice; any other identifier must have a visible
            # initializer this parser can translate, else it raises.
            init_m = re.search(
                rf"(?:const|let|var)\s+{re.escape(body)}\s*=\s*"
                r"([^;\n]+)",
                code,
            )
            if body == "whereCondition":
                continue  # route.ts's runtime DateFilter binding
            if init_m is None:
                raise ValueError(
                    f"drizzle .where({body}) references an "
                    "identifier with no visible initializer — cannot "
                    "verify it is the runtime DateFilter; refusing "
                    f"rather than splicing silently: {code[:120]!r}"
                )
            init = init_m.group(1).strip()
            if init == "undefined" or re.fullmatch(_TERNARY, init):
                continue  # DateFilter build → splice
            body = init  # fall through: translate the initializer
        if table_obj is None:
            raise ValueError(
                "drizzle .where conditions present but no "
                ".from(<obj>) binding was found — cannot validate "
                "the condition's table references against a guessed "
                f"name: {code[:120]!r}"
            )
        wheres.append(_drizzle_cond_sql(body, table_obj))
    return {
        "fields": fields,
        "group": group,
        "order": order,
        "limit": int(lm.group(1)) if lm else None,
        "wheres": wheres,
        "orm": "drizzle",
    }


def parse_prisma(code: str) -> dict | None:
    """``prisma.<model>.aggregate({...})`` / ``groupBy({...})`` →
    canonical spec (aliases follow the golden corpus: _count → count,
    _sum.X → total)."""
    m = re.search(r"prisma\.\w+\.(aggregate|groupBy)\(\{(.*)\}\s*\)", code, re.DOTALL)
    if not m:
        return None
    kind, body = m.group(1), m.group(2)
    fields = []
    group = None
    bym = re.search(r"by:\s*\[\s*'(\w+)'\s*\]", body)
    if kind == "groupBy":
        if not bym:
            raise ValueError("prisma groupBy without a by: column")
        col = bym.group(1)
        fields.append((col, col, col, _field_type(col, col)))
        group = col
    if re.search(r"_count:", body):
        fields.append(("count", "COUNT(*)", "COUNT(*)", "number"))
    sm = re.search(r"_sum:\s*\{\s*(\w+):\s*true\s*\}", body)
    if sm:
        fields.append(
            ("total", f"sum({sm.group(1)})", f"SUM({sm.group(1)})", "number")
        )
    order = None
    om = re.search(
        r"orderBy:\s*\{\s*_sum:\s*\{\s*(\w+):\s*'(asc|desc)'", body
    )
    if om:
        order = ("total", om.group(2).upper())
    else:
        om2 = re.search(r"orderBy:\s*\{\s*(\w+):\s*'(asc|desc)'", body)
        if om2:
            order = (om2.group(1), om2.group(2).upper())
    tm = re.search(r"take:\s*(\d+)", body)
    return {
        "fields": fields,
        "group": group,
        "order": order,
        "limit": int(tm.group(1)) if tm else None,
        "orm": "prisma",
        "prisma_kind": kind,
        "prisma_sumcol": sm.group(1) if sm else "",
    }


def _spec_sql(spec: dict, table: str, dialect: str) -> str:
    """Canonical spec → one SQL string (index 1 = CH expr, 2 = PG)."""
    i = 1 if dialect == "ch" else 2
    sels = ", ".join(
        f"{f[i]} as {f[0]}" if f[i] != f[0] else f[0]
        for f in spec["fields"]
    )
    sql = f"SELECT {sels} FROM {table} " + _where_arm(
        spec.get("wheres") or []
    )
    if spec["group"]:
        sql += f" GROUP BY {spec['group']}"
    if spec["order"]:
        sql += f" ORDER BY {spec['order'][0]} {spec['order'][1]}"
    if spec["limit"]:
        sql += f" LIMIT {spec['limit']}"
    return sql


_NUMERIC_ALIASES = frozenset(
    {"count", "total", "n", "sum", "avg", "amount", "value"}
)


def _select_items(sql: str) -> list[tuple[str, str]]:
    """[(expr, alias)] from the top-level select list."""
    m = re.search(r"\bSELECT\b(.*?)\bFROM\b", sql, re.IGNORECASE | re.DOTALL)
    if not m:
        raise ValueError(f"no SELECT ... FROM in scanned SQL: {sql!r}")
    items, depth, cur = [], 0, []
    for ch in m.group(1):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            items.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    items.append("".join(cur))
    out = []
    for it in items:
        it = it.strip()
        am = re.search(r"\bAS\s+(\w+)\s*$", it, re.IGNORECASE)
        if am:
            out.append((it[: am.start()].strip(), am.group(1)))
        elif re.fullmatch(r"\w+", it):
            out.append((it, it))
        elif it == "*":
            out.append(("*", "*"))
        else:
            raise ValueError(f"select item needs an alias: {it!r}")
    return out


def _field_type(expr: str, alias: str) -> str:
    if alias.lower() in _NUMERIC_ALIASES or re.match(
        r"(?i)\s*(COUNT|SUM|AVG|MIN|MAX)\s*\(", expr
    ):
        return "number"
    if alias.lower() in ("month", "date", "day", "week"):
        return "string"
    if re.search(r"(?i)COALESCE|empty\(", expr):
        return "string"
    return "string | null"


def _method_name(sql: str, taken: set[str]) -> str:
    gm = re.search(r"\bGROUP\s+BY\s+([^\s,]+)", sql, re.IGNORECASE)
    if gm is None:
        base = "getTotalStats"
    else:
        key = gm.group(1)
        if re.search(r"(?i)DATE_TRUNC\(\s*'month'", key):
            base = "getMonthlyStats"
        else:
            col = re.sub(r"\W", "", key.split(".")[-1])
            if col.lower() == "date":
                base = "getDailyStats"
            elif col.lower() == "month":
                base = "getMonthlyStats"
            else:
                base = f"get{col[:1].upper()}{col[1:]}Stats"
    name, i = base, 2
    while name in taken:
        name, i = f"{base}{i}", i + 1
    taken.add(name)
    return name


def build_method_specs(
    queries: list[dict],
    table: str = "expenses",
    repo_path: str | None = None,
    model_tables: dict[str, str] | None = None,
) -> list[MethodSpec]:
    """``repo_path``/``model_tables`` (r15): the repo-visible ORM
    class→table bindings from
    :func:`clickhouse_build_spark.scanner.collect_model_tables`. With
    them, Django QuerySet aggregates and repository-scoped TypeORM
    builders EMIT; without them those sites keep their documented loud
    refusals."""
    if model_tables is None and repo_path is not None:
        from clickhouse_build_spark.scanner import collect_model_tables

        model_tables = collect_model_tables(repo_path)
    taken: set[str] = set()
    specs = []
    for q in queries:
        code = q["code"]
        sql = extract_sql(code)
        spec = None
        builder_orm = None
        if sql is None or "${" in sql.replace("${whereClause}", ""):
            # kysely/knex chains derive a raw PG SQL (r13) and flow
            # through the same raw machinery as a scanned literal
            ksql = parse_kysely(code)
            if ksql is not None:
                sql, builder_orm = ksql, "kysely"
            else:
                ksql = parse_knex(code)
                if ksql is not None:
                    sql, builder_orm = ksql, "knex"
                else:
                    hint = None
                    if ".from(" not in code:
                        hint = _resolve_typeorm_entity(
                            code, q.get("location", ""), repo_path,
                            model_tables,
                        )
                    ksql = parse_typeorm(code, table_hint=hint)
                    if ksql is not None:
                        sql, builder_orm = ksql, "typeorm"
                    else:
                        ksql = parse_django(code, model_tables)
                        if ksql is not None:
                            sql, builder_orm = ksql, "django"
            if builder_orm is None:
                spec = parse_drizzle(code) or parse_prisma(code)
                if spec is None:
                    if sql is not None:
                        _check_interpolations(sql)  # raises with the culprit
                    # Found-or-loud for the two app classes whose ORM
                    # emission is documented as unsupported (r14,
                    # VERDICT #4): the scanner REPORTS the site; the
                    # emitter names why it cannot derive SQL instead
                    # of a generic refusal.
                    if re.search(
                        r"\.\s*annotate\s*\(|\.objects\b", code
                    ):
                        raise ValueError(
                            "Django ORM site (QuerySet "
                            "annotate/aggregate): the model's db_table "
                            "is not visible in the scanned chain — "
                            "emission is not supported, migrate this "
                            f"site by hand: {code[:120]!r}"
                        )
                    if re.search(
                        r"\.\s*(?:sum|average|maximum|minimum)\s*\("
                        r"\s*['\"]",
                        code,
                    ):
                        raise ValueError(
                            "typeorm repository aggregate (.sum/"
                            ".average/...): the entity's table name is "
                            "not visible in the scanned call — "
                            f"emission is not supported: {code[:120]!r}"
                        )
                    raise ValueError(
                        "scanned analytical query is neither raw SQL nor a "
                        f"supported ORM call: {code[:120]!r}"
                    )
                sql = None
        if spec is not None:
            pg_sql = _spec_sql(spec, table, "pg")
            ch_sql = _spec_sql(spec, table, "ch")
            fields = [(f[0], f[3]) for f in spec["fields"]]
            orm = spec["orm"]
            orm_call = re.sub(
                r"^(//[^\n]*\n\s*)?const\s+\w+\s*=\s*await\s+", "", code.strip()
            ).rstrip(";\n ")
            name = _method_name(pg_sql.replace("${whereClause}", ""), taken)
        else:
            # a raw query needs a DateFilter splice point: either the
            # ${whereClause} interpolation or the literal 'WHERE 1=1'
            # that the emitted strategy rewrites at runtime. Without
            # one, the emitted method would silently IGNORE the filter
            # on the CH arm and over-bind parameters on the PG arm
            # (ADVICE r10) — fail at emit time instead.
            if "${whereClause}" not in sql and "WHERE 1=1" not in sql:
                raise ValueError(
                    "raw analytical query has no DateFilter splice point "
                    "(${whereClause} or 'WHERE 1=1'): "
                    f"{sql[:120]!r}"
                )
            pg_sql, ch_sql = sql, pg_sql_to_ch(sql)
            orm = builder_orm or "none"
            orm_call = (
                re.sub(
                    r"^(//[^\n]*\n\s*)?(?:const\s+\w+\s*=\s*)?(?:await\s+)?"
                    r"(?:return\s+)?",
                    "",
                    code.strip(),
                ).rstrip(";\n ")
                if builder_orm
                else ""
            )
            fields = []
            for expr, alias in _select_items(sql):
                if alias == "*":
                    fields = [
                        ("row", "Record<string, string | number | null>")
                    ]
                    break
                fields.append((alias, _field_type(expr, alias)))
            name = _method_name(sql, taken)
        specs.append(
            MethodSpec(
                name=name,
                result_iface=name[3:] + "Row",
                pg_sql=pg_sql,
                ch_sql=ch_sql,
                fields=fields,
                location=q.get("location", ""),
                query_type=q.get("description", ""),
                orm=orm,
                orm_call=orm_call,
                prisma_kind=(spec or {}).get("prisma_kind", ""),
                prisma_sumcol=(spec or {}).get("prisma_sumcol", ""),
                group_col=(spec or {}).get("group") or "",
            )
        )
    return specs


# ------------------------------------------------------- file templates


def _emit_client() -> str:
    return """import { createClient, ClickHouseClient } from '@clickhouse/client';

let clickhouseClient: ClickHouseClient | null = null;

export function getClickHouseClient(): ClickHouseClient {
  if (!clickhouseClient) {
    clickhouseClient = createClient({
      url: process.env.CLICKHOUSE_URL || 'http://localhost:8123',
      username: process.env.CLICKHOUSE_USER || 'default',
      password: process.env.CLICKHOUSE_PASSWORD || '',
      database: process.env.CLICKHOUSE_DATABASE || 'default',
    });
  }
  return clickhouseClient;
}

export async function executeClickHouseQuery<T>(
  query: string,
  params: Record<string, string> = {}
): Promise<T[]> {
  const client = getClickHouseClient();
  const result = await client.query({
    query,
    query_params: params,
    format: 'JSONEachRow',
  });
  const data = await result.json<T[]>();
  return Array.isArray(data) ? data : [];
}
"""


def _emit_types(specs: list[MethodSpec]) -> str:
    parts = ["// Generated typed interfaces for the migrated query layer\n"]
    for s in specs:
        parts.append(f"export interface {s.result_iface} {{")
        for fname, ftype in s.fields:
            parts.append(f"  {fname}: {ftype};")
        parts.append("}\n")
    parts.append("export interface DateFilter {")
    parts.append("  startDate?: string;")
    parts.append("  endDate?: string;")
    parts.append("}\n")
    parts.append("export interface DatabaseStrategy {")
    for s in specs:
        parts.append(
            f"  {s.name}(filter: DateFilter): Promise<{s.result_iface}[]>;"
        )
    parts.append("}")
    return "\n".join(parts) + "\n"


def _ifaces_import(specs: list[MethodSpec]) -> str:
    names = ", ".join(
        ["DatabaseStrategy", "DateFilter"] + [s.result_iface for s in specs]
    )
    return f"import {{ {names} }} from '../types';"


def _emit_ch_strategy(specs: list[MethodSpec]) -> str:
    parts = [
        "import { executeClickHouseQuery } from '../clickhouse';",
        _ifaces_import(specs),
        "",
        "export class ClickHouseStrategy implements DatabaseStrategy {",
        "  private buildWhereClause(filter: DateFilter): { whereClause: string; params: Record<string, string> } {",
        "    let whereClause = 'WHERE 1=1';",
        "    const params: Record<string, string> = {};",
        "    if (filter.startDate) {",
        "      whereClause += ' AND date >= {start_date:String}';",
        "      params.start_date = filter.startDate;",
        "    }",
        "    if (filter.endDate) {",
        "      whereClause += ' AND date <= {end_date:String}';",
        "      params.end_date = filter.endDate;",
        "    }",
        "    return { whereClause, params };",
        "  }",
        "",
    ]
    for s in specs:
        if "${whereClause}" in s.ch_sql:
            q_line = f"    const query = `{s.ch_sql}`;"
        else:
            # scanned text carried a literal base WHERE (the prisma
            # app's string-built monthly query) — splice at runtime
            q_line = (
                f"    const query = `{s.ch_sql}`"
                ".replace('WHERE 1=1', whereClause);"
            )
        parts += [
            f"  async {s.name}(filter: DateFilter): Promise<{s.result_iface}[]> {{",
            "    const { whereClause, params } = this.buildWhereClause(filter);",
            q_line,
            f"    return executeClickHouseQuery<{s.result_iface}>(query, params);",
            "  }",
            "",
        ]
    parts.append("}")
    return "\n".join(parts) + "\n"


def _emit_pg_strategy(specs: list[MethodSpec], orm: str = "none") -> str:
    if orm == "drizzle":
        return _emit_pg_strategy_drizzle(specs)
    if orm == "prisma":
        return _emit_pg_strategy_prisma(specs)
    parts = [
        "import { Pool } from 'pg';",
        _ifaces_import(specs),
        "",
        "export class PostgreSQLStrategy implements DatabaseStrategy {",
        "  constructor(private pool: Pool) {}",
        "",
        "  private buildWhereClause(filter: DateFilter): { whereClause: string; params: string[] } {",
        "    let whereClause = 'WHERE 1=1';",
        "    const params: string[] = [];",
        "    if (filter.startDate) {",
        "      params.push(filter.startDate);",
        "      whereClause += ` AND date >= $${params.length}`;",
        "    }",
        "    if (filter.endDate) {",
        "      params.push(filter.endDate);",
        "      whereClause += ` AND date <= $${params.length}`;",
        "    }",
        "    return { whereClause, params };",
        "  }",
        "",
    ]
    for s in specs:
        parts += [
            f"  async {s.name}(filter: DateFilter): Promise<{s.result_iface}[]> {{",
            "    const { whereClause, params } = this.buildWhereClause(filter);",
            # the scanned PG text, verbatim — never rewritten
            f"    const result = await this.pool.query(`{s.pg_sql}`, params);",
            f"    return result.rows as {s.result_iface}[];",
            "  }",
            "",
        ]
    parts.append("}")
    return "\n".join(parts) + "\n"


def _indent_call(call: str, pad: str = "      ") -> str:
    return "\n".join(
        pad + line.strip() for line in call.splitlines() if line.strip()
    )


def _emit_pg_strategy_drizzle(specs: list[MethodSpec]) -> str:
    """PG arm for a drizzle app: the scanned builder calls VERBATIM
    (never rewrite the postgres side), re-homed onto the injected db
    handle — the golden corpus's PostgreSQLStrategy shape
    (``corpus/orm_drizzleorm.txt:583-650``)."""
    parts = [
        "import { and, count, desc, gte, lte, sql, sum } from 'drizzle-orm';",
        "import { NodePgDatabase } from 'drizzle-orm/node-postgres';",
        "// adjust the schema import to the app's drizzle schema module",
        "import { expenses } from '../db/schema';",
        _ifaces_import(specs),
        "",
        "export class PostgreSQLStrategy implements DatabaseStrategy {",
        "  constructor(private db: NodePgDatabase<{ expenses: typeof expenses }>) {}",
        "",
        "  private buildWhereCondition(filter: DateFilter) {",
        "    const conditions = [];",
        "    if (filter.startDate) {",
        "      conditions.push(gte(expenses.date, filter.startDate));",
        "    }",
        "    if (filter.endDate) {",
        "      conditions.push(lte(expenses.date, filter.endDate));",
        "    }",
        "    return conditions.length > 0 ? and(...conditions) : undefined;",
        "  }",
        "",
    ]
    for s in specs:
        call = s.orm_call.replace("db.", "this.db.", 1)
        # golden-style field mapping: drizzle count() is number, sum()
        # is string|null — normalize numerics with Number()
        mapping = ", ".join(
            f"{a}: Number(row.{a} ?? 0)" if t == "number" else f"{a}: row.{a}"
            for a, t in s.fields
        )
        parts += [
            f"  async {s.name}(filter: DateFilter): Promise<{s.result_iface}[]> {{",
            "    const whereCondition = this.buildWhereCondition(filter);",
            "    const result = await " + _indent_call(call).lstrip() + ";",
            f"    return result.map(row => ({{ {mapping} }}));",
            "  }",
            "",
        ]
    parts.append("}")
    return "\n".join(parts) + "\n"


def _emit_pg_strategy_prisma(specs: list[MethodSpec]) -> str:
    """PG arm for a prisma app: aggregate/groupBy calls verbatim on the
    injected client; raw-SQL sites (prisma cannot express DATE_TRUNC)
    run through ``$queryRawUnsafe`` exactly as the golden corpus does
    (``corpus/orm_prismaorm.txt:533``)."""
    parts = [
        "import { PrismaClient } from '@prisma/client';",
        _ifaces_import(specs),
        "",
        "export class PostgreSQLStrategy implements DatabaseStrategy {",
        "  constructor(private prisma: PrismaClient) {}",
        "",
        "  private buildPrismaWhere(filter: DateFilter): { date?: { gte?: string; lte?: string } } {",
        "    const date: { gte?: string; lte?: string } = {};",
        "    if (filter.startDate) {",
        "      date.gte = filter.startDate;",
        "    }",
        "    if (filter.endDate) {",
        "      date.lte = filter.endDate;",
        "    }",
        "    return Object.keys(date).length > 0 ? { date } : {};",
        "  }",
        "",
    ]
    for s in specs:
        if s.orm == "prisma":
            call = s.orm_call.replace("prisma.", "this.prisma.", 1)

            def fld(a: str, t: str) -> str:
                # golden mapping: _count.id -> count, _sum.<col> -> total
                if a == "count":
                    return f"{a}: row._count.id"
                if a == "total" and s.prisma_sumcol:
                    return (
                        f"{a}: row._sum.{s.prisma_sumcol} ? "
                        f"Number(row._sum.{s.prisma_sumcol}) : 0"
                    )
                return f"{a}: row.{a}"

            mapping = ", ".join(fld(a, t) for a, t in s.fields)
            if s.prisma_kind == "aggregate":
                body = [
                    "    const result = await "
                    + _indent_call(call).lstrip()
                    + ";",
                    f"    return [result].map(row => ({{ {mapping} }}));",
                ]
            else:
                body = [
                    "    const result = await "
                    + _indent_call(call).lstrip()
                    + ";",
                    f"    return result.map(row => ({{ {mapping} }}));",
                ]
            parts += [
                f"  async {s.name}(filter: DateFilter): Promise<{s.result_iface}[]> {{",
                "    const where = this.buildPrismaWhere(filter);",
                *body,
                "  }",
                "",
            ]
        else:  # raw-SQL site inside a prisma app
            parts += [
                f"  async {s.name}(filter: DateFilter): Promise<{s.result_iface}[]> {{",
                "    const params: string[] = [];",
                "    let whereClause = 'WHERE 1=1';",
                "    if (filter.startDate) {",
                "      params.push(filter.startDate);",
                "      whereClause += ` AND date >= $${params.length}`;",
                "    }",
                "    if (filter.endDate) {",
                "      params.push(filter.endDate);",
                "      whereClause += ` AND date <= $${params.length}`;",
                "    }",
                # the scanned app builds the filter dynamically; restore
                # that by splicing the built clause over the base WHERE
                f"    const query = `{s.pg_sql}`.replace('WHERE 1=1', whereClause);",
                f"    return this.prisma.$queryRawUnsafe<{s.result_iface}[]>(query, ...params);",
                "  }",
                "",
            ]
    parts.append("}")
    return "\n".join(parts) + "\n"


def _emit_factory(specs: list[MethodSpec], orm: str = "none") -> str:
    if orm == "drizzle":
        pg_imports = (
            "import { Pool } from 'pg';\n"
            "import { drizzle } from 'drizzle-orm/node-postgres';\n"
            "// adjust the schema import to the app's drizzle schema module\n"
            "import { expenses } from '../db/schema';"
        )
        pg_handle = (
            "const pgPool = new Pool({\n"
            "  host: process.env.DB_HOST || 'localhost',\n"
            "  database: process.env.DB_NAME || 'app_db',\n"
            "  user: process.env.DB_USER || 'postgres',\n"
            "  password: process.env.DB_PASSWORD || '',\n"
            "  port: parseInt(process.env.DB_PORT || '5432', 10),\n"
            "});\n"
            "const db = drizzle(pgPool, { schema: { expenses } });"
        )
        pg_ctor = "new PostgreSQLStrategy(db)"
    elif orm == "prisma":
        pg_imports = "import { PrismaClient } from '@prisma/client';"
        pg_handle = "const pgPool = new PrismaClient();"
        pg_ctor = "new PostgreSQLStrategy(pgPool)"
    else:
        pg_imports = "import { Pool } from 'pg';"
        pg_handle = (
            "const pgPool = new Pool({\n"
            "  host: process.env.DB_HOST || 'localhost',\n"
            "  database: process.env.DB_NAME || 'app_db',\n"
            "  user: process.env.DB_USER || 'postgres',\n"
            "  password: process.env.DB_PASSWORD || '',\n"
            "  port: parseInt(process.env.DB_PORT || '5432', 10),\n"
            "});"
        )
        pg_ctor = "new PostgreSQLStrategy(pgPool)"
    return f"""{pg_imports}
import {{ DatabaseStrategy }} from './types';
import {{ ClickHouseStrategy }} from './strategies/clickhouse';
import {{ PostgreSQLStrategy }} from './strategies/postgres';

{pg_handle}

// Strategy pattern for OLAP reads: PostgreSQL stays the default;
// USE_CLICKHOUSE=true (env or .env) flips analytical queries over.
export function createDatabaseStrategy(): DatabaseStrategy {{
  const useClickHouse = process.env.USE_CLICKHOUSE === 'true';
  if (useClickHouse) {{
    return new ClickHouseStrategy();
  }}
  return {pg_ctor};
}}

export const dbStrategy = createDatabaseStrategy();

// OLTP writes always stay on PostgreSQL
export {{ pgPool }};

// Default export preserved for backwards compatibility
export default pgPool;
"""


# ------------------------------------------------------------ the loop


def emit_migration(scan: Any, repo_path: str = "") -> dict:
    """Scanner artifact → generated files + the prompt's step-7 summary
    JSON. Every file passes ``qa_check`` (the agent's qa_approve-
    before-write contract); a rejection raises with the gate's reason.
    """
    scan_d = scan.to_dict() if hasattr(scan, "to_dict") else dict(scan)
    if not scan_d.get("queries"):
        return {
            "error": (
                "No scan found. Please run the scanner first to analyze "
                "your queries."
            ),
            "scan_found": False,
        }
    table = (scan_d.get("tables") or ["expenses"])[0]
    specs = build_method_specs(
        scan_d["queries"], table=table, repo_path=repo_path or None
    )
    orm = next((s.orm for s in specs if s.orm != "none"), "none")
    files = {
        "lib/clickhouse.ts": _emit_client(),
        "lib/types.ts": _emit_types(specs),
        "lib/strategies/clickhouse.ts": _emit_ch_strategy(specs),
        "lib/strategies/postgres.ts": _emit_pg_strategy(specs, orm),
        "lib/db.ts": _emit_factory(specs, orm),
    }
    qa = {}
    for path, content in files.items():
        verdict = qa_check(
            content, file_path=path, purpose="code migration (strategy layer)"
        )
        qa[path] = verdict
        if not verdict["approved"]:
            raise ValueError(
                f"QA gate rejected {path}: {verdict['reason']}"
            )
    # Change-level backwards-compat proof: the per-file gate exempts
    # single-engine strategy arms, so the WHOLE change must carry the
    # PG fallback, the CH path, and the env toggle.
    from clickhouse_build_spark.qa_gate import _db_usage

    uses_ch, uses_pg, has_env = _db_usage("\n".join(files.values()))
    if not (uses_ch and uses_pg and has_env):
        raise ValueError(
            "emitted change is not backwards compatible: needs the "
            "ClickHouse path, the PostgreSQL fallback, and the "
            "USE_CLICKHOUSE environment toggle"
        )
    pm, install_cmd = detect_package_manager(repo_path) if repo_path else (
        "npm",
        "npm install @clickhouse/client",
    )
    return {
        "scan_found": True,
        "tables": scan_d.get("tables", []),
        "package_manager": pm,
        "install_command": install_cmd,
        "installed": False,  # emission is offline; the command is reported
        "strategy": {
            "pattern": (
                "strategy pattern: DatabaseStrategy interface with "
                "PostgreSQLStrategy (default) and ClickHouseStrategy, "
                "selected by USE_CLICKHOUSE"
            ),
            "orm": orm,
            "query_sites": [
                {
                    "file": s.location.split(":")[0],
                    "location": s.location,
                    "query_type": s.query_type,
                    "method": s.name,
                    "orm": s.orm,
                    # the PG-side SQL (scanned verbatim for raw sites,
                    # derived for ORM sites) the round-trip test proves
                    # the CH variant against
                    "pg_equivalent_sql": s.pg_sql,
                }
                for s in specs
            ],
            "total_query_sites": len(specs),
            "environment_variable": "USE_CLICKHOUSE",
            "environment_sources": [".env file", "system environment"],
            "backwards_compatible": True,
            "strict_typing": True,
        },
        "implementation": {
            "files_created": sorted(files),
            "files_modified": [],
            "total_changes": len(files),
            "status": "completed",
        },
        "files": files,
        "qa": qa,
    }


def migrate_code(repo_path: str, out_dir: str | None = None) -> dict:
    """scan → emit → (optionally) write. The CLI entry: runs the
    deterministic scanner over ``repo_path``, emits the strategy layer,
    and writes the generated files under ``out_dir`` when given (the
    source repo is never modified in place)."""
    from clickhouse_build_spark.scanner import scan_repo

    result = emit_migration(scan_repo(repo_path), repo_path=repo_path)
    if result.get("scan_found") and out_dir:
        for rel, content in result["files"].items():
            dest = os.path.join(out_dir, rel)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            with open(dest, "w") as f:
                f.write(content)
        result["written_to"] = out_dir
    return result
