"""Deterministic QA gate for migration-generated code — the engine's
analogue of the reference's LLM code-quality validator.

The reference's third eval (``eval/qa_code_migrator/ground_truth.json``)
grades an approve/reject gate that code passes through before being
written during a migration; its rules live in the validator prompt
(``src/prompts/qa_code_migrator.py:4-29``). Like the scanner
(``scanner.py``), this reimplements those RULES as a deterministic
classifier — regex checks with explainable reasons, no model in the
loop — and is tested field-exact against the reference's own ground
truth (``tests/test_qa_gate.py``), closing the eval triangle
(scanner F1, data-migrator field-exact, QA gate).

Rule set (same priority order as the prompt):

1. Type safety (critical): reject explicitly-declared ``any``; reject
   explicitly-declared ``unknown`` without a type guard; implicit
   ``any`` from library calls is fine (only annotations the developer
   wrote are inspected).
2. Backwards compatibility (critical): reject ClickHouse-only code
   with no PostgreSQL fallback; reject database switching that never
   consults the environment. PostgreSQL must stay the default — the
   same policy the engine itself enforces by keeping the PG dialect
   the pass-through one (``functions/chsql.py:translate_pg_sql``).
3. Incremental development: incomplete-but-typed code passes; an
   unused import does not.
"""

from __future__ import annotations

import re

__all__ = ["qa_check"]

# Explicit type annotations the developer wrote: `x: any`, `(): any`,
# `as any`, `<any>` casts. Generic parameters like `json<Record<...>>`
# and identifiers that merely CONTAIN "any" must not trip it.
_ANY_DECL = re.compile(r"(:\s*any\b|\bas\s+any\b|<\s*any\s*>)")
_UNKNOWN_DECL = re.compile(r"(:\s*unknown\b|\bas\s+unknown\b)")
# typeof/instanceof narrowing only — a bare `in` alternative would
# match the English word in any comment or string and defeat the rule
# (review r09); the TS `'k' in obj` guard form is matched explicitly.
_TYPE_GUARD = re.compile(
    r"\btypeof\b|\binstanceof\b|['\"]\w+['\"]\s+in\s+\w+"
)

# Identifier-level engine markers, matched on comment-and-string
# stripped code (ADVICE r09: a comment mentioning 'ClickHouse' in
# PG-only code must not trip the CH-only rejection); module-path
# markers are read from the import specifiers separately.
_CH_IDENT = re.compile(r"ClickHouseClient|ClickHouse")
# Postgres-path markers include the PG ORM clients the reference's
# golden corpora keep as the fallback arm (drizzle's NodePgDatabase,
# PrismaClient). 'Postgres' alone misses the capital-S 'PostgreSQL'.
_PG_IDENT = re.compile(
    r"\bPool\b|Postgres|PostgreSQL|PrismaClient|NodePgDatabase"
)
_ENV_CHECK = re.compile(r"process\.env\.")
_REQUIRE = re.compile(r"require\(\s*['\"]([^'\"]+)['\"]\s*\)")


def _strip_comments_and_strings(code: str) -> str:
    """Blank ``//`` / ``/* */`` comments and the CONTENTS of
    '/"/` string literals (quotes and newlines kept, so offsets into
    the original stay line-accurate). Engine-detection rules run on
    this form so prose never trips them."""
    out: list[str] = []
    i, n = 0, len(code)

    def blank(seg: str) -> str:
        return "".join(ch if ch == "\n" else " " for ch in seg)

    while i < n:
        c = code[i]
        if c == "/" and code[i : i + 2] == "//":
            j = code.find("\n", i)
            j = n if j < 0 else j
            out.append(blank(code[i:j]))
            i = j
        elif c == "/" and code[i : i + 2] == "/*":
            j = code.find("*/", i + 2)
            j = n if j < 0 else j + 2
            out.append(blank(code[i:j]))
            i = j
        elif c in "'\"`":
            j = i + 1
            while j < n and code[j] != c:
                if code[j] == "\\":
                    j += 1
                j += 1
            closed = j < n
            out.append(c + blank(code[i + 1 : j]) + (c if closed else ""))
            i = j + 1 if closed else n
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _db_usage(code: str) -> tuple[bool, bool, bool]:
    """(uses_clickhouse, uses_postgres, has_env_check) — identifiers on
    stripped code, module markers on the actual import specifiers."""
    stripped = _strip_comments_and_strings(code)
    mods = [m.group(4) for m in _IMPORT.finditer(code)]
    mods += _REQUIRE.findall(code)
    uses_ch = bool(_CH_IDENT.search(stripped)) or any(
        "clickhouse" in m.lower() for m in mods
    )
    uses_pg = bool(_PG_IDENT.search(stripped)) or any(
        m == "pg" or m.startswith("pg/") for m in mods
    )
    return uses_ch, uses_pg, bool(_ENV_CHECK.search(stripped))

# `import { A, B as C } from 'x'` / `import X from 'x'` /
# `import * as ns from 'x'`
_IMPORT = re.compile(
    r"^import\s+(?:\{([^}]*)\}|\*\s+as\s+(\w+)|(\w+))\s+from\s+['\"]([^'\"]+)['\"]",
    re.MULTILINE,
)


def _line_of(code: str, match: re.Match) -> int:
    return code.count("\n", 0, match.start()) + 1


def _imported_names(code: str) -> list[tuple[str, int]]:
    names: list[tuple[str, int]] = []
    for m in _IMPORT.finditer(code):
        line = _line_of(code, m)
        if m.group(1):
            for part in m.group(1).split(","):
                part = part.strip()
                if not part:
                    continue
                # `A as B` binds B locally
                alias = re.split(r"\s+as\s+", part)[-1].strip()
                names.append((alias, line))
        elif m.group(2):
            names.append((m.group(2), line))
        elif m.group(3):
            names.append((m.group(3), line))
    return names


def qa_check(code: str, file_path: str = "", purpose: str = "") -> dict:
    """Approve or reject ``code`` before it is written to
    ``file_path``. Returns ``{"approved": bool, "reason": str}`` — the
    same contract the reference's validator returns as JSON."""
    # --- 1. type safety -------------------------------------------------
    m = _ANY_DECL.search(code)
    if m:
        return {
            "approved": False,
            "reason": (
                f"Explicit 'any' type declared on line {_line_of(code, m)}. "
                "Must use an explicit type."
            ),
        }
    m = _UNKNOWN_DECL.search(code)
    if m and not _TYPE_GUARD.search(code):
        return {
            "approved": False,
            "reason": (
                f"Explicit 'unknown' type on line {_line_of(code, m)} is "
                "used without a type guard."
            ),
        }

    # --- 2. backwards compatibility -------------------------------------
    # Strategy-arm exemption (r10): one arm of a declared strategy
    # pattern is legitimately single-engine — the fallback lives in the
    # sibling arm, and the CHANGE-level check (code_emitter.py) owns
    # proving the whole change keeps PG + the env toggle. The golden
    # corpus's own lib/clickhouse.ts / lib/strategies/clickhouse.ts are
    # this shape; the reference's LLM validator approved them from the
    # same purpose context. A CH-only file NOT declared as a strategy
    # arm (the ground truth's 'missing_env_check' router) still rejects.
    strategy_arm = "strategy" in purpose.lower() or "/strategies/" in file_path
    uses_ch, uses_pg, has_env = _db_usage(code)
    if uses_ch and not uses_pg and not strategy_arm:
        return {
            "approved": False,
            "reason": (
                "Forces ClickHouse-only without a PostgreSQL fallback, "
                "breaking existing users."
            ),
        }
    if uses_ch and uses_pg and not has_env:
        return {
            "approved": False,
            "reason": (
                "Database routing switches engines without an environment "
                "check; PostgreSQL must stay the default."
            ),
        }

    # --- 3. incremental development --------------------------------------
    body = _IMPORT.sub("", code)
    for name, line in _imported_names(code):
        if not re.search(rf"\b{re.escape(name)}\b", body):
            return {
                "approved": False,
                "reason": f"Unused import '{name}' on line {line}.",
            }

    return {
        "approved": True,
        "reason": (
            "Developer-written types are explicit and existing behavior "
            "is preserved."
        ),
    }
