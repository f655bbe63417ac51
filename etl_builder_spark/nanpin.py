"""The NaN→NULL cast pin, applied to every oracle at registration.

Round-13 centerpiece (VERDICT r12 #1, NOTES_r12 handoff).  The
``nanmeasures`` adversarial shape — IEEE NaN, not NULL, in every DOUBLE
measure on odd rows — exposed 126 keys whose exact-money discipline
errors instead of answering: DuckDB raises InvalidInput on ANY
NaN → fixed-width cast (its DECIMAL casts are INT64-backed, so the
message names INT64), while Spark under ANSI raises CAST_OVERFLOW on
NaN → integral and already yields NULL on NaN → DECIMAL.

The engine's declared semantics (folding.nan_to_null, round 12): a NaN
measurement is an UNDEFINED measurement, and NULL is the one
unknown-value semantics both engines share — every aggregate skips it
identically.  This module applies that pin at every measure →
fixed-width cast boundary of the ORACLE SQL mechanically, as a
registration-time compiler pass over the oracle string:

    CAST(expr AS DECIMAL(p,s)|BIGINT|INT|…)
      →  CAST((CASE WHEN isnan(expr) THEN NULL ELSE expr END) AS …)

One auditable code path instead of ~300 hand edits; provably identity
on NaN-free corpora (the guard only fires on NaN, and the full
sf0.001/sf0.01 parity sweeps re-prove it); idempotent (already-guarded
casts are skipped).  The Spark half of the pin is applied at the
specific failing cast sites (NaN → integral is the only erroring form
there), with :func:`etl_builder_spark.folding.nan_to_null`.

The scan is tokenizer-grade — paren depth + SQL single-quote tracking —
not a regex over nested parens.  ``TRY_CAST`` is left alone (``\\b``
excludes it), as DuckDB 1.0's TRY_CAST still errors on NaN → DECIMAL
(upstream quirk) but every TRY_CAST here has a VARCHAR source, which
``isnan`` would not bind against anyway.  DuckDB binds ``isnan`` only
for numeric inputs, so a wrap over a non-numeric cast fails LOUDLY as
an ORACLE-ERROR in the next selfcheck — the gates are the safety net;
NaN-impossible source forms (COUNT, string extractors) are skipped to
keep the wrapped SQL lean.
"""

from __future__ import annotations

import re

#: fixed-width targets whose NaN cast errors on at least one engine
_TYPE_RE = re.compile(
    r"^(DECIMAL\s*\(\s*\d+\s*,\s*\d+\s*\)|BIGINT|INTEGER|INT|SMALLINT|HUGEINT)$",
    re.IGNORECASE,
)

#: source forms that can never be NaN (integral aggregates) or that
#: isnan cannot bind against (string extractors) — skipped
_SAFE_RE = re.compile(
    r"^\s*(COUNT\s*\(|COUNT_IF\s*\(|\d+\s*$|substr\s*\(|substring\s*\(|"
    r"strftime\s*\(|left\s*\(|right\s*\(|regexp_extract\s*\(|'|ROW_NUMBER\s*\(|"
    r"concat\s*\(|concat_ws\s*\(|md5\s*\(|to_hex\s*\(|format\s*\(|printf\s*\()",
    re.IGNORECASE,
)


def _is_boolean_expr(expr: str) -> bool:
    """True when ``expr`` has a top-level comparison/logic operator —
    a BOOLEAN source (bucketing indicators like ``x < q80``), which can
    never be NaN and which ``isnan`` refuses to bind against."""
    depth = 0
    in_str = False
    i, n = 0, len(expr)
    while i < n:
        ch = expr[i]
        if in_str:
            if ch == "'":
                if i + 1 < n and expr[i + 1] == "'":
                    i += 1
                else:
                    in_str = False
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0:
            if ch in "<>=":
                return True
            if re.match(r"\s(AND|OR|NOT|IN|LIKE|IS)\s", expr[i : i + 6], re.IGNORECASE):
                return True
        i += 1
    return False

def _mask_comments(sql: str) -> str:
    """Same-length copy with SQL comment bytes (``-- …`` to end of line
    and ``/* … */``) replaced by spaces, so every positional scan below
    ignores them (ADVICE r13: an apostrophe, unbalanced paren, or
    literal ``CAST(`` inside a comment must not mis-scope a rewrite).
    Single-quoted strings AND double-quoted identifiers are respected
    ('' / "" are the escaped quotes — ADVICE r14: a literal ``--`` or
    ``/*`` inside a quoted identifier must not start a comment);
    newlines are preserved so positions stay aligned either way."""
    out = list(sql)
    i, n = 0, len(sql)
    in_str = False   # inside '...'
    in_ident = False  # inside "..."
    while i < n:
        ch = sql[i]
        if in_str:
            if ch == "'":
                if i + 1 < n and sql[i + 1] == "'":
                    i += 1
                else:
                    in_str = False
        elif in_ident:
            if ch == '"':
                if i + 1 < n and sql[i + 1] == '"':
                    i += 1
                else:
                    in_ident = False
        elif ch == "'":
            in_str = True
        elif ch == '"':
            in_ident = True
        elif ch == "-" and i + 1 < n and sql[i + 1] == "-":
            while i < n and sql[i] != "\n":
                out[i] = " "
                i += 1
            continue
        elif ch == "/" and i + 1 < n and sql[i + 1] == "*":
            while i < n and not (sql[i] == "*" and i + 1 < n and sql[i + 1] == "/"):
                if sql[i] != "\n":
                    out[i] = " "
                i += 1
            if i + 1 < n:
                out[i] = out[i + 1] = " "
                i += 2
            continue
        i += 1
    return "".join(out)


_CAST_RE = re.compile(r"\bCAST\s*\(")

_ALREADY_RE = re.compile(r"^\(\s*CASE\s+WHEN\s+isnan\s*\(", re.IGNORECASE)


def _scan_cast(text: str, open_idx: int):
    """From the index of a cast's ``(``, return ``(close_idx, as_idx)``
    where as_idx starts the top-level `` AS `` keyword; (None, None) on
    a malformed span.  SQL single-quoted strings are tracked so quoted
    parens don't break depth counting ('' is the escaped quote)."""
    depth = 0
    in_str = False
    as_idx = None
    i = open_idx
    n = len(text)
    while i < n:
        ch = text[i]
        if in_str:
            if ch == "'":
                if i + 1 < n and text[i + 1] == "'":
                    i += 1
                else:
                    in_str = False
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i, as_idx
        elif depth == 1 and re.match(r"\sAS\s", text[i : i + 4], re.IGNORECASE):
            as_idx = i  # the single top-level AS of the CAST grammar
        i += 1
    return None, None


def pin_nan_casts(sql: str) -> str:
    """Wrap every qualifying ``CAST(expr AS <fixed-width>)`` in ``sql``
    with the NaN→NULL guard.  Identity when no cast qualifies.

    Nested qualifying casts are handled by a fixpoint loop that applies
    only INNERMOST edits per pass: an outer cast whose expr then starts
    with the guard is skipped — correctly, because its source is the
    already-guarded inner cast's fixed-width result, which can never be
    NaN."""
    while True:
        # scan the comment-masked twin (same length, comments → spaces)
        # so structure inside comments can't mis-scope a rewrite; the
        # extracted expr is taken from the mask too, because the guard
        # inlines it twice on one line — a surviving '--' inside it
        # would comment out the THEN/ELSE tail
        masked = _mask_comments(sql)
        edits = []
        for m in _CAST_RE.finditer(masked):
            open_idx = m.end() - 1
            close_idx, as_idx = _scan_cast(masked, open_idx)
            if close_idx is None or as_idx is None:
                continue
            expr = masked[open_idx + 1 : as_idx].strip()
            typ = masked[as_idx + 4 : close_idx].strip()
            if (
                not _TYPE_RE.match(typ)
                or _SAFE_RE.match(expr)
                or _ALREADY_RE.match(expr)
                or _is_boolean_expr(expr)
            ):
                continue
            edits.append((open_idx + 1, as_idx, expr))
        # innermost-only: drop any edit whose expr region contains another
        inner = [
            e
            for e in edits
            if not any(o is not e and e[0] < o[0] and o[1] <= e[1] for o in edits)
        ]
        if not inner:
            return sql
        for start, end, expr in reversed(inner):
            sql = (
                sql[:start]
                + f"(CASE WHEN isnan({expr}) THEN NULL ELSE {expr} END)"
                + sql[end:]
            )
