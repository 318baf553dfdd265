"""Multi-statement script execution — DECLARE / SET / WHILE / IF around
dialect statements.

Reference: a GraphView command text is a T-SQL *batch*; WSqlBatch holds a
statement list and WWhileStatement / WIfStatement / WDeclareVariableStatement
are first-class nodes (GraphView/TSQL Syntax Tree/WSql.cs:215-313,405-454).
The README's "iterative computation" story is a T-SQL WHILE loop around
MATCH/DML statements. Here the batch interpreter is driver-side Python:
variables live in a dict, scalar expressions (including scalar subqueries
over the registered node tables) evaluate through one-row ``spark.sql``
calls, and every other statement flows to ``execute_statement`` with
``@var`` occurrences substituted as SQL literals.

Scale notes: control flow is driver-side by design — exactly like the
reference, where SQL Server runs the WHILE loop one statement at a time.
The per-iteration work is whatever the inner statements do (full
DataFrame plans); the interpreter itself adds one tiny one-row SQL
evaluation per condition/assignment.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_MAX_LOOP_ITERATIONS = 100_000


class ScriptError(ValueError):
    pass


def _mask(sql: str):
    from graphview_spark.matching.query import _mask_strings

    return _mask_strings(sql)


def _unmask(sql: str, lits):
    from graphview_spark.matching.query import _unmask as u

    return u(sql, lits)


def _is_kw_at(text: str, i: int, end: int) -> bool:
    before = text[i - 1] if i > 0 else " "
    after = text[end] if end < len(text) else " "
    return (not before.isalnum() and before != "_") and (
        not after.isalnum() and after != "_"
    )


def split_statements(masked: str) -> list[str]:
    """Split a masked script on ``;`` at depth 0, where parens AND
    BEGIN...END blocks count as depth — so a CREATE PROCEDURE body or a
    WHILE block stays one statement."""
    parts: list[str] = []
    cur: list[str] = []
    depth = 0
    i = 0
    upper = masked.upper()
    while i < len(masked):
        ch = masked[i]
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        elif (
            upper.startswith("BEGIN", i)
            and _is_kw_at(masked, i, i + 5)
            # BEGIN TRAN[SACTION] is a statement, not a block opener
            and not re.match(r"\s+TRAN(SACTION)?\b", upper[i + 5 :])
        ):
            depth += 1
        elif upper.startswith("END", i) and _is_kw_at(masked, i, i + 3):
            depth -= 1
        if ch == ";" and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _find_matching_end(masked: str, begin_at: int) -> int:
    """Index just past the END matching the BEGIN at ``begin_at``."""
    upper = masked.upper()
    depth = 0
    i = begin_at
    while i < len(masked):
        if (
            upper.startswith("BEGIN", i)
            and _is_kw_at(masked, i, i + 5)
            and not re.match(r"\s+TRAN(SACTION)?\b", upper[i + 5 :])
        ):
            depth += 1
            i += 5
            continue
        if upper.startswith("END", i) and _is_kw_at(masked, i, i + 3):
            depth -= 1
            i += 3
            if depth == 0:
                return i
            continue
        i += 1
    raise ScriptError("BEGIN without matching END")


def _subst_vars(text: str, variables: dict[str, object]) -> str:
    from graphview_spark.graph import _sql_lit

    def repl(m: re.Match) -> str:
        name = m.group(1)
        if name in variables:
            return _sql_lit(variables[name])
        return m.group(0)

    return re.sub(r"@(\w+)", repl, text)


def split_cond_block(rest: str) -> tuple[str, str, str]:
    """``<cond> BEGIN <body> END <tail>`` → (cond, body, tail)."""
    upper = rest.upper()
    depth = 0
    for i, ch in enumerate(rest):
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        elif (
            depth == 0
            and upper.startswith("BEGIN", i)
            and _is_kw_at(rest, i, i + 5)
        ):
            end = _find_matching_end(rest, i)
            return rest[:i].strip(), rest[i + 5 : end - 3].strip(), rest[end:]
    raise ScriptError("WHILE/IF requires a BEGIN ... END block")


class _ScriptReturn(Exception):
    """Raised by RETURN to unwind out of nested blocks/loops."""


class ScriptRunner:
    def __init__(self, g):
        self.g = g
        self.variables: dict[str, object] = {}
        self.printed: list[str] = []   # PRINT output, in order
        self.result: DataFrame | None = None  # last delivered result set
        self._current_error: Exception | None = None  # inside CATCH

    # -- scalar evaluation -------------------------------------------------
    def _eval_scalar(self, expr: str, lits) -> object:
        """Evaluate a scalar expression (may contain scalar subqueries over
        node tables/views) via a one-row spark.sql SELECT."""
        from graphview_spark.matching.query import _register_views

        # pass the expression: _register_views builds the (expensive,
        # catalog-persistent) GlobalNodeView only when it is referenced
        _register_views(self.g, expr)
        sql = _unmask(_subst_vars(expr, self.variables), lits).strip()
        # OBJECT_ID('T') — the T-SQL existence-check idiom in script
        # preambles (IF OBJECT_ID('T') IS NOT NULL DROP TABLE T):
        # resolve against the graph catalog, not SQL Server's sys tables
        def _object_id(m: re.Match) -> str:
            name = m.group(1).split(".")[-1].strip().strip("[]")
            known = self.g.catalog.has_table(name) or name in getattr(
                self.g, "derived_tables", {}
            )
            return "1" if known else "CAST(NULL AS INT)"

        sql = re.sub(
            r"(?is)\bOBJECT_ID\s*\(\s*N?'([^']*)'\s*(?:,\s*N?'[^']*'\s*)?\)",
            _object_id,
            sql,
        )
        row = self.g.spark.sql(f"SELECT ({sql}) AS v").first()
        return row["v"]

    def _eval_cond(self, expr: str, lits) -> bool:
        v = self._eval_scalar(f"CASE WHEN {expr} THEN TRUE ELSE FALSE END", lits)
        return bool(v)

    # -- statement dispatch ------------------------------------------------
    def run(self, script: str) -> DataFrame | None:
        from graphview_spark.matching.query import strip_comments

        masked, lits = _mask(strip_comments(script))
        # sqlcmd-style GO batch separators (a line holding only GO
        # [count]) act as statement breaks; the repeat count is ignored
        # (idempotent DDL batches — the common use — don't need it)
        masked = re.sub(r"(?im)^\s*GO(\s+\d+)?\s*$", ";", masked)
        self.result = None
        try:
            return self._run_block(masked, lits)
        except _ScriptReturn:
            # T-SQL RETURN ends the batch but result sets already
            # produced are still delivered to the client — hand back the
            # last SELECT executed before the unwind.
            return self.result

    def _run_block(self, masked: str, lits) -> DataFrame | None:
        result: DataFrame | None = None
        for stmt in split_statements(masked):
            r = self._run_statement(stmt, lits)
            if r is not None:
                result = r
                self.result = r
        return result

    def _run_statement(self, stmt: str, lits) -> DataFrame | None:
        from graphview_spark.matching.query import execute_statement

        m = re.match(
            r"(?is)^\s*DECLARE\s+@(?P<name>\w+)\s+(?P<type>\w+(?:\s*\([\d, ]*\))?)"
            r"(?:\s*=\s*(?P<init>.+))?$",
            stmt,
        )
        if m:
            self.variables[m.group("name")] = (
                self._eval_scalar(m.group("init"), lits)
                if m.group("init")
                else None
            )
            return None
        m = re.match(r"(?is)^\s*SET\s+@(?P<name>\w+)\s*=\s*(?P<expr>.+)$", stmt)
        if m:
            if m.group("name") not in self.variables:
                raise ScriptError(f"SET of undeclared variable @{m.group('name')}")
            self.variables[m.group("name")] = self._eval_scalar(
                m.group("expr"), lits
            )
            return None
        m = re.match(r"(?is)^\s*PRINT\s+(?P<expr>.+)$", stmt)
        if m:
            # T-SQL progress messages — evaluated (variables resolve) and
            # collected on the runner; nothing executes on the cluster
            self.printed.append(str(self._eval_scalar(m.group("expr"), lits)))
            return None
        if re.match(r"(?is)^\s*RETURN\s*$", stmt):
            raise _ScriptReturn()
        if re.match(r"(?is)^\s*BEGIN\s+TRY\b", stmt):
            return self._run_try_catch(stmt, lits)
        m = re.match(
            r"(?is)^\s*THROW\s*"
            r"(?:\d+\s*,\s*(?P<msg>\x00\d+\x00|@\w+)\s*,\s*\d+)?"
            r"\s*$", stmt)
        if m:
            if m.group("msg"):
                raise ScriptError(self._msg_arg(m.group("msg"), lits))
            if self._current_error is not None:  # bare THROW re-raises
                raise self._current_error
            raise ScriptError("THROW outside CATCH requires arguments")
        m = re.match(
            r"(?is)^\s*RAISERROR\s*\(\s*(?P<msg>\x00\d+\x00|@\w+)\s*"
            r"(?:,\s*\d+\s*,\s*\d+\s*)?\)\s*$", stmt)
        if m:
            raise ScriptError(self._msg_arg(m.group("msg"), lits))
        m = re.match(r"(?is)^\s*WHILE\b(?P<rest>.+)$", stmt, re.DOTALL)
        if m:
            return self._run_while(m.group("rest"), lits)
        m = re.match(r"(?is)^\s*IF\b(?P<rest>.+)$", stmt, re.DOTALL)
        if m:
            return self._run_if(m.group("rest"), lits)
        # plain dialect statement with variables substituted
        sql = _unmask(_subst_vars(stmt, self.variables), lits)
        return execute_statement(self.g, sql)

    def _msg_arg(self, tok: str, lits) -> str:
        """THROW/RAISERROR message argument: a masked string literal or
        a @variable (T-SQL allows either)."""
        if tok.startswith("@"):
            name = tok[1:]
            if name not in self.variables:
                raise ScriptError(
                    f"THROW/RAISERROR references undeclared variable @{name}")
            return str(self.variables[name])
        return _unmask(tok, lits).strip("'")

    def _split_cond_block(self, rest: str) -> tuple[str, str, str]:
        return split_cond_block(rest)

    def _run_try_catch(self, stmt: str, lits) -> DataFrame | None:
        """T-SQL ``BEGIN TRY … END TRY BEGIN CATCH … END CATCH`` — the
        reference forwards structured error handling to SQL Server
        untranslated (WSql statement passthrough). The CATCH block runs
        only when the TRY block raises; ``ERROR_MESSAGE()`` resolves to
        the caught message (injected as a masked literal so quoting is
        safe), and a bare ``THROW`` inside CATCH re-raises. T-SQL's
        transaction-doom semantics (XACT_ABORT) are out of scope —
        statements already executed in the TRY block stay applied, as
        in SQL Server's default non-XACT_ABORT mode."""
        b1 = re.search(r"(?i)\bBEGIN\b", stmt).start()
        e1 = _find_matching_end(stmt, b1)
        try_body = re.sub(r"(?is)^\s*TRY\b", "", stmt[b1 + 5:e1 - 3])
        after = stmt[e1:]
        m = re.match(r"(?is)^\s*TRY\s*;?\s*(?P<rest>BEGIN\s+CATCH\b.*)$",
                     after, re.DOTALL)
        if not m:
            raise ScriptError("END TRY must be followed by BEGIN CATCH")
        rest = m.group("rest")
        b2 = re.search(r"(?i)\bBEGIN\b", rest).start()
        e2 = _find_matching_end(rest, b2)
        catch_body = re.sub(r"(?is)^\s*CATCH\b", "", rest[b2 + 5:e2 - 3])
        after2 = rest[e2:]
        m2 = re.match(r"(?is)^\s*CATCH\s*;?\s*(?P<tail>.*)$", after2,
                      re.DOTALL)
        if not m2:
            raise ScriptError("END of CATCH block must read END CATCH")
        tail = m2.group("tail")
        try:
            result = self._run_block(try_body, lits)
        except _ScriptReturn:
            raise
        except Exception as exc:  # noqa: BLE001 — TRY/CATCH semantics
            msg = str(exc).split("\n", 1)[0][:500]
            lits.append("'" + msg.replace("'", "''") + "'")
            token = f"\x00{len(lits) - 1}\x00"
            body = re.sub(r"(?i)\bERROR_MESSAGE\s*\(\s*\)", token,
                          catch_body)
            prev = self._current_error
            self._current_error = exc
            try:
                result = self._run_block(body, lits)
            finally:
                self._current_error = prev
        if tail.strip():
            r = self._run_block(tail, lits)
            if r is not None:
                result = r
        return result

    def _run_while(self, rest: str, lits) -> DataFrame | None:
        cond, body, tail = self._split_cond_block(rest)
        if tail.strip():
            raise ScriptError(f"unexpected text after WHILE block: {tail[:40]!r}")
        result: DataFrame | None = None
        iterations = 0
        while self._eval_cond(cond, lits):
            iterations += 1
            if iterations > _MAX_LOOP_ITERATIONS:
                raise ScriptError(
                    f"WHILE exceeded {_MAX_LOOP_ITERATIONS} iterations"
                )
            r = self._run_block(body, lits)
            if r is not None:
                result = r
        return result

    def _run_if(self, rest: str, lits) -> DataFrame | None:
        cond, body, tail = self._split_cond_block(rest)
        else_body = None
        if tail.strip():
            em = re.match(r"(?is)^\s*ELSE\b(?P<erest>.+)$", tail, re.DOTALL)
            if not em:
                raise ScriptError(f"unexpected text after IF block: {tail[:40]!r}")
            _, else_body, etail = self._split_cond_block(
                " TRUE " + em.group("erest")
            )
            if etail.strip():
                raise ScriptError(
                    f"unexpected text after ELSE block: {etail[:40]!r}"
                )
        if self._eval_cond(cond, lits):
            return self._run_block(body, lits)
        if else_body is not None:
            return self._run_block(else_body, lits)
        return None


def execute_script(g, script: str) -> DataFrame | None:
    """Run a multi-statement script; returns the last SELECT's DataFrame."""
    return ScriptRunner(g).run(script)
