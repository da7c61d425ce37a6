"""Command scripts — the reference's `process <file>` surface.

Reference behavior (edge_lake/cmd/member_cmd.py:13318 _process_script /
:13522 exec_script; variable store in edge_lake/generic/params.py):

* a script is a text file of EdgeLake commands, executed in order;
* blank lines and ``#`` comments are skipped;
* ``:name:`` lines are goto labels (preprocessed before execution);
* ``<`` … ``>`` join a command across multiple lines;
* ``variables (a, b, c)`` binds positional call arguments;
* ``name = <command>`` assigns the command's rendered result to a
  variable; a quoted or plain literal on the right is assigned as-is
  (the reference routes both through params.add_param);
* ``!name`` anywhere in a later command substitutes the value
  (params.get_value_if_available);
* ``if <lhs> <op> <rhs> then <command>`` runs the command when the
  comparison holds (reference conditional execution via _process_if);
  a bare ``if <lhs> <op> <rhs>`` just records the result, and ``do
  <command>`` / ``else <command>`` execute when the LAST if was
  true / false (reference _process_do_else, member_cmd.py:15017 —
  status.set_if_result / get_if_result);
* ``goto name`` jumps; ``call name`` jumps and pushes a return
  address; ``return`` resumes after the call (empty stack = script
  end — reference _return_goto / _return_from_call);
* ``wait N`` pauses N seconds; ``wait N for <cond>`` skips the pause
  when the condition already holds (reference _wait,
  member_cmd.py:12169 — there the poll watches other threads; this
  engine's scripts are single-threaded, so an unmet condition simply
  waits out the maximum);
* ``on error goto name`` arms an error handler; ``end script`` stops.

The runner executes commands through a ``callable(command_str)`` —
normally ``EdgeLakeEngine.run`` — so scripts can mix sql, admin,
schedule and nested ``process`` commands exactly like the reference
shell. A step cap bounds runaway goto loops.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class ScriptResult:
    """Outcome of one script run."""

    variables: dict = field(default_factory=dict)
    executed: list = field(default_factory=list)  # (line_no, command, result)
    ended_early: bool = False
    error: str | None = None


_LABEL_RE = re.compile(r"^:([\w.-]+):\s*$")
_ASSIGN_RE = re.compile(r"^([A-Za-z_]\w*)\s*=\s*(.+)$", re.DOTALL)
_IF_RE = re.compile(
    r"^if\s+(.+?)\s*(==|!=|>=|<=|>|<|\bcontains\b)\s*(.+?)\s+then\s+(.+)$",
    re.IGNORECASE | re.DOTALL,
)
_IF_BARE_RE = re.compile(
    r"^if\s+(.+?)\s*(==|!=|>=|<=|>|<|\bcontains\b)\s*(.+?)$",
    re.IGNORECASE | re.DOTALL,
)
_DO_ELSE_RE = re.compile(r"^(do|else)\s+(.+)$", re.IGNORECASE | re.DOTALL)
_WAIT_RE = re.compile(r"^wait\s+(\d+)(?:\s+for\s+(.+))?$", re.IGNORECASE | re.DOTALL)
_VAR_RE = re.compile(r"!([A-Za-z_]\w*)")


def _strip_quotes(s: str) -> str:
    s = s.strip()
    if len(s) >= 2 and s[0] == s[-1] and s[0] in "\"'":
        return s[1:-1]
    return s


def _render(result) -> str:
    """Variable value for an executed command's result: scalars from a
    1x1 DataFrame, else the engine's string/render output (the
    reference assigns the command's stdout string)."""
    try:
        from pyspark.sql import DataFrame

        if isinstance(result, DataFrame):
            rows = result.limit(2).collect()
            if len(rows) == 1 and len(rows[0]) == 1:
                return str(rows[0][0])
            return "\n".join(str(tuple(r)) for r in rows)
    except Exception:
        pass
    return "" if result is None else str(result)


class ScriptRunner:
    """Executes script text against a command runner."""

    def __init__(self, runner, max_steps: int = 10_000, sleep=None):
        self.runner = runner
        self.max_steps = max_steps
        if sleep is None:
            import time

            sleep = time.sleep
        self.sleep = sleep  # injectable for tests (reference seconds_sleep)

    # ------------------------------------------------------------ parse

    @staticmethod
    def _logical_lines(text: str) -> list[tuple[int, str]]:
        """(first_line_no, command) pairs with `<`…`>` joins applied and
        blanks/comments dropped (labels are KEPT — the executor needs
        their positions)."""
        out: list[tuple[int, str]] = []
        joining: list[str] | None = None
        join_start = 0
        for i, raw in enumerate(text.splitlines(), start=1):
            line = raw.strip()
            if joining is not None:
                joining.append(line.rstrip())
                if line.endswith(">"):
                    cmd = " ".join(joining)[1:-1].strip()  # drop < and >
                    out.append((join_start, cmd))
                    joining = None
                continue
            if not line or line.startswith("#"):
                continue
            if line.startswith("<") and not line.endswith(">"):
                joining = [line.rstrip()]
                join_start = i
                continue
            if line.startswith("<") and line.endswith(">"):
                out.append((i, line[1:-1].strip()))
                continue
            out.append((i, line))
        return out

    # -------------------------------------------------------------- run

    def run(
        self,
        text: str,
        values: list | None = None,
        variables: dict | None = None,
    ) -> ScriptResult:
        """``variables`` may be a shared store (the engine passes its
        node dictionary, so scripts read and write the same `!name`
        space as interactive commands — reference params.py is one
        global dict per node)."""
        lines = self._logical_lines(text)
        res = ScriptResult(variables=variables if variables is not None else {})

        # preprocess labels (reference exec_script step 1)
        labels: dict[str, int] = {}
        for idx, (line_no, cmd) in enumerate(lines):
            m = _LABEL_RE.match(cmd)
            if m:
                if m.group(1) in labels:
                    res.error = f"duplicate label: {m.group(1)}"
                    return res
                labels[m.group(1)] = idx

        pc = 0
        steps = 0
        on_error: str | None = None
        last_if = False  # reference status.get_if_result default
        call_stack: list[int] = []  # return addresses for `call`
        while pc < len(lines):
            steps += 1
            if steps > self.max_steps:
                res.error = "step limit exceeded (goto loop?)"
                return res
            line_no, cmd = lines[pc]
            pc += 1
            if _LABEL_RE.match(cmd):
                continue

            # variables (a, b, c) — bind positional call arguments
            m = re.match(r"^variables\s*\((.*)\)\s*$", cmd, re.IGNORECASE)
            if m:
                names = [n.strip() for n in m.group(1).split(",") if n.strip()]
                if values is None or len(values) < len(names):
                    res.error = (
                        f"script requires {len(names)} variable(s) at line "
                        f"{line_no}; {len(values or [])} provided"
                    )
                    return res
                res.variables.update(zip(names, [str(v) for v in values]))
                continue

            cmd = _VAR_RE.sub(
                lambda m_: res.variables.get(m_.group(1), m_.group(0)), cmd
            )

            # conditional layer: if-then / bare-if / do / else may wrap
            # another conditional (`do if … then …`), so unwrap in a loop
            skip_line = False
            while True:
                m = _IF_RE.match(cmd)
                if m:
                    lhs, op, rhs, then_cmd = (
                        _strip_quotes(m.group(1)),
                        m.group(2).lower(),
                        _strip_quotes(m.group(3)),
                        m.group(4).strip(),
                    )
                    last_if = self._compare(lhs, op, rhs)
                    if not last_if:
                        skip_line = True
                        break
                    cmd = then_cmd  # branch re-enters control handling
                    continue
                m = _IF_BARE_RE.match(cmd)
                if m:
                    # bare `if` records the result for do/else
                    last_if = self._compare(
                        _strip_quotes(m.group(1)),
                        m.group(2).lower(),
                        _strip_quotes(m.group(3)),
                    )
                    skip_line = True
                    break
                m = _DO_ELSE_RE.match(cmd)
                if m:
                    want = m.group(1).lower() == "do"
                    if last_if != want:
                        skip_line = True
                        break
                    cmd = m.group(2).strip()
                    continue
                break
            if skip_line:
                continue

            m = _WAIT_RE.match(cmd)
            if m:
                max_wait = int(m.group(1))
                cond = (m.group(2) or "").strip()
                if not cond or not self._condition(cond):
                    self.sleep(max_wait)
                continue

            if cmd.lower() == "end script":
                res.ended_early = True
                return res
            m = re.match(r"^on\s+error\s+goto\s+([\w.-]+)$", cmd, re.IGNORECASE)
            if m:
                on_error = m.group(1)
                continue
            m = re.match(r"^goto\s+([\w.-]+)$", cmd, re.IGNORECASE)
            if m:
                if m.group(1) not in labels:
                    res.error = f"goto without declared label: {m.group(1)}"
                    return res
                pc = labels[m.group(1)]
                continue
            m = re.match(r"^call\s+([\w.-]+)$", cmd, re.IGNORECASE)
            if m:
                # reference _return_goto: jump with a return address
                if m.group(1) not in labels:
                    res.error = f"call without declared label: {m.group(1)}"
                    return res
                call_stack.append(pc)
                pc = labels[m.group(1)]
                continue
            if cmd.lower() == "return":
                # reference _return_from_call: resume after the call;
                # return from the root ends the script
                if not call_stack:
                    return res
                pc = call_stack.pop()
                continue

            m = _ASSIGN_RE.match(cmd)
            if m and not cmd.lower().startswith(("set ",)):
                name, rhs = m.group(1), m.group(2).strip()
                if (rhs.startswith('"') and rhs.endswith('"')) or (
                    rhs.startswith("'") and rhs.endswith("'")
                ):
                    res.variables[name] = _strip_quotes(rhs)
                elif re.fullmatch(r"[-\d.]+", rhs):
                    res.variables[name] = rhs
                else:
                    try:
                        result = self.runner(rhs)
                    except Exception as exc:
                        if on_error and on_error in labels:
                            res.variables["error_message"] = str(exc)
                            pc = labels[on_error]
                            continue
                        res.error = f"line {line_no}: {exc}"
                        return res
                    res.variables[name] = _render(result)
                    res.executed.append((line_no, rhs, result))
                continue
            m = re.match(r"^set\s+([A-Za-z_]\w*)\s*=\s*(.+)$", cmd, re.IGNORECASE)
            if m:
                res.variables[m.group(1)] = _strip_quotes(m.group(2))
                continue

            try:
                result = self.runner(cmd)
            except Exception as exc:
                if on_error and on_error in labels:
                    res.variables["error_message"] = str(exc)
                    pc = labels[on_error]
                    continue
                res.error = f"line {line_no}: {exc}"
                return res
            res.executed.append((line_no, cmd, result))
        return res

    def _condition(self, cond: str) -> bool:
        """`wait N for <cond>`: a comparison, or a bare value whose
        truth is "resolved and non-empty" (an unresolved `!name` is
        left verbatim by substitution and counts as unmet — reference
        _wait polls params.get_value_if_available)."""
        m = re.match(
            r"^(.+?)\s*(==|!=|>=|<=|>|<|\bcontains\b)\s*(.+?)$",
            cond,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            return self._compare(
                _strip_quotes(m.group(1)), m.group(2).lower(), _strip_quotes(m.group(3))
            )
        v = _strip_quotes(cond)
        return bool(v) and not v.startswith("!")

    @staticmethod
    def _compare(lhs: str, op: str, rhs: str) -> bool:
        if op == "contains":
            return rhs in lhs
        try:
            a, b = float(lhs), float(rhs)
        except ValueError:
            a, b = lhs, rhs
        return {
            "==": a == b,
            "!=": a != b,
            ">": a > b,
            "<": a < b,
            ">=": a >= b,
            "<=": a <= b,
        }[op]


def run_script_file(
    runner, path: str, values: list | None = None, variables: dict | None = None
) -> ScriptResult:
    """`process <file>` entry (reference _process_script)."""
    with open(path) as fh:
        return ScriptRunner(runner).run(fh.read(), values=values, variables=variables)
