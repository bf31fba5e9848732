"""In-repo line coverage on ``sys.monitoring`` (PEP 669, Python 3.12).

The reference enforces a 100% line-coverage gate via pytest-cov
(``/root/reference/setup.cfg:1-2``); this image has neither coverage.py
nor pip, so the same signal is rebuilt on the stdlib: a LINE-event
callback records each (file, line) under ``audiotools_tpu/`` once and
then returns ``sys.monitoring.DISABLE`` for that location, so steady-
state overhead is near zero. The denominator is computed per file from
the compiled bytecode's ``co_lines`` tables (exactly the lines the
interpreter can report), minus ``# pragma: no cover`` exclusions —
line-level, or the whole block when the pragma sits on a block header
(def/class/if/...), matching coverage.py's semantics for the cases this
repo uses.

Activated by ``--linecov`` (see conftest); ``--linecov-fail-under=N``
gates the run. Results are printed in the terminal summary and written
to ``.linecov.json`` (per-file misses for drill-down).

Known deltas vs coverage.py: code in subprocesses (the slow-marked
2-process cluster test) and in dataloader *worker threads* IS captured
(monitoring is process-global), but separate processes are not; lines
only reachable on hardware (TPU fast paths) need pragmas like any
uncoverable code.
"""
import ast
import json
import sys
from pathlib import Path

PKG_ROOT = Path(__file__).resolve().parents[1] / "audiotools_tpu"
_PKG_PREFIX = str(PKG_ROOT) + "/"

_hits: dict = {}
_active = False


def start():
    """Register the LINE callback on the stdlib COVERAGE_ID slot."""
    global _active
    mon = sys.monitoring
    mon.use_tool_id(mon.COVERAGE_ID, "audiotools-linecov")
    mon.set_events(mon.COVERAGE_ID, mon.events.LINE)

    def on_line(code, lineno):
        fn = code.co_filename
        if fn.startswith(_PKG_PREFIX):
            _hits.setdefault(fn, set()).add(lineno)
        # one report per location is all coverage needs; disabling keeps
        # the instrumented interpreter at (near) full speed afterwards
        return mon.DISABLE

    mon.register_callback(mon.COVERAGE_ID, mon.events.LINE, on_line)
    _active = True


def stop():
    global _active
    if not _active:
        return
    mon = sys.monitoring
    mon.set_events(mon.COVERAGE_ID, 0)
    mon.register_callback(mon.COVERAGE_ID, mon.events.LINE, None)
    mon.free_tool_id(mon.COVERAGE_ID)
    _active = False


_BLOCK_NODES = (
    ast.FunctionDef,
    ast.AsyncFunctionDef,
    ast.ClassDef,
    ast.If,
    ast.While,
    ast.For,
    ast.Try,
    ast.With,
)


def executable_lines(path: Path) -> set:
    """Lines the interpreter can execute in ``path``, minus pragma'd
    ones. Derived from the real bytecode line tables, so it agrees with
    what the LINE event can ever report."""
    src = path.read_text()
    pragma_lines = {
        i
        for i, line in enumerate(src.splitlines(), 1)
        if "pragma: no cover" in line
    }
    excluded = set(pragma_lines)
    if pragma_lines:
        tree = ast.parse(src)
        for node in ast.walk(tree):
            if (
                isinstance(node, _BLOCK_NODES)
                and node.lineno in pragma_lines
            ):
                excluded.update(range(node.lineno, node.end_lineno + 1))

    out = set()
    stack = [compile(src, str(path), "exec")]
    code_t = type(stack[0])
    while stack:
        co = stack.pop()
        for _, _, ln in co.co_lines():
            # ln 0 is the synthetic RESUME line of module code objects
            if ln is not None and ln > 0 and ln not in excluded:
                out.add(ln)
        for const in co.co_consts:
            if isinstance(const, code_t):
                stack.append(const)
    return out


def report(fail_under=None, write_json=True):
    """Compute coverage, print a summary, optionally gate.

    Returns (total_pct, failed).
    """
    stop()
    rows = []
    total_exec = total_hit = 0
    for path in sorted(PKG_ROOT.rglob("*.py")):
        if "__pycache__" in path.parts:
            continue
        exe = executable_lines(path)
        hit = _hits.get(str(path), set()) & exe
        total_exec += len(exe)
        total_hit += len(hit)
        pct = 100.0 * len(hit) / len(exe) if exe else 100.0
        rows.append(
            {
                "file": str(path.relative_to(PKG_ROOT.parent)),
                "lines": len(exe),
                "hit": len(hit),
                "pct": round(pct, 1),
                "missing": sorted(exe - hit),
            }
        )
    total_pct = 100.0 * total_hit / total_exec if total_exec else 100.0

    if write_json:
        with open(PKG_ROOT.parent / ".linecov.json", "w") as f:
            json.dump(
                {"total_pct": round(total_pct, 2), "files": rows}, f, indent=1
            )

    worst = sorted(rows, key=lambda r: r["pct"])[:8]
    print("\n---------- linecov (audiotools_tpu, sys.monitoring) ----------")
    for r in worst:
        print(
            f"  {r['pct']:5.1f}%  {r['file']}  "
            f"({r['hit']}/{r['lines']}, first missing: {r['missing'][:4]})"
        )
    print(
        f"  TOTAL {total_pct:.2f}%  ({total_hit}/{total_exec} lines; "
        f"full per-file detail in .linecov.json)"
    )
    failed = fail_under is not None and total_pct < fail_under
    if failed:
        print(f"  FAIL: coverage {total_pct:.2f}% < --linecov-fail-under={fail_under}")
    return total_pct, failed
