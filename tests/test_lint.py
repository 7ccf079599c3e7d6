"""Lint gate: no shadowed top-level definitions (ruff F811 equivalent).

Round 3 shipped two pairs of duplicate test functions in
``test_beam_loop.py`` — Python silently keeps the later definition, so
the newer variants were dead code and the gate never ran them.  No ruff
in this image, so this AST walk is the F811 check (VERDICT r3 task 6).
"""
import ast
import glob
import os

ROOT = os.path.join(os.path.dirname(__file__), os.pardir)


def _py_files():
    paths = glob.glob(os.path.join(os.path.dirname(__file__), "*.py"))
    paths += glob.glob(os.path.join(ROOT, "attention_lvcsr_tpu", "**",
                                    "*.py"), recursive=True)
    paths += glob.glob(os.path.join(ROOT, "tools", "*.py"))
    paths += [os.path.join(ROOT, "bench.py"),
              os.path.join(ROOT, "__graft_entry__.py")]
    return sorted(p for p in paths if os.path.exists(p))


def test_no_shadowed_toplevel_definitions():
    problems = []
    for path in _py_files():
        with open(path) as f:
            tree = ast.parse(f.read(), filename=path)
        seen = {}
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                if node.name in seen:
                    problems.append(
                        f"{os.path.relpath(path, ROOT)}:{node.lineno} "
                        f"redefines {node.name!r} "
                        f"(first defined at line {seen[node.name]})")
                seen[node.name] = node.lineno
    assert not problems, "shadowed definitions:\n" + "\n".join(problems)
