"""Source-hygiene gates (no Spark session needed).

These exist because pytest cannot catch a redefined test function:
the second ``def test_x`` silently shadows the first at module level
and the first never runs (round-2 post-mortem: the stronger
``test_foreach_row_sink`` exactness check was dead for a full round).
"""

import ast
import pathlib

TESTS = pathlib.Path(__file__).parent
PKG = TESTS.parent / "spark_streaming_join_example_spark"


def _top_level_defs(path):
    tree = ast.parse(path.read_text())
    return [
        n.name
        for n in tree.body
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef))
    ]


def test_no_duplicate_toplevel_names_in_tests():
    """F811 gate: a duplicated top-level def/class in a test module
    means a silently-dead test."""
    offenders = {}
    for path in sorted(TESTS.glob("test_*.py")):
        names = _top_level_defs(path)
        dupes = sorted({n for n in names if names.count(n) > 1})
        if dupes:
            offenders[path.name] = dupes
    assert not offenders, f"shadowed top-level names: {offenders}"


def test_no_duplicate_toplevel_names_in_package():
    """Same gate for the package: a redefined operator/query builder
    would silently replace its namesake."""
    offenders = {}
    for path in sorted(PKG.rglob("*.py")):
        names = _top_level_defs(path)
        dupes = sorted({n for n in names if names.count(n) > 1})
        if dupes:
            offenders[str(path.relative_to(PKG))] = dupes
    assert not offenders, f"shadowed top-level names: {offenders}"


def test_no_row_udf_outside_f1_surface():
    """Row-at-a-time ``F.udf`` is the slow path; the only sanctioned
    uses are the deliberate F1 surface demos in plans/udf_queries.py
    (which document their built-in twins).  Everything else must be
    JVM built-ins or Arrow-batched pandas UDFs."""
    allowed = {"plans/udf_queries.py"}
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        rel = str(path.relative_to(PKG))
        if rel in allowed:
            continue
        tree = ast.parse(path.read_text())
        for node in ast.walk(tree):
            if isinstance(node, ast.Call):
                fn = node.func
                # match F.udf(...) / functions.udf(...) / udf(...)
                name = (
                    fn.attr
                    if isinstance(fn, ast.Attribute)
                    else fn.id
                    if isinstance(fn, ast.Name)
                    else None
                )
                if name == "udf":
                    offenders.append(f"{rel}:{node.lineno}")
    assert not offenders, f"row-at-a-time udf outside F1 surface: {offenders}"
