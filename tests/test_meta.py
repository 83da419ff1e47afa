"""Suite-structure invariants.

The suite is two-tier (pyproject.toml markers; the reference splits the
same way with nose ``@attr('slow')``, SURVEY.md §4): the default/CI run
takes everything, iteration runs ``-m "not slow"``. The fast tier must
never lose parity coverage — every committed executed-reference golden
has to stay exercised by a non-slow test.
"""

import ast
import pathlib
import re

TESTS = pathlib.Path(__file__).parent


def _slow_names(tree):
    """Names marked slow in a test module: 'module' if the whole module is,
    else the slow-decorated test classes/functions."""

    def is_slow_marker(node):
        # pytest.mark.slow — as decorator or pytestmark element
        return "slow" in ast.dump(node) and "mark" in ast.dump(node)

    slow = set()
    for node in tree.body:
        if isinstance(node, ast.Assign) and any(
            getattr(t, "id", None) == "pytestmark" for t in node.targets
        ):
            if is_slow_marker(node.value):
                slow.add("module")
        if isinstance(node, (ast.FunctionDef, ast.ClassDef)):
            if any(is_slow_marker(d) for d in node.decorator_list):
                slow.add(node.name)
    return slow


def test_fast_tier_covers_every_parity_golden():
    """Every golden_*.npz is referenced from a test file that still has
    non-slow tests, so ``-m "not slow"`` retains full parity coverage.

    Granularity is per FILE (goldens are often loaded in fixtures/f-strings,
    e.g. ``golden_resample_{name}.npz``, so per-function source matching
    would miss fixture-driven tests): a file covers a golden when its
    source contains a literal ``golden_...`` fragment that prefixes the
    filename AND the file is not entirely slow-marked. This catches the
    realistic regression — marking a whole parity module slow.
    """
    goldens = sorted(p.name for p in (TESTS / "resources").glob("golden_*.npz"))
    assert len(goldens) >= 18, goldens

    covered = dict.fromkeys(goldens, False)
    for py in sorted(TESTS.glob("test_*.py")):
        src = py.read_text()
        tree = ast.parse(src)
        slow = _slow_names(tree)
        if "module" in slow:
            continue
        test_units = [
            n.name
            for n in tree.body
            if isinstance(n, (ast.FunctionDef, ast.ClassDef))
            and n.name.lower().startswith("test")
        ]
        if test_units and all(n in slow for n in test_units):
            continue  # every test in the file is slow-marked
        fragments = set(re.findall(r"golden_[a-zA-Z0-9_.-]*", src))
        for g in goldens:
            if any(len(f) > len("golden_") and g.startswith(f.removesuffix(".npz"))
                   for f in fragments):
                covered[g] = True

    missing = [g for g, ok in covered.items() if not ok]
    assert not missing, f"goldens with no fast-tier coverage: {missing}"
