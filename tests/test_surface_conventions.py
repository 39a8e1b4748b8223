"""Static enforcement of the two NULL-handling conventions round 8 had to
retrofit (qsamp NULL-text, NULL-domain join), so the NEXT leg cannot
re-introduce the class:

1. **No count-of-raw-tokenize.**  Spark's non-ANSI ``size(NULL)`` is -1
   and DuckDB's ``len(NULL)`` is NULL, so a token COUNT computed directly
   over a tokenize of raw ``text`` silently diverges cross-engine (and
   poisons downstream ratios in-engine) the moment a NULL document
   appears.  Every ``size(...)``/``len(...)`` whose argument inlines
   ``lower(text)`` must coalesce: ``lower(coalesce(text, ''))``.

   Scope note: the rule is count-scoped and inline-scoped on purpose.
   Tokenize feeding ``explode``/``unnest`` is NULL-robust by construction
   (NULL array -> no rows on both engines), and alias-indirected counts
   (``size(toks)`` where ``toks`` came from a CTE) are guarded by CASE
   branches that the dynamic gate pins -- every documents/events entry is
   replayed over NULL/edge rows by tests/test_adversarial_corpus.py, which
   is the backstop for everything this static pass cannot see.

2. **Domain-keyed joins are null-safe.**  ``mix_domains`` /
   ``temperature_mix`` join per-domain count tables back on the domain
   column; a plain ``==`` silently drops every NULL-domain row (the r8
   artifact).  Any ``F.col(domain_col) ==`` comparison in sampling.py is
   a violation -- the convention is ``eqNullSafe``.

Both checkers are themselves tested against deliberately-broken snippets
so a regex rot can't quietly turn the gate off.
"""

from __future__ import annotations

import inspect
import re

from nyc_taxi_dataset_analysis_apache_hive_spark import registry, registry_sql
from nyc_taxi_dataset_analysis_apache_hive_spark.operators import sampling

#: tokenize-of-raw-text marker: ``lower(text)`` / ``lower(text,`` with
#: arbitrary whitespace, NOT preceded by coalesce (the coalesced spelling
#: is ``lower(coalesce(text, ''))``, which this regex cannot match).
_RAW_TEXT = re.compile(r"lower\s*\(\s*text\s*[),]")

_COUNT_FN = re.compile(r"\b(size|len)\s*\(", re.IGNORECASE)


def _balanced_arg(s: str, open_idx: int) -> str:
    """Return the balanced-paren argument starting at s[open_idx] == '('."""
    depth = 0
    for i in range(open_idx, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return s[open_idx : i + 1]
    return s[open_idx:]  # unbalanced (mid-fragment): take the rest


def count_of_raw_tokenize(sql: str) -> list[str]:
    """Every size()/len() argument that inlines a raw ``lower(text)``."""
    hits = []
    for m in _COUNT_FN.finditer(sql):
        arg = _balanced_arg(sql, m.end() - 1)
        if _RAW_TEXT.search(arg):
            hits.append(f"{m.group(1)}({arg[1:80]}...")
    return hits


def test_no_count_of_raw_tokenize_in_any_sql_surface():
    """Rule 1 over BOTH SQL surfaces: the Spark SQL-text mode and the
    DuckDB oracle of every registry entry."""
    bad = {}
    for name, sql in sorted(registry_sql.SQL_QUERIES.items()):
        hits = count_of_raw_tokenize(sql)
        if hits:
            bad[f"sql:{name}"] = hits
    for name, sql in sorted(registry.ORACLES.items()):
        hits = count_of_raw_tokenize(sql)
        if hits:
            bad[f"oracle:{name}"] = hits
    assert not bad, f"count-of-raw-tokenize sites (coalesce text): {bad}"


def test_checker_catches_a_broken_leg():
    """The r8 bug shape itself must trip the checker (guards regex rot)."""
    broken = "SELECT CAST(size(filter(split(lower(text), '[^a-z]+'), x -> x != '')) AS BIGINT) AS n FROM documents"
    assert count_of_raw_tokenize(broken)
    broken_duck = "SELECT len(string_split_regex(lower(text), '\\s+')) FROM documents"
    assert count_of_raw_tokenize(broken_duck)
    fixed = broken.replace("lower(text)", "lower(coalesce(text, ''))")
    assert not count_of_raw_tokenize(fixed)
    # explode is out of scope by design (NULL-robust on both engines)
    assert not count_of_raw_tokenize(
        "SELECT explode(filter(split(lower(text), '[^a-z]+'), x -> x != ''))"
    )


def test_domain_joins_in_sampling_are_null_safe():
    """Rule 2: no plain equality against the domain column in sampling.py
    (join keys must use eqNullSafe), and the two mix operators actually
    carry an eqNullSafe join."""
    src = inspect.getsource(sampling)
    plain_eq = re.findall(r"F\.col\(domain_col\)\s*==", src)
    assert not plain_eq, "plain == on domain_col: use eqNullSafe"
    # __mix_dom is the broadcast count-table key: every join line on it
    # must be null-safe
    for line in src.splitlines():
        if "__mix_dom" in line and "==" in line and "eqNullSafe" not in line:
            raise AssertionError(f"non-null-safe __mix_dom join: {line.strip()}")
    assert src.count("eqNullSafe") >= 2  # mix_domains + temperature_mix


def test_domain_checker_catches_a_broken_join():
    """Self-test for rule 2's pattern on a synthetic bad line."""
    bad = 'df.join(F.broadcast(counts), F.col(domain_col) == F.col("__mix_dom"))'
    assert re.search(r"F\.col\(domain_col\)\s*==", bad)


# ---------------------------------------------------------------------------
# Rule 3 (r12, the r11 retrieval.py miss): no unwired operator modules.
# Round 11 shipped operators/retrieval.py wired to NOTHING -- no registry
# leg, no oracle, no test imported it -- while its docstring claimed a
# driver gate.  This gate makes that state a test failure: every public
# module under operators/ must be IMPORTED (ast-level, not grepped prose)
# by at least one registry/entry surface or one test file.
# ---------------------------------------------------------------------------

import ast
import pathlib

_PKG = pathlib.Path(registry.__file__).resolve().parent.parent
_REPO = _PKG.parent


def _imported_operator_modules(py_path: pathlib.Path) -> set[str]:
    """Operator module names a file imports: ``from ...operators import
    a, b``, ``from ...operators.a import f``, or ``import ...operators.a``."""
    try:
        tree = ast.parse(py_path.read_text())
    except SyntaxError:  # pragma: no cover - never expected
        return set()
    mods: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module:
            parts = node.module.split(".")
            if parts[-1] == "operators":
                mods.update(a.name for a in node.names)
            elif "operators" in parts:
                mods.add(parts[parts.index("operators") + 1])
        elif isinstance(node, ast.Import):
            for a in node.names:
                parts = a.name.split(".")
                if "operators" in parts[:-1]:
                    mods.add(parts[parts.index("operators") + 1])
    return mods


def test_every_operator_module_is_wired_to_a_surface_or_test():
    op_dir = _PKG / "operators"
    public = {
        p.stem
        for p in op_dir.glob("*.py")
        if p.stem != "__init__"
    }
    consumers: set[str] = set()
    surfaces = (
        list((_PKG / "registry").glob("*.py"))
        + [_PKG / "registry_sql.py"]
        + [_REPO / "__spark_entry__.py", _REPO / "bench.py"]
        + list((_REPO / "tests").glob("test_*.py"))
        + list(_PKG.glob("streaming/*.py"))
    )
    for f in surfaces:
        if f.exists():
            consumers |= _imported_operator_modules(f)
    unwired = sorted(public - consumers)
    assert not unwired, (
        f"operator modules imported by no registry surface and no test "
        f"(the r11 retrieval.py failure mode): {unwired}"
    )
    # an import alone is not wiring: r11's registry imported retrieval
    # for its CONSTANTS while no test touched the operator -- so every
    # module must ALSO be imported by at least one test file directly
    test_consumers: set[str] = set()
    for f in (_REPO / "tests").glob("test_*.py"):
        test_consumers |= _imported_operator_modules(f)
    untested = sorted(public - test_consumers)
    assert not untested, (
        f"operator modules imported by no test file directly: {untested}"
    )


def test_unwired_checker_catches_a_fresh_module(tmp_path):
    """Self-test: a file importing nothing from operators contributes no
    consumers, and the import collector sees all three import forms."""
    f = tmp_path / "t.py"
    f.write_text(
        "from nyc_taxi_dataset_analysis_apache_hive_spark.operators import aaa\n"
        "from nyc_taxi_dataset_analysis_apache_hive_spark.operators.bbb import x\n"
        "import nyc_taxi_dataset_analysis_apache_hive_spark.operators.ccc\n"
    )
    assert _imported_operator_modules(f) == {"aaa", "bbb", "ccc"}
    g = tmp_path / "none.py"
    g.write_text("import os\n")
    assert _imported_operator_modules(g) == set()
