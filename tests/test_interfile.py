"""Python inter-file import resolution golden tests.

Mirrors the reference's resolver unit suite
(crates/indexer/src/analysis/languages/python/interfile.rs:219-400):
absolute imports against the root and the importing file's directory,
relative imports (same dir / parent dir / from ``__init__.py`` / dots-only),
module-file-over-package priority, case-insensitive tree lookups, and
nonexistent-module fallout. Here the whole resolution is one candidate
posexplode + file join inside ``pipeline/build.py`` — the assertions check
the resulting ``IMPORTED_SYMBOL_TO_FILE`` edges end-to-end.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

CORPUS = {
    # absolute package-module import + importing-dir fallback (interfile.rs
    # test_absolute_import_simple_module / _package_module)
    "src/main.py": "from package.module import ModClass\nfrom utils import util_fn\n",
    "src/utils.py": "def util_fn():\n    return 1\n",
    # relative same-directory import from __init__.py
    # (test_relative_import_from_init_py / _same_directory)
    "src/package/__init__.py": "from .module import ModClass\n",
    "src/package/module.py": (
        "from .subpackage.utils import sub_util\n\nclass ModClass:\n    pass\n"
    ),
    # dots-only import → parent package __init__ (test_relative_import_just_dots)
    "src/package/subpackage/__init__.py": "from .. import ModClass\n",
    # parent-directory relative import (test_relative_import_parent_directory)
    "src/package/subpackage/utils.py": (
        "from ..module import ModClass\n\ndef sub_util():\n    return 2\n"
    ),
    # case-insensitive lookup (test_case_insensitive_matching)
    "rootmod.py": "from casetest import case_fn\nimport missing_module\n",
    "CaseTest.py": "def case_fn():\n    return 3\n",
    # package-parent root: `from package.module import X` in tests/ with the
    # package under src/ — compute_root_dirs (types.rs:659-682) adds src/ as
    # a search root because src/package/__init__.py exists
    "tests/test_main.py": "from package.module import ModClass\n",
    # module file beats package __init__ at the same search path
    # (interfile.rs:144-150 ordering)
    "prio.py": "import dual\n",
    "dual.py": "def in_module():\n    return 4\n",
    "dual/__init__.py": "def in_package():\n    return 5\n",
}


@pytest.fixture(scope="module")
def interfile_graph(spark, tmp_path_factory):
    from knowledge_graph_spark.pipeline.indexer import index_repository

    root = tmp_path_factory.mktemp("interfile-repo")
    for rel, content in CORPUS.items():
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(content)
    out = str(tmp_path_factory.mktemp("interfile-out"))
    kg, _ = index_repository(spark, str(root), out_dir=out, repository_name="interfile")
    return kg


@pytest.fixture(scope="module")
def imp_file_pairs(interfile_graph):
    kg = interfile_graph
    imp_file = kg.edges["imported_symbol_relationships"].filter(
        F.col("type") == "IMPORTED_SYMBOL_TO_FILE"
    )
    resolved = (
        imp_file.join(
            kg.imports.select(
                F.col("id").alias("source_id"),
                "import_path",
                F.col("file_path").alias("from_file"),
            ),
            "source_id",
        ).join(
            kg.files.select(F.col("id").alias("target_id"), F.col("path").alias("to_file")),
            "target_id",
        )
    )
    return {(r.from_file, r.import_path, r.to_file) for r in resolved.collect()}


def test_absolute_import_via_importing_dir(imp_file_pairs):
    # 'package.module' has no root-level match; resolves from src/main.py's dir
    assert ("src/main.py", "package.module", "src/package/module.py") in imp_file_pairs
    assert ("src/main.py", "utils", "src/utils.py") in imp_file_pairs


def test_relative_same_directory_from_init(imp_file_pairs):
    assert (
        "src/package/__init__.py",
        ".module",
        "src/package/module.py",
    ) in imp_file_pairs


def test_relative_nested_path(imp_file_pairs):
    assert (
        "src/package/module.py",
        ".subpackage.utils",
        "src/package/subpackage/utils.py",
    ) in imp_file_pairs


def test_relative_parent_directory(imp_file_pairs):
    assert (
        "src/package/subpackage/utils.py",
        "..module",
        "src/package/module.py",
    ) in imp_file_pairs


def test_relative_just_dots_targets_package_init(imp_file_pairs):
    assert (
        "src/package/subpackage/__init__.py",
        "..",
        "src/package/__init__.py",
    ) in imp_file_pairs


def test_case_insensitive_matching(imp_file_pairs):
    assert ("rootmod.py", "casetest", "CaseTest.py") in imp_file_pairs


def test_package_parent_root_resolution(imp_file_pairs):
    """compute_root_dirs (types.rs:659-682): src/ is a search root because
    src/package/__init__.py exists, so tests/test_main.py's absolute import
    resolves into src/package/module.py."""
    assert (
        "tests/test_main.py",
        "package.module",
        "src/package/module.py",
    ) in imp_file_pairs


def test_module_file_beats_package_init(imp_file_pairs):
    # interfile.rs:144-150: per search path, '{mod}.py' precedes
    # '{mod}/__init__.py'; the single winning edge targets the module file
    assert ("prio.py", "dual", "dual.py") in imp_file_pairs
    assert ("prio.py", "dual", "dual/__init__.py") not in imp_file_pairs


def test_nonexistent_module_unresolved(imp_file_pairs):
    # test_import_nonexistent_module: no edge at all for a missing target
    assert not any(p[1] == "missing_module" for p in imp_file_pairs)


def test_each_import_resolves_once(interfile_graph):
    # duplicate-removal twin (test_duplicate_removal): the candidate join
    # may hit several candidate paths but exactly one edge survives per import
    kg = interfile_graph
    imp_file = kg.edges["imported_symbol_relationships"].filter(
        F.col("type") == "IMPORTED_SYMBOL_TO_FILE"
    )
    dup = imp_file.groupBy("source_id").count().filter(F.col("count") > 1).count()
    assert dup == 0
