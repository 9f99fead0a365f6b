"""Docstring examples run as tests — the analogue of the reference's
``--doctest-modules`` strategy (pytest.ini:4; SURVEY.md §5.4).

Doctests here need a live SparkSession, which stock --doctest-modules
can't inject, so this runner collects doctests from the package modules
and executes them with `spark` plus the full public API in globals.
"""

import doctest
import importlib

MODULES = [
    "siuba_spark.operators.core",
    "siuba_spark.operators.grouping",
    "siuba_spark.operators.joins",
    "siuba_spark.operators.reshape",
    "siuba_spark.functions.vector",
    "siuba_spark.functions.forcats",
    "siuba_spark.siu.format",
    "siuba_spark.siu.calls",
]


def test_doctests(spark):
    import siuba_spark

    globs = {"spark": spark}
    for name in siuba_spark.__all__:
        globs[name] = getattr(siuba_spark, name)

    finder = doctest.DocTestFinder(exclude_empty=True)
    runner = doctest.DocTestRunner(
        optionflags=doctest.NORMALIZE_WHITESPACE | doctest.ELLIPSIS)
    ran = 0
    for mod_name in MODULES:
        mod = importlib.import_module(mod_name)
        for test in finder.find(mod):
            if not test.examples:
                continue
            test.globs.update(globs)
            runner.run(test)
            ran += len(test.examples)
    results = runner.summarize(verbose=False)
    assert results.failed == 0, f"{results.failed} doctest failures (see stdout)"
    assert ran >= 20, f"expected ≥20 doctest examples, found {ran}"
