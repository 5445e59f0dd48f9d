"""Analytics operator layer (SURVEY.md §2B).

Each module registers operators with
``datapipelines_python_spark.registry.query`` on import; the registry's
``_OPERATOR_MODULES`` list drives loading.
"""
