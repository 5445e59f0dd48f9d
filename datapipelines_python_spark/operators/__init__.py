"""Analytics operator layer (SURVEY.md §2B).

Each module registers operators with
``datapipelines_python_spark.registry.query`` on import; the registry's
``_OPERATOR_MODULES`` list drives loading.

Importing ANY operator module (``from ...operators.aggregations import
agg_groupby``) first runs this package ``__init__``, which eagerly loads
the full canonical module list — so registration order (and therefore the
driver's "first N registered" correctness slice, where the diag probes
must sit) never depends on which module a caller happens to touch first.
``_ensure_loaded`` is reentrancy-guarded, so the canonical load proceeds
in ``_OPERATOR_MODULES`` order even though each module import re-enters
this ``__init__``.
"""

from datapipelines_python_spark.registry import _ensure_loaded

_ensure_loaded()
