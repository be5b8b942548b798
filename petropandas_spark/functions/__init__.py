"""Scalar-function layer: unit conversions, valence splits, stoichiometry
scores, bulk-rock chemistry — all as Catalyst-expression builders (no UDFs).
"""

from petropandas_spark.functions.conversions import (  # noqa: F401
    add_feo_to_fe2o3,
    add_fe2o3_to_feo,
    add_from_apfu,
    add_normalize,
    add_oxidize_moles,
    add_reduce_moles,
    add_to_apfu,
    add_to_apfu_by_charge,
    add_to_moles,
    add_to_oxides,
    moles_expr,
)
from petropandas_spark.functions.valence import (  # noqa: F401
    VALENCE_PAIRS,
    add_split_valence,
)
from petropandas_spark.functions.scores import (  # noqa: F401
    add_stoichiometry_scores,
)
