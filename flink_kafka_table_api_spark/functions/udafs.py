"""Arrow-batched Pandas UDAFs (grouped-aggregate UDF surface).

NOTE: no `from __future__ import annotations` here — pandas_udf resolves
real type hints, and postponed evaluation turns them into strings it
cannot parse.
"""

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


# DoubleType() instance, not the "double" DDL string: string return types are
# parsed via the active SparkContext, which would make this module
# unimportable before a session exists.
@pandas_udf(DoubleType())
def pd_median(v: pd.Series) -> float:
    """Exact median per group (linear interpolation for even counts —
    matches SQL quantile_cont(0.5))."""
    return float(np.median(v))
