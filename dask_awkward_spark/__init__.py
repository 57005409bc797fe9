"""dask_awkward_spark — a PySpark-native nested-data analytics engine.

Brand-new engine with the query/data-processing capabilities of
``dask-contrib/dask-awkward`` (reference surveyed in SURVEY.md), built
Spark-first: every operator compiles to DataFrame/Column expressions so
Catalyst (pruning, pushdown, codegen, AQE) does the optimization the
reference implements by hand.
"""

from .core import (
    NestedArray,
    Record,
    Scalar,
    align_many,
    from_column,
    from_lists,
    partition_compatibility,
)
from .session import get_spark, load_tables
from .plans import explain_str, necessary_columns, pushed_filters
from . import behaviors, types
from .operators import reducers, structure
from .operators.structure import (
    argcartesian,
    argcombinations,
    argsort,
    cartesian,
    combinations,
    concatenate,
    drop_none,
    fill_none,
    firsts,
    flatten,
    full_like,
    is_none,
    isclose,
    local_index,
    mask,
    nan_to_num,
    num,
    ones_like,
    pad_none,
    ravel,
    run_lengths,
    singletons,
    sort,
    sort0,
    unflatten,
    unzip,
    values_astype,
    where,
    zeros_like,
    zip,
)
from .operators.reducers import (
    all,
    any,
    argmax,
    argmin,
    corr,
    count,
    count_nonzero,
    covar,
    linear_fit,
    max,
    mean,
    min,
    moment,
    prod,
    ptp,
    softmax,
    std,
    sum,
    var,
)

__version__ = "0.1.0"
