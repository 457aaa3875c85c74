from heritrix_spark.functions.canonicalize import (  # noqa: F401
    canonicalize_col,
    canonicalize_py,
    canonicalize_sql,
)
from heritrix_spark.functions.surt import (  # noqa: F401
    class_key_col,
    class_key_py,
    class_key_sql,
    surt_col,
    surt_py,
    surt_sql,
)
from heritrix_spark.functions.hops import (  # noqa: F401
    hop_count_col,
    link_hops_col,
    trans_hops_col,
)
