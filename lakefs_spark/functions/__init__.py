from lakefs_spark.functions.ident import (  # noqa: F401
    fnv64a,
    identity_hex,
    typed_hash_hex,
)
from lakefs_spark.functions.prefix import (  # noqa: F401
    prefix_predicate,
    upper_bound_for_prefix,
)
