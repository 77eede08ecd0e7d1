from picovdb_spark.functions.vector import (
    l2_norm,
    l2_normalize,
    dot,
    cosine,
    auto_id,
    assert_dim,
)

__all__ = ["l2_norm", "l2_normalize", "dot", "cosine", "auto_id", "assert_dim"]
