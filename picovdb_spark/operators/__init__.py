from picovdb_spark.operators.similarity import batch_query, query_one, knn_join
from picovdb_spark.operators.topk import topk_per_query

__all__ = ["batch_query", "query_one", "knn_join", "topk_per_query"]
