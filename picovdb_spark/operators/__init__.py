from picovdb_spark.operators.similarity import batch_query, query_one, knn_join, knn_join_blocked
from picovdb_spark.operators.topk import topk_per_query

__all__ = ["batch_query", "query_one", "knn_join", "knn_join_blocked", "topk_per_query"]
