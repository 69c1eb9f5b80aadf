from gags_tpu.knn.knn import mean_knn_sq_dist, knn_sq_dists

__all__ = ["mean_knn_sq_dist", "knn_sq_dists"]
