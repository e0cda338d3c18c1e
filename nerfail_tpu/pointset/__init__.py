from nerfail_tpu.pointset.knn_build import knn_topk, build_index_and_dist
from nerfail_tpu.pointset.weights import gauss_weights
from nerfail_tpu.pointset.extract import extract_coord_maps, build_point_set

__all__ = [
    "knn_topk",
    "build_index_and_dist",
    "gauss_weights",
    "extract_coord_maps",
    "build_point_set",
]
