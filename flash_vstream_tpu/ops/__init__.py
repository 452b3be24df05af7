from .distances import (
    cosine_similarity,
    cosine_similarity_matrix,
    euclidean_distance,
    l2_normalize,
    sq_euclidean_distance,
)
from .kmeans import (
    KMeansResult,
    init_centroids,
    pca_project,
    pca_weighted_kmeans_ordered,
    weighted_kmeans,
    weighted_kmeans_ordered,
)
from .ntm import NTMParams, init_ntm_params, ntm_compress, ntm_update
from .pooling import merge_2x2_tokens, qwen_temporal_pool, spatial_pool
from .retrieval import dam_retrieve, retrieve_nearest_frames, star_retrieve, topk_by_weight
from .sequential import (
    SeqCompressResult,
    TimedSeqResult,
    drop_frames,
    drop_frames_timed,
    k_drop_frames,
    k_merge_frames,
    merge_frames,
    merge_frames_timed,
    sample_frames,
)

__all__ = [
    "cosine_similarity", "cosine_similarity_matrix", "euclidean_distance",
    "l2_normalize", "sq_euclidean_distance",
    "KMeansResult", "init_centroids", "pca_project",
    "pca_weighted_kmeans_ordered", "weighted_kmeans", "weighted_kmeans_ordered",
    "NTMParams", "init_ntm_params", "ntm_compress", "ntm_update",
    "merge_2x2_tokens", "qwen_temporal_pool", "spatial_pool",
    "dam_retrieve", "retrieve_nearest_frames", "star_retrieve", "topk_by_weight",
    "SeqCompressResult", "TimedSeqResult", "drop_frames", "drop_frames_timed",
    "k_drop_frames", "k_merge_frames", "merge_frames", "merge_frames_timed",
    "sample_frames",
]
