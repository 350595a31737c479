"""Geometry ops layer: pure-JAX reference backend + Pallas TPU kernels."""

from hitadv_tpu.ops.geometry import (  # noqa: F401
    KNNResult,
    farthest_point_sample,
    group_points,
    index_points,
    interpolate_weights,
    knn_gather,
    knn_indices,
    knn_point,
    knn_points,
    l2_normalize,
    median_points,
    pairwise_distance,
    query_ball_point,
    sample_and_group,
    sample_and_group_all,
    sample_and_group_knn,
    square_distance,
    three_interpolate,
    three_nn,
)
