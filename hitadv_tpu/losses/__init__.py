"""Attack math (L3): adversarial losses, distance losses, clip ops.

Pure-function equivalents of the reference's `util/adv_utils.py`,
`util/set_distance.py`, `util/dist_utils.py`, `util/clip_utils.py` and the
GeoA3 loss zoo (`FGM/GeoA3_args.py:113-425`). All functions are jit/vmap
friendly, return per-example ``[B]`` losses unless noted, and avoid any
host synchronization.
"""

from hitadv_tpu.losses.adversarial import (  # noqa: F401
    cross_entropy_loss,
    logits_adv_loss,
    smoothed_cross_entropy_loss,
    untargeted_logits_adv_loss,
)
from hitadv_tpu.losses.distance import (  # noqa: F401
    chamfer_dist,
    chamfer_knn_dist,
    curv_dist,
    curv_std_dist,
    far_chamfer_dist,
    farthest_dist,
    get_kappa,
    get_kappa_adv,
    get_kappa_std,
    hausdorff_dist,
    knn_dist,
    l2_chamfer_dist,
    l2_dist,
    laplacian_dist,
    normalize_flatten_features,
    lpips_distance,
)
from hitadv_tpu.losses.clip import (  # noqa: F401
    clip_points_l2,
    clip_points_linf,
    project_inner_clip_linf,
    project_inner_points,
)
from hitadv_tpu.losses.geoa3 import (  # noqa: F401
    chamfer_loss,
    corresponding_normal_loss,
    curvature_loss,
    displacement_loss,
    distance_kmean_loss,
    estimate_normal,
    estimate_perpendicular,
    hausdorff_loss,
    jitter_input,
    knn_smoothing_loss,
    norm_l2_loss,
    pseudo_chamfer_loss,
    repulsion_loss,
    uniform_loss,
)
