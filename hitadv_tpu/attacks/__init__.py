"""Attack engines (L4): every attack compiles to one XLA program.

The reference runs each attack as a Python loop of small CUDA launches
with a host sync per iteration (`CW/Perturb.py:95-173`,
`ShapeAttack/HiT_ADV.py:156-261`). Here the whole attack — inner
optimizer loop, outer binary search, per-example best-result
bookkeeping — is traced once: loops are ``lax.scan``/``fori_loop``,
bookkeeping is masked ``jnp.where`` updates on carried arrays, and the
only host transfer is the final result.

Factory convention: ``make_<attack>(logits_fn, cfg) -> attack_fn`` where
``logits_fn: [B, N, 3] -> [B, num_classes]`` is the victim (already
bound to its params) and ``attack_fn(points, labels, key) ->
AttackResult``. The returned function is jit-compiled.
"""

from hitadv_tpu.attacks.base import AttackResult, make_adv_fn  # noqa: F401
from hitadv_tpu.attacks.fgm import (  # noqa: F401
    make_fgm_l2,
    make_fgsm,
    make_fgsm_rs,
    make_ifgm_l2,
    make_ifgsm,
    make_mifgsm,
    make_pgd,
)
from hitadv_tpu.attacks.cw import (  # noqa: F401
    CWConfig,
    CWKNNConfig,
    make_cw_knn,
    make_cw_perturb,
)
from hitadv_tpu.attacks.hit_adv import HiTADVConfig, make_hit_adv  # noqa: F401
from hitadv_tpu.attacks.aof import AOFConfig, make_aof  # noqa: F401
from hitadv_tpu.attacks.advpc import AdvPCConfig, make_advpc  # noqa: F401
from hitadv_tpu.attacks.drop import (  # noqa: F401
    DropConfig,
    make_saliency_drop,
    make_sat_forward,
)
from hitadv_tpu.attacks.add import (  # noqa: F401
    AddClusterConfig,
    AddConfig,
    AddObjectConfig,
    get_critical_points,
    make_cw_add,
    make_cw_add_clusters,
    make_cw_add_objects,
)
from hitadv_tpu.attacks.geoa3 import GeoA3Config, make_geoa3  # noqa: F401,E402
