"""Attack evaluation (L5): ASR + imperceptibility metrics.

Parity surface: `util/other_utils.py:15-101` (eval_ASR). Per batch:
run the attack, accumulate KNNDist(k=4), uniform_loss, CurvStdDist(k=4)
on the adversarial clouds, and the ASR numerator/denominator
(clean-correct ∧ adv-wrong) / clean-correct.

TPU design: one jitted ``_metrics`` program covers the clean/adv forward
passes and all three imperceptibility metrics; only per-batch scalar
accumulators cross to the host. Under a device mesh the same function is
sharded over batch and the scalars are psum'd (`hitadv_tpu.parallel`).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hitadv_tpu import losses
from hitadv_tpu.utils.logging import timestamped_logger


@functools.partial(jax.jit, static_argnums=(0, 5))
def _batch_metrics(logits_fn, ori_xyz, adv_xyz, ori_normal, labels,
                   uniform_k: int):
    """All per-batch eval quantities in one XLA program."""
    knn_d = jnp.mean(losses.knn_dist(adv_xyz, k=4))
    uni_d = losses.uniform_loss(adv_xyz, k=uniform_k)
    if adv_xyz.shape[1] == ori_xyz.shape[1]:
        curv_d = jnp.mean(losses.curv_std_dist(ori_xyz, adv_xyz,
                                               ori_normal, k=4))
    else:
        # point-dropping attacks return fewer points; CurvStdDist is
        # undefined across different-sized clouds (the reference's
        # `util/dist_utils.py:472-475` would crash — its eval only ever
        # ran HiT-ADV). Report NaN rather than a made-up number.
        curv_d = jnp.nan
    ori_pred = jnp.argmax(logits_fn(ori_xyz), axis=-1)
    adv_pred = jnp.argmax(logits_fn(adv_xyz), axis=-1)
    mask_ori = ori_pred == labels
    mask_adv = adv_pred == labels
    at_denom = jnp.sum(mask_ori)
    at_num = at_denom - jnp.sum(mask_ori & mask_adv)
    adv_correct = jnp.sum(mask_adv)    # surfaced as adv_accuracy
    return knn_d, uni_d, curv_d, at_num, at_denom, adv_correct


def eval_asr(logits_fn: Callable,
             attack_fn: Callable,
             batches: Iterable[Tuple[np.ndarray, np.ndarray]],
             key: Optional[jax.Array] = None,
             uniform_k: int = 5,
             log_dir: Optional[str] = None,
             verbose: bool = True,
             progress: Optional[object] = None) -> Dict[str, float]:
    """Evaluate Attack Success Rate over a dataset.

    Args:
      logits_fn: victim, ``[B, N, 3] -> [B, C]`` (params already bound).
      attack_fn: ``(points [B, N, 3 or 6], labels, key) -> AttackResult``.
      batches: iterable of ``(points [B, N, 3|6] np, labels [B] np)``.
      key: PRNG key threaded through per-batch attack randomness.
      uniform_k: k of the uniformity metric (`eval.py` --k, default 5).
      progress: optional `utils.training_aux.EvalProgress` — resumes a
        preempted sweep (skips completed batches, restores accumulators,
        checkpoints after each batch). No reference equivalent.
    Returns:
      dict with asr, knn_dist, uniform_dist, curv_std_dist, success_rate.
    """
    logger = (timestamped_logger(log_dir) if log_dir else None)
    if key is None:
        key = jax.random.PRNGKey(0)

    knn_sum = uni_sum = curv_sum = 0.0
    at_num = at_denom = 0.0
    adv_correct = total = 0.0
    n_batches = 0
    skip_until = 0
    if progress is not None and progress.next_batch > 0:
        acc = progress.accumulators()
        knn_sum = acc.get("knn_sum", 0.0)
        uni_sum = acc.get("uni_sum", 0.0)
        curv_sum = acc.get("curv_sum", 0.0)
        at_num = acc.get("at_num", 0.0)
        at_denom = acc.get("at_denom", 0.0)
        adv_correct = acc.get("adv_correct", 0.0)
        total = acc.get("total", 0.0)
        n_batches = int(acc.get("n_batches", 0))
        skip_until = progress.next_batch

    for batch_index, (points, labels) in enumerate(batches):
        key, sub = jax.random.split(key)
        if batch_index < skip_until:
            continue
        points = jnp.asarray(points, jnp.float32)
        labels = jnp.asarray(labels, jnp.int32)

        result = attack_fn(points, labels, sub)

        ori_xyz = points[..., :3]
        ori_normal = (points[..., 3:6] if points.shape[-1] >= 6
                      else jnp.zeros_like(ori_xyz))
        knn_d, uni_d, curv_d, num, denom, correct = _batch_metrics(
            logits_fn, ori_xyz, result.adv_points, ori_normal, labels,
            uniform_k)

        knn_sum += float(knn_d)
        uni_sum += float(uni_d)
        curv_sum += float(curv_d)
        at_num += float(num)
        at_denom += float(denom)
        adv_correct += float(correct)
        total += float(labels.shape[0])
        n_batches += 1
        if verbose and logger:
            logger.info(f"batch {n_batches}: attack success "
                        f"{int(result.success_num)}/{labels.shape[0]}")
        if progress is not None:
            progress.update(batch_index, {
                "knn_sum": knn_sum, "uni_sum": uni_sum,
                "curv_sum": curv_sum, "at_num": at_num,
                "at_denom": at_denom, "adv_correct": adv_correct,
                "total": total, "n_batches": n_batches,
            })

    metrics = {
        "asr": at_num / (at_denom + 1e-9),
        "knn_dist": knn_sum / max(n_batches, 1),
        "uniform_dist": uni_sum / max(n_batches, 1),
        "curv_std_dist": curv_sum / max(n_batches, 1),
        "adv_accuracy": adv_correct / max(total, 1.0),
        "clean_correct": at_denom,
        "total": total,
    }
    if logger:
        logger.info(f"Overall attack success rate: {metrics['asr']}")
        logger.info(f"Overall KNN dist: {metrics['knn_dist']}")
        logger.info(f"Overall Uniform dist: {metrics['uniform_dist']}")
        logger.info(f"Overall CurvStd dist: {metrics['curv_std_dist']}")
    return metrics
