"""Loss suite matching the reference semantics exactly (channels-last).

All functions take softmax *probabilities* (the decoder and supervision heads
already apply softmax, as in the reference) and integer targets, and are fully
jittable.

Sources:
  dice_loss / softmax_weighted_loss      utils/tools.py:8-34
  softmax_dice                           models/criterions.py:49-62
  get_separate_loss                      utils/tools.py:112-162
  get_edge_separate_loss                 utils/tools.py:165-235
  softmax_dice2 / sigmoid_dice /
  Generalized_dice / Dual_focal_loss     models/criterions.py:65-139
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

Array = jnp.ndarray

# Edge-label decode table (utils/tools.py:174-218): an 8-valued edge code per
# voxel; the positive set per region is
#   region 1 (NCR):       {1, 5, 6, 7}
#   region 2 (edema):     {2, 5, 6, 8}
#   region 4 (enhancing): {4, 5, 7, 8}
# i.e. code 5 = all three boundaries coincide, 6 = 1&2, 7 = 1&4, 8 = 2&4.
EDGE_POSITIVE_CODES = {"01": (1, 5, 6, 7), "02": (2, 5, 6, 8),
                       "04": (4, 5, 7, 8)}


def one_hot_last(target: Array, num_classes: int) -> Array:
    """(B, D, H, W) int -> (B, D, H, W, C) float one-hot."""
    return jax.nn.one_hot(target, num_classes, dtype=jnp.float32)


def dice_loss(probs: Array, target_onehot: Array, num_cls: int,
              eps: float = 1e-7) -> Array:
    """Soft dice over classes: 1 - mean_c 2*|p*t| / (|p|+|t|+eps)
    (utils/tools.py:8-18).  probs/target: (B, D, H, W, C)."""
    p = probs.astype(jnp.float32)
    t = target_onehot.astype(jnp.float32)
    num = jnp.sum(p * t, axis=(0, 1, 2, 3))
    l = jnp.sum(p, axis=(0, 1, 2, 3))
    r = jnp.sum(t, axis=(0, 1, 2, 3))
    dice = jnp.sum(2.0 * num / (l + r + eps))
    return 1.0 - dice / num_cls


def softmax_weighted_loss(probs: Array, target_onehot: Array,
                          num_cls: int) -> Array:
    """Class-frequency-weighted CE with prob clamp [0.005, 1]
    (utils/tools.py:21-34).  Weight per (sample, class) =
    1 - voxels_c / voxels_total."""
    p = probs.astype(jnp.float32)
    t = target_onehot.astype(jnp.float32)
    # (B, C): per-sample class frequencies
    per_class = jnp.sum(t, axis=(1, 2, 3))
    total = jnp.sum(t, axis=(1, 2, 3, 4), keepdims=False)[:, None]
    weighted = 1.0 - per_class / total                       # (B, C)
    logp = jnp.log(jnp.clip(p, 0.005, 1.0))
    cross = -(weighted[:, None, None, None, :] * t * logp)
    return jnp.mean(jnp.sum(cross, axis=-1))


def softmax_dice(probs: Array, target: Array) -> Array:
    """Main segmentation loss (criterions.py:49-62): soft dice + weighted CE
    on the 4-class one-hot target (labels {0,1,2,3}; BraTS 4 pre-mapped to 3
    by the data pipeline)."""
    t = one_hot_last(target, 4)
    return dice_loss(probs, t, 4) + softmax_weighted_loss(probs, t, 4)


def _binary_region_loss(probs2: Array, positive: Array) -> Array:
    """dice + weighted CE on a binary one-hot target (utils/tools.py:117-131)."""
    t = one_hot_last(positive.astype(jnp.int32), 2)
    return softmax_weighted_loss(probs2, t, 2) + dice_loss(probs2, t, 2)


def get_separate_loss(outputs: Dict[str, Array], target: Array) -> Array:
    """Per-region auxiliary loss (utils/tools.py:112-162): each region head is
    supervised with a binarized target (label r vs rest)."""
    loss = _binary_region_loss(outputs["01"], target == 1)
    loss += _binary_region_loss(outputs["02"], target == 2)
    loss += _binary_region_loss(outputs["04"], target == 3)
    return loss


def get_edge_separate_loss(outputs: Dict[str, Array], edge: Array) -> Array:
    """Per-region edge auxiliary loss (utils/tools.py:165-235): decodes the
    8-valued composite edge label into a per-region binary boundary target."""
    loss = jnp.asarray(0.0, jnp.float32)
    for key, codes in EDGE_POSITIVE_CODES.items():
        positive = jnp.zeros(edge.shape, dtype=bool)
        for c in codes:
            positive |= edge == c
        loss += _binary_region_loss(outputs[key], positive)
    return loss


def total_loss(outputs, target: Array, edge: Array,
               criterion=softmax_dice) -> Dict[str, Array]:
    """Full training objective (train.py:206-212): main loss + final/mid
    region and edge auxiliary losses.  Returns all components for logging."""
    seg, sup, edge_sup, mid_sup, mid_edge_sup = outputs
    main = criterion(seg, target)
    if isinstance(main, tuple):
        # the alternate criterions return (loss, dice1, dice2, dice3) like
        # the reference's (train.py:206 unpacks loss only)
        main = main[0]
    s_loss = get_separate_loss(sup, target)
    e_loss = get_edge_separate_loss(edge_sup, edge)
    mid_s_loss = get_separate_loss(mid_sup, target)
    mid_e_loss = get_edge_separate_loss(mid_edge_sup, edge)
    total = main + s_loss + e_loss + mid_s_loss + mid_e_loss
    return {"loss": total, "end_loss": main, "s_loss": s_loss,
            "edge_loss": e_loss, "mid_s_loss": mid_s_loss,
            "mid_edge_loss": mid_e_loss}


# ---- alternate criterions (models/criterions.py:42-139) ----

def _dice_1m(o: Array, t: Array, eps: float = 1e-5) -> Array:
    """criterions.Dice (:42-46): 1 - 2|o*t| / (|o|+|t|+eps)."""
    o = o.astype(jnp.float32)
    t = t.astype(jnp.float32)
    return 1.0 - 2.0 * jnp.sum(o * t) / (jnp.sum(o) + jnp.sum(t) + eps)


def softmax_dice2(probs: Array, target: Array):
    """criterions.softmax_dice2 (:65-77).  Note: like the reference, class 3
    compares against raw label 4 (pre-remap targets)."""
    l0 = _dice_1m(probs[..., 0], target == 0)
    l1 = _dice_1m(probs[..., 1], target == 1)
    l2 = _dice_1m(probs[..., 2], target == 2)
    l3 = _dice_1m(probs[..., 3], target == 4)
    return l0 + l1 + l2 + l3, 1 - l1, 1 - l2, 1 - l3


def sigmoid_dice(probs: Array, target: Array):
    """criterions.sigmoid_dice (:80-91): 3 foreground channels only."""
    l1 = _dice_1m(probs[..., 0], target == 1)
    l2 = _dice_1m(probs[..., 1], target == 2)
    l3 = _dice_1m(probs[..., 2], target == 4)
    return l1 + l2 + l3, 1 - l1, 1 - l2, 1 - l3


def generalized_dice(probs: Array, target: Array, eps: float = 1e-5,
                     weight_type: str = "square"):
    """criterions.Generalized_dice (:94-122) on foreground classes."""
    target = jnp.where(target == 4, 3, target)
    t = one_hot_last(target, probs.shape[-1])
    # (C-1, V) foreground flatten
    p = probs.astype(jnp.float32).reshape(-1, probs.shape[-1]).T[1:]
    t = t.reshape(-1, t.shape[-1]).T[1:]
    tsum = jnp.sum(t, axis=-1)
    if weight_type == "square":
        w = 1.0 / (tsum * tsum + eps)
    elif weight_type == "identity":
        w = 1.0 / (tsum + eps)
    elif weight_type == "sqrt":
        w = 1.0 / (jnp.sqrt(tsum) + eps)
    else:
        raise ValueError(f"weight_type {weight_type!r}")
    intersect = jnp.sum(p * t, axis=-1)
    denom = jnp.sum(p + t, axis=-1)
    loss = 1.0 - 2.0 * jnp.sum(intersect * w) / (jnp.sum(denom * w) + eps)
    per = 2.0 * intersect / (denom + eps)
    return loss, per[0], per[1], per[2]


def dual_focal_loss(probs: Array, target: Array):
    """criterions.Dual_focal_loss (:125-139)."""
    l1 = _dice_1m(probs[..., 1], target == 1)
    l2 = _dice_1m(probs[..., 2], target == 2)
    l3 = _dice_1m(probs[..., 3], target == 4)
    target = jnp.where(target == 4, 3, target)
    t = one_hot_last(target, probs.shape[-1])
    # (C, V)
    t = t.reshape(-1, t.shape[-1]).T
    p = probs.astype(jnp.float32).reshape(-1, probs.shape[-1]).T
    score = 1.0 - (t - p) ** 2
    loss = -jnp.mean(jax.nn.log_softmax(score, axis=0))
    return loss, 1 - l1, 1 - l2, 1 - l3


CRITERIA = {
    "softmax_dice": softmax_dice,
    "softmax_dice2": softmax_dice2,
    "sigmoid_dice": sigmoid_dice,
    "Generalized_dice": generalized_dice,
    "Dual_focal_loss": dual_focal_loss,
}
