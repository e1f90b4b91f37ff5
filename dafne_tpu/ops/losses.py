"""DAFNe losses — dense, mask-weighted, global-batch semantics.

Re-designs the loss computation (dafne/modeling/dafne/dafne_outputs.py:
620-731) for a single jitted SPMD step:

- No positive-index gathering (dynamic shapes); every term is computed
  densely over [N, K] and weighted by the positive mask.
- No explicit dist.all_reduce (dafne_outputs.py:44-50): under pjit with a
  batch-sharded input, plain jnp sums ARE global sums — XLA inserts the
  psum.  The reference's per-GPU normalizer dance
  (num_pos_avg = all_reduce(pos)/world; loss_local/num_pos_avg; DDP-mean)
  algebraically reduces to  global_sum / global_normalizer,  which is what
  we compute directly.
- Losses:  sigmoid focal (cls, fvcore-equivalent, :636-645),
  modulated 8-point smooth-L1 with per-element log1p and min over 3 cyclic
  shifts (losses/smooth_l1.py:42-112), center smooth-L1 to the mean of
  corner targets (:684-693), centerness BCE (:696-701), lambda weighting
  with optional sum-to-1 normalization (:192-206,:712-727).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from dafne_tpu.geometry.quads import centerness_targets, sort_quadrilateral


def sigmoid_focal_loss(logits, targets, alpha: float, gamma: float):
    """Elementwise sigmoid focal loss (fvcore semantics, no reduction)."""
    p = jax.nn.sigmoid(logits)
    # numerically-stable BCE with logits
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        loss = loss * (alpha * targets + (1 - alpha) * (1 - targets))
    return loss


def smooth_l1(x, y, beta: float):
    """Elementwise smooth-L1 (fvcore semantics: exact L1 when beta ~ 0)."""
    n = jnp.abs(x - y)
    if beta < 1e-5:
        return n
    return jnp.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)


def modulated_eight_point_loss(pred, target, beta: float, logspace: bool):
    """Per-box corner loss: min over cyclic shifts {0, +1, +3} of the
    summed (optionally log1p'd) smooth-L1 over the 8 coords.

    pred, target: [..., 8] -> [...].
    """
    shape = pred.shape[:-1]
    p = pred.reshape(shape + (4, 2))

    def one(shifted):
        l = smooth_l1(shifted.reshape(shape + (8,)), target, beta)
        if logspace:
            l = jnp.log1p(l)
        return l.sum(-1)

    l0 = one(p)
    l1 = one(p[..., (1, 2, 3, 0), :])
    l2 = one(p[..., (3, 0, 1, 2), :])
    return jnp.minimum(l0, jnp.minimum(l1, l2))


def plain_eight_point_loss(pred, target, beta: float, logspace: bool):
    l = smooth_l1(pred, target, beta)
    if logspace:
        l = jnp.log1p(l)
    return l.sum(-1)


def bce_with_logits(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def rotated_iou_loss(pred, target, kind: str = "iou", eps: float = 1e-7):
    """Differentiable exact rotated-IoU loss between corner 8-vectors.

    The reference reserved MODEL.DAFNE.LOC_LOSS_TYPE iou/giou
    (defaults.py:107) but its CUDA path was dead code
    (box_intersection_2d.py); the boundary line-integral intersection
    (geometry.iou.quad_intersection_area_clip) is differentiable almost
    everywhere, so the loss works natively here.  kind "iou": 1 - IoU;
    "giou": 1 - GIoU with the enclosing axis-aligned box.
    """
    from dafne_tpu.geometry.iou import quad_intersection_area_clip
    from dafne_tpu.geometry.quads import enclosing_hbox, quad_area

    inter = quad_intersection_area_clip(pred, target)
    union = quad_area(pred) + quad_area(target) - inter
    iou = inter / jnp.maximum(union, eps)
    if kind == "iou":
        return 1.0 - iou
    hb_p = enclosing_hbox(pred)
    hb_t = enclosing_hbox(target)
    x0 = jnp.minimum(hb_p[..., 0], hb_t[..., 0])
    y0 = jnp.minimum(hb_p[..., 1], hb_t[..., 1])
    x1 = jnp.maximum(hb_p[..., 2], hb_t[..., 2])
    y1 = jnp.maximum(hb_p[..., 3], hb_t[..., 3])
    hull = jnp.maximum(x1 - x0, 0) * jnp.maximum(y1 - y0, 0)
    giou = iou - (hull - union) / jnp.maximum(hull, eps)
    return 1.0 - giou


@dataclasses.dataclass(frozen=True)
class LossSpec:
    num_classes: int = 15
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    smooth_l1_beta: float = 1.0 / 9.0
    loss_modulation: bool = True
    loss_logspace: bool = True
    loc_loss_type: str = "smoothl1"  # smoothl1 | iou | giou
    sort_corners: bool = True
    centerness: str = "oriented"  # none | plain | oriented
    centerness_alpha: float = 5.0
    has_center_reg: bool = True  # corner strategy == center-to-corner
    lambda_cls: float = 1.0
    lambda_corners: float = 1.0
    lambda_ctr: float = 1.0
    lambda_center: float = 1.0
    lambda_norm: bool = True

    @classmethod
    def from_config(cls, cfg) -> "LossSpec":
        d = cfg.MODEL.DAFNE
        return cls(
            num_classes=d.NUM_CLASSES,
            focal_alpha=d.LOSS_ALPHA,
            focal_gamma=d.LOSS_GAMMA,
            smooth_l1_beta=d.LOSS_SMOOTH_L1_BETA,
            loss_modulation=d.ENABLE_LOSS_MODULATION,
            loss_logspace=d.ENABLE_LOSS_LOG,
            loc_loss_type=d.LOC_LOSS_TYPE,
            sort_corners=d.SORT_CORNERS,
            centerness=d.CENTERNESS,
            centerness_alpha=d.CENTERNESS_ALPHA,
            has_center_reg=d.CORNER_PREDICTION == "center-to-corner",
            lambda_cls=d.LOSS_LAMBDA.CLS,
            lambda_corners=d.LOSS_LAMBDA.CORNERS,
            lambda_ctr=d.LOSS_LAMBDA.CTR,
            lambda_center=d.LOSS_LAMBDA.CENTER,
            lambda_norm=d.LOSS_LAMBDA_NORM,
        )

    def normalized_lambdas(self) -> Tuple[float, float, float, float]:
        """(cls, corners, ctr, center), normalized to sum 1 over the active
        terms when lambda_norm (dafne_outputs.py:192-206)."""
        lam_cls, lam_cor = self.lambda_cls, self.lambda_corners
        lam_ctr, lam_cen = self.lambda_ctr, self.lambda_center
        if self.lambda_norm:
            total = lam_cls + lam_cor
            if self.centerness != "none":
                total += lam_ctr
            if self.has_center_reg:
                total += lam_cen
            lam_cls, lam_cor = lam_cls / total, lam_cor / total
            lam_ctr, lam_cen = lam_ctr / total, lam_cen / total
        return lam_cls, lam_cor, lam_ctr, lam_cen


def dafne_losses(
    logits: jnp.ndarray,  # [N, K, C]
    corners_pred: jnp.ndarray,  # [N, K, 8] (stride-normalized space)
    center_pred: Optional[jnp.ndarray],  # [N, K, 2] or None
    ctrness_pred: jnp.ndarray,  # [N, K]
    targets: Dict[str, jnp.ndarray],  # from ops.targets.assign_targets
    spec: LossSpec,
) -> Dict[str, jnp.ndarray]:
    """Compute the loss dict {loss/cls, loss/corners, loss/center, loss/ctr}.

    All sums are over the full (global) batch; under pjit sharding XLA turns
    them into cross-chip psums, replacing dafne_outputs.py:44-50.
    """
    labels = targets["labels"]  # [N, K]
    pos = (labels != spec.num_classes).astype(jnp.float32)  # [N, K]
    num_pos = jnp.maximum(pos.sum(), 1.0)

    # -- classification: focal over all locations -----------------------------
    onehot = jax.nn.one_hot(labels, spec.num_classes, dtype=logits.dtype)
    cls_loss = (
        sigmoid_focal_loss(logits, onehot, spec.focal_alpha, spec.focal_gamma).sum()
        / num_pos
    )

    # -- centerness targets ----------------------------------------------------
    if spec.centerness == "plain":
        ctr_t = centerness_targets(targets["reg_ltrb"], spec.centerness_alpha)
    else:  # oriented (and the "none" branch, which then overwrites with 1)
        ctr_t = centerness_targets(targets["reg_abcd"], spec.centerness_alpha)
    if spec.centerness == "none":
        ctr_t = jnp.ones_like(ctr_t)
    ctr_t = ctr_t * pos
    loss_denorm = jnp.maximum(ctr_t.sum(), 1e-6)

    # -- corners ----------------------------------------------------------------
    cp = sort_quadrilateral(corners_pred) if spec.sort_corners else corners_pred
    if spec.loc_loss_type in ("iou", "giou"):
        per_box = rotated_iou_loss(cp, targets["reg_corners"], spec.loc_loss_type)
    elif spec.loss_modulation:
        per_box = modulated_eight_point_loss(
            cp, targets["reg_corners"], spec.smooth_l1_beta, spec.loss_logspace
        )
    else:
        per_box = plain_eight_point_loss(
            cp, targets["reg_corners"], spec.smooth_l1_beta, spec.loss_logspace
        )
    corners_loss = (per_box * ctr_t).sum() / loss_denorm

    losses = {}
    lam_cls, lam_cor, lam_ctr, lam_cen = spec.normalized_lambdas()
    losses["loss/cls"] = cls_loss * lam_cls
    losses["loss/corners"] = corners_loss * lam_cor

    # -- center regression (center-to-corner strategy) ---------------------------
    if spec.has_center_reg and center_pred is not None:
        center_t = targets["reg_corners"].reshape(
            targets["reg_corners"].shape[:-1] + (4, 2)
        ).mean(-2)
        l = smooth_l1(center_pred, center_t, spec.smooth_l1_beta)
        if spec.loss_logspace:
            l = jnp.log1p(l)
        # SmoothL1Loss weights with weight[:, None] then sums (smooth_l1.py:23-39)
        center_loss = (l.sum(-1) * ctr_t).sum() / loss_denorm
        losses["loss/center"] = center_loss * lam_cen

    # -- centerness -----------------------------------------------------------
    if spec.centerness != "none":
        ctr_loss = (bce_with_logits(ctrness_pred, ctr_t) * pos).sum() / num_pos
        losses["loss/ctr"] = ctr_loss * lam_ctr

    losses["loss/total"] = sum(losses.values())
    losses["num_pos"] = num_pos
    return losses
