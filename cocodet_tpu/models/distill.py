"""Attention-transfer distillation losses — pure jnp functions.

Parity target: ref yolox/models/distill2.py:5-103 (DistillLoss2 /
YOLODistiller2) and distill.py:1-109 (v1 with learnable adapter convs).

Math (per feature-map pair, NHWC here):
  at_spatial  = mean_c |x|           -> L2(student, teacher)
  at_channel  = mean_hw |x|          -> L2(student, teacher)
  at_loss     = alpha * (spatial + channel)
  masks: softmax((s+t)/T) over positions (x h*w) / channels (x c)
  am_loss     = beta * sqrt(sum((s - t)^2 * spatial_mask * channel_mask))

The distiller taps (dark3, dark4, dark5, C3_p4, C3_p3, C3_n3, C3_n4) map to
this framework's taps dict (models.pafpn return_taps): backbone[0:3] and
(td[-1], pan[0], pan[1], pan[2]) for 3-level; the P6 variant adds dark6 and
the extra pan level analogously.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

ALPHA = 4e-4
BETA = 2e-2
TEMPERATURE = 0.5


def distill_loss_pair(student: jnp.ndarray, teacher: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(total, at_loss, am_loss) for one NHWC feature-map pair."""
    s = student.astype(jnp.float32)
    t = jax.lax.stop_gradient(teacher.astype(jnp.float32))
    b, h, w, c = s.shape

    s_abs, t_abs = jnp.abs(s), jnp.abs(t)

    at_spatial_s = jnp.mean(s_abs, axis=-1, keepdims=True)     # (b,h,w,1)
    at_spatial_t = jnp.mean(t_abs, axis=-1, keepdims=True)
    at_spatial_loss = jnp.mean(jnp.square(at_spatial_s - at_spatial_t))

    spatial_mask = jax.nn.softmax(
        ((at_spatial_s + at_spatial_t) / TEMPERATURE).reshape(b, -1), axis=-1
    ).reshape(b, h, w, 1) * (h * w)

    at_channel_s = jnp.mean(s_abs, axis=(1, 2))                # (b,c)
    at_channel_t = jnp.mean(t_abs, axis=(1, 2))
    at_channel_loss = jnp.mean(jnp.square(at_channel_s - at_channel_t))

    at_loss = ALPHA * (at_spatial_loss + at_channel_loss)

    channel_mask = jax.nn.softmax(
        (at_channel_s + at_channel_t) / TEMPERATURE, axis=-1
    ).reshape(b, 1, 1, c) * c

    am_loss = BETA * jnp.sqrt(
        jnp.sum(jnp.square(s - t) * spatial_mask * channel_mask))

    return at_loss + am_loss, at_loss, am_loss


def taps_to_distill_list(taps: Dict) -> Sequence[jnp.ndarray]:
    """Flatten a PAFPN taps dict into the distiller tap order
    (ref YOLODistiller2.forward ordering: backbone..., td..., pan[:-?]).

    For L levels this yields: backbone[0..L-1], td deepest-first, pan[0..L-2]
    — 7 maps for L=3 (matches ref), 10 for L=4 (matches ref return_all count,
    yolox_p6.py:48-52).
    """
    backbone = list(taps["backbone"])
    td = list(taps["td"])
    pan = list(taps["pan"])[:-1]
    return backbone + td + pan


def distiller_loss(student_taps: Dict, teacher_taps: Dict) -> Dict[str, jnp.ndarray]:
    """Sum of per-tap distill losses, split backbone vs fpn
    (ref YOLODistiller2.forward, distill2.py:84-103)."""
    s_list = taps_to_distill_list(student_taps)
    t_list = taps_to_distill_list(teacher_taps)
    n_backbone = len(student_taps["backbone"])

    backbone_loss = jnp.zeros(())
    fpn_loss = jnp.zeros(())
    for i, (s, t) in enumerate(zip(s_list, t_list)):
        loss, _, _ = distill_loss_pair(s, t)
        if i < n_backbone:
            backbone_loss = backbone_loss + loss
        else:
            fpn_loss = fpn_loss + loss
    return {
        "dis_loss": backbone_loss + fpn_loss,
        "dis_backbone_loss": backbone_loss,
        "dis_fpn_loss": fpn_loss,
    }
