"""Affinity normalization and center insertion.

Semantics match the reference NLSPN fork exactly (all cites into
/root/reference/src/model/nlspnmodel.py):

  * ``_affinity_normalization`` (:179-201): optional tanh/gamma scaling
    (TC / TGASS), abs-sum + 1e-4, min-clamp of the sum to 1.0 (ASS/TGASS),
    division (AS/ASS/TGASS — note TC is scaled but *not* divided), then
    reference-pixel affinity inserted as ``1 - sum(aff)`` at the center
    channel (``_aff_insert``, :261-269, idx_ref = num_neighbors // 2).
  * ``_off_insert`` (:252-259): zero (dy, dx) pair inserted for the center.

Layout: NHWC. The neighbor axis is the trailing channel axis.
"""

from __future__ import annotations

import jax.numpy as jnp

VALID_AFFINITY_MODES = ("AS", "ASS", "TC", "TGASS")


def insert_center_affinity(aff: jnp.ndarray) -> jnp.ndarray:
    """Insert the center (reference-pixel) affinity as 1 - sum(neighbors).

    aff: (..., N) neighbor affinities -> (..., N + 1) with center at N // 2.
    """
    n = aff.shape[-1]
    idx_ref = n // 2
    center = 1.0 - jnp.sum(aff, axis=-1, keepdims=True)
    return jnp.concatenate(
        [aff[..., :idx_ref], center, aff[..., idx_ref:]], axis=-1
    )


def insert_center_offset(off: jnp.ndarray) -> jnp.ndarray:
    """Insert a zero (dy, dx) offset pair for the center neighbor.

    off: (..., 2 * N) with per-neighbor (dy, dx) pairs contiguous
    -> (..., 2 * (N + 1)) with zeros at pair index N // 2.
    """
    assert off.shape[-1] % 2 == 0
    n = off.shape[-1] // 2
    idx_ref = n // 2
    shaped = off.reshape(off.shape[:-1] + (n, 2))
    zeros = jnp.zeros(off.shape[:-1] + (1, 2), dtype=off.dtype)
    out = jnp.concatenate(
        [shaped[..., :idx_ref, :], zeros, shaped[..., idx_ref:, :]], axis=-2
    )
    return out.reshape(off.shape[:-1] + (2 * (n + 1),))


def normalize_affinity(
    aff: jnp.ndarray,
    gamma: jnp.ndarray,
    mode: str = "TGASS",
    insert_center: bool = True,
) -> jnp.ndarray:
    """Normalize raw neighbor affinities and (optionally) insert the center.

    aff:   (..., N) raw affinities from the affinity head.
    gamma: scalar scale constant. Learnable for TGASS (init
           affinity_gamma * N); frozen N for TC; ignored for AS/ASS.
    Returns (..., N + 1) normalized affinities (or (..., N) if
    insert_center=False).
    """
    if mode not in VALID_AFFINITY_MODES:
        raise NotImplementedError(f"affinity mode {mode}")

    if mode == "TC":
        aff = jnp.tanh(aff) / gamma
    elif mode == "TGASS":
        aff = jnp.tanh(aff) / (gamma + 1e-8)

    aff_abs_sum = jnp.sum(jnp.abs(aff), axis=-1, keepdims=True) + 1e-4
    if mode in ("ASS", "TGASS"):
        aff_abs_sum = jnp.maximum(aff_abs_sum, 1.0)
    if mode in ("AS", "ASS", "TGASS"):
        aff = aff / aff_abs_sum

    if insert_center:
        aff = insert_center_affinity(aff)
    return aff


# ---------------------------------------------------------------------------
# Planar (B, N, H, W) variants — the layouts the propagation loop runs in.
# On TPU the minor-most dim pads to 128 lanes, so channel-last (B, H, W, N)
# planes with small N waste up to 128x memory/bandwidth inside scan carries;
# the loop therefore keeps the neighbor axis at position 1.
# ---------------------------------------------------------------------------


def insert_center_affinity_planar(aff: jnp.ndarray) -> jnp.ndarray:
    """(B, N, H, W) -> (B, N + 1, H, W), center = 1 - sum at index N // 2."""
    n = aff.shape[1]
    idx_ref = n // 2
    center = 1.0 - jnp.sum(aff, axis=1, keepdims=True)
    return jnp.concatenate(
        [aff[:, :idx_ref], center, aff[:, idx_ref:]], axis=1
    )


def normalize_affinity_planar(
    aff: jnp.ndarray,
    gamma: jnp.ndarray,
    mode: str = "TGASS",
    insert_center: bool = True,
) -> jnp.ndarray:
    """normalize_affinity for planar (B, N, H, W) affinities (axis=1)."""
    if mode not in VALID_AFFINITY_MODES:
        raise NotImplementedError(f"affinity mode {mode}")

    if mode == "TC":
        aff = jnp.tanh(aff) / gamma
    elif mode == "TGASS":
        aff = jnp.tanh(aff) / (gamma + 1e-8)

    aff_abs_sum = jnp.sum(jnp.abs(aff), axis=1, keepdims=True) + 1e-4
    if mode in ("ASS", "TGASS"):
        aff_abs_sum = jnp.maximum(aff_abs_sum, 1.0)
    if mode in ("AS", "ASS", "TGASS"):
        aff = aff / aff_abs_sum

    if insert_center:
        aff = insert_center_affinity_planar(aff)
    return aff
