"""Pan/tilt AGV -> cylinder forward kinematics (ref utils/getTAGVcyl.m:8-38).

Kinematic chain, exactly as the reference composes it:
  T_A_P    : pan rotation about z
  T_P_T0   : fixed offset [-l2, 0, 0] to the tilt joint
  T_T0_T1  : tilt-motor z translation of -tan(tilt) * |T_P_T0|
  T_T1_T2  : rotation about y by -tilt
  T_T2_CYL : fixed tool transform [0 -1 0 l1; -1 0 0 0; 0 0 -1 h]
Vectorized over leading batch axes of (pan, tilt) so a whole frame sequence is
one call (the reference loops frames: ref utils/fitCylinderWPts3sAngs.m:29-31).
"""

from __future__ import annotations

import jax.numpy as jnp

from cylinder_pose_estimation_tpu.ops.linalg import mm

from cylinder_pose_estimation_tpu.config import KinematicsConfig


def t_agv_cyl(
    pan: jnp.ndarray, tilt: jnp.ndarray, config: KinematicsConfig = KinematicsConfig()
) -> jnp.ndarray:
    """pan, tilt in radians (broadcastable) -> (..., 4, 4) T_AGV_cyl."""
    pan = jnp.asarray(pan)
    tilt = jnp.asarray(tilt)
    dtype = jnp.result_type(pan.dtype, jnp.float32)
    pan = pan.astype(dtype)
    tilt = tilt.astype(dtype)
    batch = jnp.broadcast_shapes(pan.shape, tilt.shape)
    pan = jnp.broadcast_to(pan, batch)
    tilt = jnp.broadcast_to(tilt, batch)

    cp, sp = jnp.cos(pan), jnp.sin(pan)
    ct, st = jnp.cos(-tilt), jnp.sin(-tilt)
    zero = jnp.zeros_like(pan)
    one = jnp.ones_like(pan)

    def mat(rows):
        return jnp.stack(
            [jnp.stack(r, axis=-1) for r in rows], axis=-2
        )

    t_a_p = mat([
        [cp, -sp, zero, zero],
        [sp, cp, zero, zero],
        [zero, zero, one, zero],
        [zero, zero, zero, one],
    ])

    l2 = jnp.asarray(config.l2, dtype)
    t_p_t0 = mat([
        [one, zero, zero, -l2 * one],
        [zero, one, zero, zero],
        [zero, zero, one, zero],
        [zero, zero, zero, one],
    ])

    # Tilt-motor z translation: -tan(tilt) * |T_P_T0 offset| (ref :27-30).
    mtr_move = -jnp.tan(tilt) * jnp.abs(l2)
    t_t0_t1 = mat([
        [one, zero, zero, zero],
        [zero, one, zero, zero],
        [zero, zero, one, mtr_move],
        [zero, zero, zero, one],
    ])

    t_t1_t2 = mat([
        [ct, zero, st, zero],
        [zero, one, zero, zero],
        [-st, zero, ct, zero],
        [zero, zero, zero, one],
    ])

    l1 = jnp.asarray(config.l1, dtype)
    h = jnp.asarray(config.h, dtype)
    t_t2_cyl = mat([
        [zero, -one, zero, l1 * one],
        [-one, zero, zero, zero],
        [zero, zero, -one, h * one],
        [zero, zero, zero, one],
    ])

    return mm(mm(mm(mm(t_a_p, t_p_t0), t_t0_t1), t_t1_t2), t_t2_cyl)
