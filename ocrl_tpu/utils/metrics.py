"""Evaluation metrics, TPU-native where it pays off.

* ``adjusted_rand_index`` — a pure-JAX, jit/vmap-friendly ARI that matches
  sklearn.metrics.adjusted_rand_score on integer labelings.  The reference
  computes ARI per sample on the host with sklearn
  (reference: utils/tools.py:309-320), which forces a device→host copy inside
  the training loss of SLATE/IODINE.  Counting-based ARI stays on device.
* ``calculate_ari`` — mask-based wrapper with the reference's argmax semantics.
* ``hungarian_matching`` — L1-cost assignment (host-side, eval only;
  reference: utils/tools.py:293-305).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment


def adjusted_rand_index(true_ids: jnp.ndarray, pred_ids: jnp.ndarray,
                        num_true: int, num_pred: int) -> jnp.ndarray:
    """ARI between two integer labelings; batched over leading dims.

    true_ids/pred_ids: [..., P] int arrays with values < num_true / num_pred.
    Returns [...] float32.  Matches sklearn's convention that degenerate
    partitions (both trivial) score 1.0.
    """
    t = jax.nn.one_hot(true_ids, num_true, dtype=jnp.float32)
    p = jax.nn.one_hot(pred_ids, num_pred, dtype=jnp.float32)
    # contingency [..., num_true, num_pred]
    cont = jnp.einsum("...pi,...pj->...ij", t, p)
    a = cont.sum(-1)  # [..., num_true]
    b = cont.sum(-2)  # [..., num_pred]
    n = cont.sum((-1, -2))

    comb2 = lambda x: x * (x - 1.0) / 2.0
    sum_comb = comb2(cont).sum((-1, -2))
    sum_a = comb2(a).sum(-1)
    sum_b = comb2(b).sum(-1)
    n_comb = comb2(n)
    expected = sum_a * sum_b / jnp.maximum(n_comb, 1.0)
    max_index = 0.5 * (sum_a + sum_b)
    denom = max_index - expected
    ari = jnp.where(denom == 0.0, 1.0, (sum_comb - expected) / jnp.where(denom == 0.0, 1.0, denom))
    return ari


def calculate_ari(true_masks: jnp.ndarray, pred_masks: jnp.ndarray) -> jnp.ndarray:
    """Per-sample ARI from mask stacks (reference: utils/tools.py:309-320).

    true_masks: [B, Kt, H, W, 1] (or any layout with cluster axis at dim 1)
    pred_masks: [B, Kp, H, W, 1]
    Returns [B] float32 computed fully on-device.
    """
    B, Kt = true_masks.shape[0], true_masks.shape[1]
    Kp = pred_masks.shape[1]
    true_ids = jnp.argmax(true_masks.reshape(B, Kt, -1), axis=1)
    pred_ids = jnp.argmax(pred_masks.reshape(B, Kp, -1), axis=1)
    return adjusted_rand_index(true_ids, pred_ids, Kt, Kp)


def hungarian_matching(target: np.ndarray, inputs: np.ndarray, return_diff_mat: bool = False):
    """L1-cost Hungarian assignment of input rows to target rows.

    Host-side (scipy), used by eval probes (reference: utils/tools.py:293-305).
    """
    target = np.asarray(target)
    inputs = np.asarray(inputs)
    assert target.shape == inputs.shape
    diff_mat = np.abs(target[:, None, :] - inputs[None, :, :]).sum(-1)
    _, col_ind = linear_sum_assignment(diff_mat)
    if return_diff_mat:
        return col_ind, diff_mat[:, col_ind]
    return col_ind
