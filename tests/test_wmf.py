"""Weighted-median radix-descent vs a numpy stable-sort oracle.

The oracle reproduces the reference's crossing semantics
(gipuma.cu:1651-1667): sort samples by key (stable), accumulate weights,
return the first sample where the cumulative weight reaches half the
total. Weights are dyadic rationals so float summation order cannot
perturb the crossing — the comparison is exact.
"""

import numpy as np
import jax.numpy as jnp

from tsar_mvs_tpu.ops.wmf import _weighted_median


def _oracle(key, weight, payload):
    """key/weight/payload: (O, N). Stable-sort crossing median."""
    O, N = key.shape
    med = np.empty(N, np.float32)
    med_p = np.empty(N, payload.dtype)
    for n in range(N):
        order = np.argsort(key[:, n], kind="stable")
        s_k = key[order, n]
        s_w = weight[order, n]
        csum = np.cumsum(s_w)
        half = csum[-1] * 0.5
        idx = int(np.argmax(csum >= half))
        med[n] = s_k[idx]
        med_p[n] = payload[order, n][idx]
    return med, med_p


def test_weighted_median_matches_sort_oracle():
    rng = np.random.default_rng(0)
    O, N = 121, 512
    # Keys with deliberate ties (quantized), plus +inf invalid slots.
    key = np.round(rng.normal(size=(O, N)) * 8).astype(np.float32) / 4.0
    invalid = rng.random((O, N)) < 0.2
    key[invalid] = np.inf
    # Dyadic weights in {0.25 .. 4.0}; invalid -> 0.
    weight = (rng.integers(1, 17, size=(O, N)) * 0.25).astype(np.float32)
    weight[invalid] = 0.0
    payload = np.broadcast_to(np.arange(O, dtype=np.int32)[:, None],
                              (O, N)).copy()

    med, med_p = _weighted_median(jnp.asarray(key), jnp.asarray(weight),
                                  jnp.asarray(payload))
    ref_med, ref_p = _oracle(key, weight, payload)
    np.testing.assert_array_equal(np.asarray(med), ref_med)
    np.testing.assert_array_equal(np.asarray(med_p), ref_p)


def test_weighted_median_negative_keys_no_payload():
    rng = np.random.default_rng(1)
    O, N = 25, 256
    key = (rng.normal(size=(O, N)) - 0.5).astype(np.float32)
    weight = (rng.integers(0, 9, size=(O, N)) * 0.5).astype(np.float32)
    key[weight == 0.0] = np.inf
    payload = np.broadcast_to(np.arange(O, dtype=np.int32)[:, None],
                              (O, N)).copy()
    med = _weighted_median(jnp.asarray(key), jnp.asarray(weight))
    ref_med, _ = _oracle(key, weight, payload)
    # Columns where every weight is zero are masked by callers (num==0);
    # compare only live columns.
    live = weight.sum(axis=0) > 0
    np.testing.assert_array_equal(np.asarray(med)[live], ref_med[live])
