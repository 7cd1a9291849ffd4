"""ops/select.py: the Pallas first-valid-columns kernel (interpret
mode on CPU) matches the lax.top_k selection expression it replaces in
the fast render/train compaction."""

import jax.numpy as jnp
import numpy as np
import pytest

from pointnerf2studio_tpu.ops.select import (
    first_valid_cols, first_valid_cols_reference)


@pytest.mark.parametrize(
    "R,D,BP,p",
    [(512, 180, 32, 0.1),    # bench-like sparsity
     (300, 64, 32, 0.5),     # coarse layout: Dax < ... dense
     (256, 400, 24, 0.02),   # chair preset depth, sparse
     (128, 100, 32, 0.0),    # all-empty rows
     (64, 20, 32, 0.9)])     # Dax < BP
def test_matches_topk_reference(R, D, BP, p):
    rng = np.random.default_rng(R + D)
    qs = jnp.asarray(np.where(rng.random((R, D)) < p,
                              rng.integers(0, 1 << 20, (R, D)),
                              -1).astype(np.int32))
    cs, cn = first_valid_cols(qs, BP, interpret=True)
    cr, cnr = first_valid_cols_reference(qs, BP)
    cs, cn = np.asarray(cs), np.asarray(cn)
    cr, cnr = np.asarray(cr), np.asarray(cnr)
    np.testing.assert_array_equal(cn, cnr)
    # meaningful slots (b < count) must match exactly; sentinel slots
    # only need to be >= D (callers never read them)
    valid = np.arange(BP)[None, :] < np.minimum(cnr, BP)[:, None]
    np.testing.assert_array_equal(cs[valid], cr[valid])
    assert np.all(cs[~valid] >= D)


def test_rank_exact_past_bf16_integers():
    # rows with > 256 valid columns: the bf16 one-hot inputs are still
    # exact 0/1 and the f32 accumulator makes the prefix rank exact
    R, D, BP = 16, 300, 8
    qs = jnp.ones((R, D), jnp.int32)            # all valid
    cs, cn = first_valid_cols(qs, BP, interpret=True)
    assert np.all(np.asarray(cn) == D)
    np.testing.assert_array_equal(
        np.asarray(cs), np.broadcast_to(np.arange(BP), (R, BP)))
