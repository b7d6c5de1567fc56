"""Fast per-ray table lookups.

TPU gathers with per-element indices are slow (the XLA lowering walks rows
through the scalar pipeline: profiling shows ~100 ns/row, which made three
small-table gathers dominate the whole bounce loop).  For the small tables
this framework dispatches on — materials, textures, and small scenes'
primitive rows — a one-hot contraction on the MXU is orders of magnitude
faster: build ``onehot[K, N] = (idx == arange(K))`` and matmul
``table[C, K] @ onehot -> [C, N]``.

Precision: the MXU multiplies in bf16.  A full-f32 matmul
(``Precision.HIGHEST``) costs 6 bf16 passes; for a ONE-HOT contraction the
result is just a copy of one table column, so a hi/mid/lo bf16 split of the
table reconstructs the exact f32 value in 3 passes (each split term is
picked exactly: the one-hot operand is 0/1, exactly representable in bf16,
and products accumulate in f32).  Three bf16 mantissas cover 24 bits —
f32-exact for the reconstruction — at half the MXU cost of HIGHEST.

``take_cols`` picks one-hot vs. real gather from static shapes.  Gradients
flow through the table operand in both paths (the one-hot VJP is itself an
MXU matmul, i.e. a fast scatter-add).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# onehot budget: K*N elements; beyond this fall back to gather
_BUDGET_ELEMS = 64 << 20
_MAX_K = 2048


def _use_onehot(k: int, n: int) -> bool:
    return k <= _MAX_K and k * n <= _BUDGET_ELEMS


def onehot(idx: jnp.ndarray, k: int) -> jnp.ndarray:
    """bf16 one-hot matrix ``[K, N]`` of per-ray indices (0/1 exact)."""
    return (idx[None, :] == jnp.arange(k, dtype=idx.dtype)[:, None]).astype(
        jnp.bfloat16
    )


def onehot_dot(table_f32: jnp.ndarray, oh: jnp.ndarray, passes: int = 3) -> jnp.ndarray:
    """``table[C, K] @ oh[K, N]`` -> f32[C, N] via hi/mid/lo bf16 passes.

    ``passes`` trades exactness for speed: 1 pass keeps 8 mantissa bits
    (exact for small ints / flags), 2 keeps ~16, 3 reconstructs f32 exactly
    for a one-hot right-hand side.
    """
    x = table_f32
    out = None
    for _ in range(passes):
        part = x.astype(jnp.bfloat16)
        term = lax.dot(part, oh, preferred_element_type=jnp.float32)
        out = term if out is None else out + term
        x = x - part.astype(jnp.float32)
    return out


def onehot_matmul(table: jnp.ndarray, idx: jnp.ndarray, passes: int = 3) -> jnp.ndarray:
    """``table[..., K]`` at ``idx[N]`` -> ``[..., N]`` via one-hot dot."""
    k = table.shape[-1]
    oh = onehot(idx, k)
    flat = table.reshape(-1, k).astype(jnp.float32)
    out = onehot_dot(flat, oh, passes=passes)
    return out.reshape(*table.shape[:-1], idx.shape[0])


def _restore_dtype(out: jnp.ndarray, dtype) -> jnp.ndarray:
    if dtype == jnp.bool_:
        return out > 0.5
    if jnp.issubdtype(dtype, jnp.integer):
        # small non-negative ids: exact in f32, round defends against FP fuzz
        return jnp.round(out).astype(dtype)
    return out.astype(dtype)


def take_cols(table: jnp.ndarray, idx: jnp.ndarray, passes: int = 3) -> jnp.ndarray:
    """``table[..., K]`` gathered at per-ray ``idx[N]`` -> ``[..., N]``."""
    k = table.shape[-1]
    if not _use_onehot(k, idx.shape[-1]):
        return jnp.take(table, idx, axis=-1)
    if jnp.issubdtype(table.dtype, jnp.integer) or table.dtype == jnp.bool_:
        # ids/flags: 2 bf16 passes carry ~16 mantissa bits, exact for values
        # < 2^16.  All integer tables here hold prim/mat/tex ids bounded by
        # table sizes (<= _MAX_K = 2048); a table holding values >= 2^16
        # would be reconstructed inexactly — keep the default 3 passes for
        # such tables by passing ``passes=3`` explicitly.
        passes = min(passes, 2)
    return _restore_dtype(onehot_matmul(table, idx, passes=passes), table.dtype)


def take_cols_nib(table: jnp.ndarray, idx: jnp.ndarray, passes: int = 3) -> jnp.ndarray:
    """``table[..., 256]`` gathered at ``idx[N]`` via NIBBLE-factored
    one-hots -> ``[..., N]``.

    The (256, N) one-hot compare build dominates ``take_cols`` when the
    table has few rows (perlin: 11 such fetches per octave were the top
    texture cost, BASELINE.md stage table).  Factoring idx = hi*32 + lo
    replaces it with a (32, N) lo build + an (8, N) hi build: step 1
    contracts the low 5 bits on the MXU for every hi slice at once (same
    FLOPs, 6.4x fewer compare ops); step 2 selects the hi slice with a 0/1
    multiply-sum on the VPU (C*8 FMAs/lane).

    Split choice (r5, measured end-to-end on final_scene's 56-fetch perlin
    marble): the dominant traffic is the f32 ``part`` intermediate
    (C*H_hi, N), so fewer hi slices wins until the lo one-hot build takes
    over — 16x16: 2.17, **32x8: 2.48**, 64x4: 2.31 Mpaths/s.

    Exactness matches ``take_cols``: both one-hots are 0/1 (exact in bf16),
    step 1's hi/lo bf16 table split reconstructs the entry exactly for a
    one-hot rhs, and step 2 multiplies by exact 0.0/1.0 in f32 — so perlin
    stays bit-identical to its oracle.
    """
    k = table.shape[-1]
    assert k == 256, k
    n = idx.shape[-1]
    # budget on the factored build size (32*n), not the 256-wide one-hot
    # this path exists to avoid — batched fetches (e.g. perlin's 8 corners
    # as one 8N-wide fetch) stay on the fast path
    if 32 * n > _BUDGET_ELEMS:
        return jnp.take(table, idx, axis=-1)
    if jnp.issubdtype(table.dtype, jnp.integer) or table.dtype == jnp.bool_:
        passes = min(passes, 2)
    hi = (idx >> 5).astype(idx.dtype)
    lo = (idx & 31).astype(idx.dtype)
    flat = table.reshape(-1, 8, 32).astype(jnp.float32)  # (C, hi, lo)
    part = onehot_dot(flat.reshape(-1, 32), onehot(lo, 32), passes=passes)
    part = part.reshape(-1, 8, n)  # (C, hi, N)
    oh_hi = (idx[None, :] >> 5 == jnp.arange(8, dtype=idx.dtype)[:, None]).astype(
        jnp.float32
    )  # (8, N)
    out = jnp.sum(part * oh_hi[None], axis=1)  # (C, N)
    return _restore_dtype(out.reshape(*table.shape[:-1], n), table.dtype)


def take_cols_multi(tables, idx: jnp.ndarray, passes: int = 3):
    """Gather several ``[..., K]`` tables at the same ``idx`` in ONE dot.

    All tables must share K (their last axis).  Returns outputs in input
    order, each ``[..., N]``.  Integer/bool tables must hold small
    non-negative values (ids/flags), exactly representable in f32.
    """
    k = tables[0].shape[-1]
    n = idx.shape[-1]
    if not _use_onehot(k, n):
        return [jnp.take(t, idx, axis=-1) for t in tables]
    rows = []
    sizes = []
    for t in tables:
        assert t.shape[-1] == k, (t.shape, k)
        flat = t.reshape(-1, k).astype(jnp.float32)
        rows.append(flat)
        sizes.append(flat.shape[0])
    stacked = jnp.concatenate(rows, axis=0)  # (C_total, K)
    out = onehot_dot(stacked, onehot(idx, k), passes=passes)  # (C_total, N)
    outs = []
    off = 0
    for t, c in zip(tables, sizes):
        part = out[off : off + c].reshape(*t.shape[:-1], n)
        outs.append(_restore_dtype(part, t.dtype))
        off += c
    return outs
