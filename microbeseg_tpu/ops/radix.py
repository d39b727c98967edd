"""Radix-decomposed per-id reductions and lookups on the MXU.

Per-element scatter-adds and table-gathers cost ~0.4 ms per 65K elements
on this hardware (scripts/microbench_gather.py) — at full-frame pixel
counts they dominate any stage built on them (seed-prune histogram
~280 ms, regionprops ~180 ms/frame at scale).  Decomposing the id as
``id = hi * 256 + lo`` turns both primitives into pixel-chunked matmuls:

- weighted histogram:  ``sums[hi, lo] = (oh_lo * w)^T @ oh_hi``
- table lookup:        ``out = rowsum((oh_hi @ table) * oh_lo)``

One-hot rows are exact 0/1 and each per-pixel product selects exactly one
table entry, so lookups are exact; histogram sums accumulate in f32 like
a segment_sum (summation ORDER differs — bit-identical only for integer
weights).  Construction costs O(P * (256 + cap/256)) compares instead of
O(P * cap), and the chunked scan bounds the one-hot intermediates.

EVERY einsum here carries ``precision="highest"`` and it is
load-bearing: XLA's DEFAULT TPU matmul precision truncates f32 operands
to bf16 on the MXU, which quantizes table values and weights above 256
(8-bit mantissa) — remap ids collided (257 -> 256) and produced merged
instances with gapped label ranges, and coordinate weights lost ~0.4%.
Chip-verified: default precision errs up to 8 on a 4096-entry integer
lookup, highest is exact.  CPU tests CANNOT catch this class (CPU
einsums are true f32) — regressions here need the on-chip probes in
scripts/ (see CLAUDE.md).

Callers: ``ops/postprocessing._prune_small_seeds`` (large-cap prune),
``ops/regionprops`` (large-frame moments).  Reference context:
skimage.measure.regionprops / np.bincount uses in
src/inference/postprocessing.py:41 and src/inference/analysis.py:162.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

RADIX_LO = 256  # low-radix width: one-hot rows stay bf16-exact (0/1)

# element budget for the (chunk, 256 + n_hi) one-hot intermediates
_CHUNK_ELEMS = 32 * 1024 * 1024


def _n_hi(cap: int) -> int:
    return -(-(cap + 1) // RADIX_LO)


def _chunked(flat: jnp.ndarray, cap: int):
    n_pix = flat.size
    chunk = max(4096, min(_CHUNK_ELEMS // (RADIX_LO + _n_hi(cap)), n_pix))
    pad = (-n_pix) % chunk
    return jnp.pad(flat, (0, pad)).reshape(-1, chunk)  # pad lands in id 0


def _onehots(c: jnp.ndarray, cap: int):
    oh_lo = jax.nn.one_hot(c & (RADIX_LO - 1), RADIX_LO, dtype=jnp.bfloat16)
    oh_hi = jax.nn.one_hot(c >> 8, _n_hi(cap), dtype=jnp.bfloat16)
    return oh_lo, oh_hi


def radix_histogram(flat: jnp.ndarray, cap: int,
                    weights=None) -> jnp.ndarray:
    """Per-id weighted sums over ``flat`` int32 ids in [0, cap].

    weights: None (plain counts) or a tuple of (n_pix,) f32 planes sharing
    one one-hot construction.  Returns (cap+1,) f32 for None, else a tuple
    of (cap+1,) f32 in the same order.  Ids beyond cap must not occur
    (callers clamp); the scan pad lands in id 0.
    """
    flat = flat.reshape(-1).astype(jnp.int32)
    n_hi = _n_hi(cap)
    chunks = _chunked(flat, cap)
    chunk = chunks.shape[1]
    n_ids = n_hi * RADIX_LO

    if weights is None:
        def hist_body(acc, c):
            oh_lo, oh_hi = _onehots(c, cap)
            return acc + jnp.einsum("pl,ph->hl", oh_lo, oh_hi,
                                    precision="highest", preferred_element_type=jnp.float32), None

        hist, _ = jax.lax.scan(
            hist_body, jnp.zeros((n_hi, RADIX_LO), jnp.float32), chunks)
        out = hist.reshape(n_ids)[:cap + 1]
        # the scan pad contributed counts to id 0
        pad = chunks.size - flat.size
        return out.at[0].add(-pad) if pad else out

    ws = tuple(jnp.pad(w.reshape(-1).astype(jnp.float32),
                       (0, chunks.size - flat.size)).reshape(chunks.shape)
               for w in weights)

    def whist_body(acc, xs):
        c = xs[0]
        oh_lo, oh_hi = _onehots(c, cap)
        oh_lo = oh_lo.astype(jnp.float32)
        new = tuple(
            a + jnp.einsum("pl,ph->hl", oh_lo * w[:, None], oh_hi,
                           precision="highest", preferred_element_type=jnp.float32)
            for a, w in zip(acc, xs[1:]))
        return new, None

    init = tuple(jnp.zeros((n_hi, RADIX_LO), jnp.float32) for _ in ws)
    hists, _ = jax.lax.scan(whist_body, init, (chunks,) + ws)
    # zero-padded weights contribute nothing, so no pad correction needed
    return tuple(h.reshape(n_ids)[:cap + 1] for h in hists)


def radix_central_moments(flat: jnp.ndarray, cap: int,
                          yy: jnp.ndarray, xx: jnp.ndarray,
                          cy_tab: jnp.ndarray, cx_tab: jnp.ndarray):
    """Fused centroid lookup + central second-moment histograms.

    One chunked scan sharing a single one-hot construction per chunk:
    per-pixel (cy, cx) table lookups, deviations dy/dx, and the three
    weighted histograms sum(dy^2), sum(dx^2), sum(dx*dy) per id.  A
    separate radix_lookup followed by radix_histogram builds the same
    one-hots twice (one third of regionprops' large-frame radix work).

    flat int32 ids in [0, cap]; slot ``cap`` must be a discard slot
    (regionprops parks the background there) — scan padding lands in it.
    Returns three (cap+1,) f32 sums.
    """
    flat = flat.reshape(-1).astype(jnp.int32)
    n_hi = _n_hi(cap)
    n_pix = flat.size
    chunk = max(4096, min(_CHUNK_ELEMS // (RADIX_LO + n_hi), n_pix))
    pad = (-n_pix) % chunk
    ids = jnp.pad(flat, (0, pad), constant_values=cap).reshape(-1, chunk)
    yyc = jnp.pad(yy.reshape(-1).astype(jnp.float32),
                  (0, pad)).reshape(ids.shape)
    xxc = jnp.pad(xx.reshape(-1).astype(jnp.float32),
                  (0, pad)).reshape(ids.shape)
    tabs = tuple(
        jnp.pad(t.astype(jnp.float32),
                (0, n_hi * RADIX_LO - (cap + 1))).reshape(n_hi, RADIX_LO)
        for t in (cy_tab, cx_tab))

    def body(acc, xs):
        c, y, x = xs
        oh_lo, oh_hi = _onehots(c, cap)
        oh_lo = oh_lo.astype(jnp.float32)
        cyx = [jnp.einsum("pl,pl->p",
                          jnp.einsum("ph,hl->pl", oh_hi, t,
                                     precision="highest", preferred_element_type=jnp.float32),
                          oh_lo, precision="highest", preferred_element_type=jnp.float32)
               for t in tabs]
        dy = y - cyx[0]
        dx = x - cyx[1]
        new = tuple(
            a + jnp.einsum("pl,ph->hl", oh_lo * w[:, None], oh_hi,
                           precision="highest", preferred_element_type=jnp.float32)
            for a, w in zip(acc, (dy * dy, dx * dx, dx * dy)))
        return new, None

    init = tuple(jnp.zeros((n_hi, RADIX_LO), jnp.float32) for _ in range(3))
    sums, _ = jax.lax.scan(body, init, (ids, yyc, xxc))
    return tuple(s.reshape(-1)[:cap + 1] for s in sums)


def radix_lookup(flat: jnp.ndarray, tables) -> jnp.ndarray:
    """Per-element values of (cap+1,)-sized f32 ``tables`` at ``flat`` ids.

    tables: one array or a tuple sharing one one-hot construction.  Table
    values must be exact in f32 (selection itself is exact).  Returns
    arrays shaped like ``flat``.
    """
    single = not isinstance(tables, (tuple, list))
    if single:
        tables = (tables,)
    shape = flat.shape
    flat = flat.reshape(-1).astype(jnp.int32)
    cap = tables[0].shape[0] - 1
    n_hi = _n_hi(cap)
    chunks = _chunked(flat, cap)
    pads = tuple(
        jnp.pad(t.astype(jnp.float32),
                (0, n_hi * RADIX_LO - (cap + 1))).reshape(n_hi, RADIX_LO)
        for t in tables)

    def lookup_body(_, c):
        oh_lo, oh_hi = _onehots(c, cap)
        oh_lo = oh_lo.astype(jnp.float32)
        outs = tuple(
            jnp.einsum("pl,pl->p",
                       jnp.einsum("ph,hl->pl", oh_hi, t,
                                  precision="highest", preferred_element_type=jnp.float32),
                       oh_lo, precision="highest", preferred_element_type=jnp.float32)
            for t in pads)
        return None, outs

    _, outs = jax.lax.scan(lookup_body, None, chunks)
    outs = tuple(o.reshape(-1)[:flat.size].reshape(shape) for o in outs)
    return outs[0] if single else outs
