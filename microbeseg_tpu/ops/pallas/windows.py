"""Shared window scaffolding for tiled Pallas kernels on large frames.

Several post-processing stages are bounded-iteration local propagations
(watershed flood, connected-component neighbor-max, rank flooding).  On
frames beyond the VMEM side limit each XLA sweep is a full-frame HBM pass;
running the iteration per (tile + 2*halo)^2 window keeps the loop on-core.
This module owns the mechanics every such kernel shares:

- pad the frame so windows align, carve (win, win) batches by dynamic-slice
  scan, paste window INTERIORS back (halo regions are recomputed by the
  neighbouring windows);
- ring-guard: the outermost pixel ring of every window is forced to the
  plane's fill value, so kernels shift by pure wraparound ``pltpu.roll``
  (wrapped reads only ever deliver the inert fill — no iota edge-mask
  planes in VMEM, ~half the VPU ops of masked shifts) at the cost of one
  pixel of effective halo;
- chunking: Mosaic's scoped-VMEM accounting grows with pallas grid length
  (the 640^2-window flood compiles at grid 16 but reports 18.6 MB at grid
  64), so longer window batches run as ``lax.map`` over <= 16-window
  chunks — each chunk is one grid-16 pallas_call instance.

The Pallas kernels themselves stay with their callers (flood.py,
propagate.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# windows per pallas_call instance (see module docstring)
GRID_CHUNK = 16

# default window geometry: 512 + 2*64 = 640 sits on the (8, 128) Mosaic
# tile grid and its int32 blocks fit the ~16 MB VMEM budget double-buffered
TILE = 512
HALO = 64


def window_apply(batch_fn, planes, fills, tile: int = TILE, halo: int = HALO):
    """Apply ``batch_fn`` per window and paste interiors into a full frame.

    planes: tuple of (H, W) int32 arrays (same shape); fills: per-plane pad
    AND ring-guard value.  ``batch_fn``: callable taking len(planes) arrays
    of shape (T, win, win) int32 and returning one (T, win, win) int32 —
    typically a pallas_call whose grid is the leading axis.  Returns the
    (H, W) int32 frame assembled from window interiors.
    """
    H, W = planes[0].shape
    win = tile + 2 * halo
    assert win % 8 == 0 and win % 128 == 0, (
        f"window {win} must sit on the (8, 128) Pallas tile grid")
    gy, gx = -(-H // tile), -(-W // tile)
    Hp, Wp = gy * tile + 2 * halo, gx * tile + 2 * halo
    pads = ((halo, Hp - H - halo), (halo, Wp - W - halo))

    starts = jnp.asarray([(i * tile, j * tile)
                          for i in range(gy) for j in range(gx)], jnp.int32)

    def carve(x, fill):
        xp = jnp.pad(x, pads, constant_values=fill)

        def body(_, s):
            return None, jax.lax.dynamic_slice(xp, (s[0], s[1]), (win, win))

        t = jax.lax.scan(body, None, starts)[1]
        # ring guard (kernel contract: wraparound rolls read inert values)
        t = t.at[:, 0, :].set(fill).at[:, -1, :].set(fill)
        t = t.at[:, :, 0].set(fill).at[:, :, -1].set(fill)
        return t

    tiles = tuple(carve(x, f) for x, f in zip(planes, fills))

    T = tiles[0].shape[0]
    if T <= GRID_CHUNK:
        out_tiles = batch_fn(*tiles)
    else:
        padT = (-T) % GRID_CHUNK
        if padT:
            tiles = tuple(
                jnp.concatenate([t, jnp.full((padT, win, win), f, jnp.int32)])
                for t, f in zip(tiles, fills))
        out_tiles = jax.lax.map(
            lambda c: batch_fn(*c),
            tuple(t.reshape(-1, GRID_CHUNK, win, win) for t in tiles),
        ).reshape(-1, win, win)[:T]

    def paste(out, xs):
        s, t = xs
        inner = jax.lax.dynamic_slice(t, (halo, halo), (tile, tile))
        return jax.lax.dynamic_update_slice(
            out, inner, (s[0] + halo, s[1] + halo)), None

    out, _ = jax.lax.scan(paste, jnp.zeros((Hp, Wp), jnp.int32),
                          (starts, out_tiles))
    return out[halo:halo + H, halo:halo + W]
