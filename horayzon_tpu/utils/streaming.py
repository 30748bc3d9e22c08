# Copyright (c) 2026
# MIT License
"""Tiled streaming execution with resume-at-tile granularity.

The reference streams per-timestep results to an append-mode NetCDF so a
killed run keeps completed steps (gridded_curved_DEM_SRTM.py:207-266); for
spatial scaling it relies on the inner/outer-domain split.  Here large inner
domains are processed tile by tile: each finished tile is written atomically
to disk and a restarted run skips completed tiles — checkpoint/resume for
free, plus bounded device memory for arbitrarily large domains.
"""

import os

import numpy as np

from horayzon_tpu.ops import sweep as _sweep


class TiledHorizonRunner:
    """Run the gridded horizon sweep tile by tile with on-disk streaming.

    Parameters
    ----------
    z_outer : (H, W) array — outer heightfield.
    dx, dy : float — grid spacing (dy signed).
    offset : (off0, off1) — inner-domain offset in the outer grid.
    inner_shape : (in0, in1) — total inner-domain size.
    azim : (A,) array [radian].
    dist_search : float [metre].
    out_dir : str — directory for per-tile results (.npy tiles + done flag).
    tile : (t0, t1) — tile size (the last row/column of tiles may be
        smaller).
    sweep_kwargs : forwarded to :func:`horayzon_tpu.ops.sweep.horizon_sweep`.
    """

    def __init__(self, z_outer, *, dx, dy, offset, inner_shape, azim,
                 dist_search, out_dir, tile=(512, 512), **sweep_kwargs):
        self.z_outer = z_outer
        self.dx = dx
        self.dy = dy
        self.offset = offset
        self.inner_shape = tuple(inner_shape)
        self.azim = np.asarray(azim)
        self.dist_search = dist_search
        self.out_dir = out_dir
        self.tile = tile
        self.sweep_kwargs = sweep_kwargs
        os.makedirs(out_dir, exist_ok=True)

    def tiles(self):
        in0, in1 = self.inner_shape
        t0, t1 = self.tile
        for i0 in range(0, in0, t0):
            for j0 in range(0, in1, t1):
                yield (i0, j0, min(t0, in0 - i0), min(t1, in1 - j0))

    def _tile_path(self, i0, j0):
        return os.path.join(self.out_dir, f"hori_tile_{i0:06d}_{j0:06d}.npy")

    def run(self, verbose=True):
        """Process all tiles, skipping ones already on disk (resume).

        Returns the list of tile paths."""
        paths = []
        done = 0
        todo = list(self.tiles())
        for (i0, j0, n0, n1) in todo:
            path = self._tile_path(i0, j0)
            paths.append(path)
            if os.path.exists(path):
                done += 1
                continue
            hori, _ = _sweep.horizon_sweep(
                self.z_outer, dx=self.dx, dy=self.dy,
                offset=(self.offset[0] + i0, self.offset[1] + j0),
                inner_shape=(n0, n1), azim=self.azim,
                dist_search=self.dist_search, **self.sweep_kwargs)
            tmp = path + ".tmp.npy"
            np.save(tmp, np.asarray(hori))
            os.replace(tmp, path)   # atomic: no partial tiles on crash
            done += 1
            if verbose:
                print(f"tile ({i0},{j0}) done [{done}/{len(todo)}]")
        return paths

    def assemble(self):
        """Merge the on-disk tiles into the full (in0, in1, A) array."""
        in0, in1 = self.inner_shape
        out = np.empty((in0, in1, len(self.azim)), dtype=np.float32)
        for (i0, j0, n0, n1) in self.tiles():
            out[i0:i0 + n0, j0:j0 + n1] = np.load(self._tile_path(i0, j0))
        return out
