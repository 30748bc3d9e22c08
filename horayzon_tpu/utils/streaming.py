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


class SunTrackRunner:
    """Stream a sun-track shadow / sw_dir_cor run to disk, resumably.

    The reference appends each timestep to an append-mode NetCDF so a
    killed run keeps completed steps
    (examples/shadow/gridded_curved_DEM_SRTM.py:207-266).  Here the track
    is processed in device-batched chunks; each finished chunk is written
    atomically (`os.replace`) and a restarted run skips chunks already on
    disk — so a long ``sw_dir_cor_batch`` is never all-or-nothing.

    Parameters
    ----------
    terrain : :class:`horayzon_tpu.shadow.Terrain` (initialised).
    sun_positions : (T, 3) array — ENU sun coordinates per timestep.
    out_dir : str — directory for per-chunk results.
    mode : "sw_dir_cor" or "shadow".
    chunk : timesteps per device batch (and per checkpoint file).
    """

    def __init__(self, terrain, sun_positions, *, out_dir,
                 mode="sw_dir_cor", chunk=8):
        if mode not in ("sw_dir_cor", "shadow"):
            raise ValueError("mode must be 'sw_dir_cor' or 'shadow'")
        self.terrain = terrain
        self.sun_positions = np.asarray(sun_positions, dtype=np.float32)
        if self.sun_positions.ndim != 2 or self.sun_positions.shape[1] != 3:
            raise ValueError("sun_positions must have shape (T, 3)")
        self.out_dir = out_dir
        self.mode = mode
        self.chunk = int(chunk)
        os.makedirs(out_dir, exist_ok=True)

    def chunks(self):
        t_total = self.sun_positions.shape[0]
        for t0 in range(0, t_total, self.chunk):
            yield t0, min(self.chunk, t_total - t0)

    def _chunk_path(self, t0):
        return os.path.join(self.out_dir,
                            f"{self.mode}_steps_{t0:06d}.npy")

    def run(self, verbose=True):
        """Process all chunks, skipping ones already on disk (resume).

        Returns the list of chunk paths."""
        fn = (self.terrain.sw_dir_cor_batch if self.mode == "sw_dir_cor"
              else self.terrain.shadow_batch)
        paths = []
        todo = list(self.chunks())
        for n_done, (t0, n_t) in enumerate(todo, start=1):
            path = self._chunk_path(t0)
            paths.append(path)
            if os.path.exists(path):
                continue
            out = fn(self.sun_positions[t0:t0 + n_t])
            tmp = path + ".tmp.npy"
            np.save(tmp, np.asarray(out))
            os.replace(tmp, path)   # atomic: no partial chunks on crash
            if verbose:
                print(f"sun-track chunk t={t0} done "
                      f"[{n_done}/{len(todo)}]")
        return paths

    def assemble(self):
        """Merge the on-disk chunks into the full (T, in0, in1) array."""
        parts = [np.load(self._chunk_path(t0)) for t0, _ in self.chunks()]
        return np.concatenate(parts, axis=0)
