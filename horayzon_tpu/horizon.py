# Copyright (c) 2026
# MIT License
"""Public horizon API, mirroring reference ``horayzon/horizon.pyx``.

``horizon_gridded`` (reference horizon.pyx:29) and ``horizon_locations``
(reference horizon.pyx:218) keep the reference's signatures so existing
pipelines can switch by changing the import.  Internally both run the
gather-free TPU sweep in :mod:`horayzon_tpu.ops.sweep` instead of Embree ray
casting.

Differences from the reference (documented behaviour):

* ``ray_algorithm`` selects among CPU search strategies in the reference
  (discrete_sampling / binary_search / guess_constant,
  horizon_comp.cpp:302-498).  On TPU a single batched sweep computes the
  exact maximum over distance samples, so the argument is accepted and
  ignored (any valid name, plus the native name ``"sweep"``).
* ``geom_type`` (Embree triangle/quad/grid) is accepted and ignored — the
  heightfield sweep always samples the bilinear surface, which matches the
  reference's "grid" geometry to within ``hori_acc``.
* The result is the exact sampled maximum rather than a bracket midpoint of
  the reference's ``hori_acc/5`` elevation ladder; agreement is within
  ``hori_acc``.
"""

import math
import time

import numpy as np
import jax.numpy as jnp

from horayzon_tpu import terrain as _terrain
from horayzon_tpu.ops import sweep as _sweep

_VALID_ALGOS = ("discrete_sampling", "binary_search", "guess_constant",
                "sweep")
_VALID_GEOM = ("triangle", "quad", "grid")


def azimuth_angles(azim_num):
    """Azimuth angles [radian], clockwise from North (horizon.pyx:190-196)."""
    return ((2.0 * np.pi) / azim_num * np.arange(azim_num)).astype(np.float32)


def horizon_gridded(
        vert_grid, dem_dim_0, dem_dim_1,
        vec_norm, vec_north,
        offset_0, offset_1,
        dist_search,
        azim_num=360,
        hori_acc=0.25,
        ray_algorithm="guess_constant",
        geom_type="grid",
        vert_simp=None, num_vert_simp=1,
        tri_ind_simp=None, num_tri_simp=1,
        elev_ang_low_lim=-15.0,
        mask=None,
        hori_fill=0.0,
        ray_org_elev=0.01,
        verbose=True):
    """Horizon computation for a gridded domain (TPU sweep).

    Signature and semantics mirror reference horizon.pyx:29-197; rays against
    the DEM are replaced by the shifted-slice sweep (ops/sweep.py).

    Returns
    -------
    hori : ndarray of float32, shape (in0, in1, azim_num) [radian]
    azim : ndarray of float32, shape (azim_num,) [radian]
    """
    # --- Validation (mirrors horizon.pyx:109-156) -------------------------
    vec_norm = np.asarray(vec_norm, dtype=np.float32)
    vec_north = np.asarray(vec_north, dtype=np.float32)
    if ((offset_0 + vec_norm.shape[0] > dem_dim_0)
            or (offset_1 + vec_norm.shape[1] > dem_dim_1)):
        raise ValueError("inconsistency between input arguments dem_dim_0, "
                         "dem_dim_1, offset_0, offset_1 and vec_norm")
    if ((vec_norm.ndim != 3) or (vec_north.ndim != 3)
            or (vec_norm.shape != vec_north.shape)):
        raise ValueError("dimension (lengths) of vec_norm and/or vec_north "
                         "is/are erroneous")
    if ray_algorithm not in _VALID_ALGOS:
        raise ValueError("invalid input argument for ray_algorithm")
    if geom_type not in _VALID_GEOM:
        raise ValueError("invalid input argument for geom_type")
    if hori_acc > 10.0:
        raise ValueError("limit of hori_acc (10 degree) is exceeded")
    if mask is None:
        mask = np.ones((vec_norm.shape[0], vec_norm.shape[1]), dtype=np.uint8)
    mask = np.asarray(mask)
    if mask.shape != vec_norm.shape[:2]:
        raise ValueError("shape of mask is inconsistent with other input")
    if mask.dtype != np.uint8:
        raise TypeError("data type of mask must be 'uint8'")
    if ray_org_elev < 0.005:
        raise TypeError("minimal allowed value for 'ray_org_elev' is 0.005 m")

    x, y, z = _terrain.decompose_vert_grid(vert_grid, dem_dim_0, dem_dim_1)
    grid = _terrain.detect_regular_grid(x, y)
    if grid is None:
        raise ValueError(
            "vert_grid is not a regular axis-aligned (x, y) grid. For curved "
            "ENU meshes, planarise first with horayzon_tpu.regrid "
            "(resampling to a regular ENU grid) and pass the resampled "
            "buffer, or use horayzon_tpu.models.CurvedPipeline.")

    inner_shape = (vec_norm.shape[0], vec_norm.shape[1])
    azim = azimuth_angles(azim_num)
    planar = _terrain.is_default_planar_vectors(vec_norm, vec_north)
    if planar:
        geom = None
        u_xy = None
    else:
        geom = _terrain.basis_fields(vec_norm, vec_north)
        u_xy = _terrain.mean_marching_directions(azim, vec_norm, vec_north)

    t0 = time.perf_counter()
    hori, _ = _sweep.horizon_sweep(
        z, dx=grid.dx, dy=grid.dy, offset=(offset_0, offset_1),
        inner_shape=inner_shape, azim=azim,
        dist_search=dist_search * 1000.0,
        hori_acc=hori_acc, elev_ang_low_lim=elev_ang_low_lim,
        ray_org_elev=ray_org_elev, geom=geom, u_xy=u_xy)
    if mask.min() == 0:
        m = jnp.asarray(mask[..., None] == 1)
        hori = jnp.where(m, hori, jnp.float32(hori_fill))
    hori = np.asarray(hori)
    if verbose:
        n_cells = int((mask == 1).sum())
        dt = time.perf_counter() - t0
        print(f"Horizon sweep: {inner_shape[0]}x{inner_shape[1]} cells, "
              f"{azim_num} azimuths, {dt:.3f} s "
              f"(incl. compile on first call)")
        print(f"Number of grid cells for which horizon is computed: "
              f"{n_cells}")
    return hori, azim


def horizon_locations(
        vert_grid, dem_dim_0, dem_dim_1,
        coords, vec_norm, vec_north,
        dist_search,
        azim_num=360,
        hori_acc=0.25,
        ray_algorithm="binary_search",
        geom_type="grid",
        elev_ang_low_lim=-89.98,
        ray_org_elev=None,
        hori_dist_out=False):
    """Horizon computation for arbitrary locations (reference horizon.pyx:218).

    The observer elevation is found by sampling the heightfield at the
    location's (x, y) (the reference shoots a ray along +/- normal to find
    the surface, horizon_comp.cpp:944-957), lifted by ``ray_org_elev``.

    Returns ``(hori, azim)`` or ``(hori, hori_dist, azim)`` when
    ``hori_dist_out`` is True [radian / metre].
    """
    coords = np.asarray(coords, dtype=np.float32)
    vec_norm = np.asarray(vec_norm, dtype=np.float32)
    vec_north = np.asarray(vec_north, dtype=np.float32)
    if (coords.ndim != 2) or (coords.shape[1] != 3) \
            or (coords.shape[0] != vec_norm.shape[0]):
        raise ValueError("'number of dimensions and/or dimension length(s) "
                         "of 'coords' incorrect")
    if vec_norm.shape != vec_north.shape or vec_norm.ndim != 2:
        raise ValueError("dimension (lengths) of vec_norm and/or vec_north "
                         "is/are erroneous")
    if ray_algorithm not in _VALID_ALGOS:
        raise ValueError("invalid input argument for ray_algorithm")
    if hori_acc > 10.0:
        raise ValueError("limit of hori_acc (10 degree) is exceeded")
    if ray_org_elev is None:
        ray_org_elev = np.array([0.01], dtype=np.float32)
    ray_org_elev = np.atleast_1d(np.asarray(ray_org_elev, dtype=np.float32))
    num_loc = coords.shape[0]
    if len(ray_org_elev) not in (1, num_loc):
        raise ValueError("length of array 'ray_org_elev' must be either one "
                         "or correspond to the number of locations")
    if ray_org_elev.min() < 0.005:
        raise TypeError("minimal allowed value for 'ray_org_elev' is 0.005 m")
    if len(ray_org_elev) == 1:
        ray_org_elev = np.repeat(ray_org_elev, num_loc)

    x, y, z = _terrain.decompose_vert_grid(vert_grid, dem_dim_0, dem_dim_1)
    grid = _terrain.detect_regular_grid(x, y)
    if grid is None:
        raise ValueError("vert_grid is not a regular axis-aligned grid; "
                         "planarise with horayzon_tpu.regrid first")

    from horayzon_tpu.ops import locations as _locations
    azim = azimuth_angles(azim_num)
    hori, hori_dist = _locations.horizon_locations_sweep(
        z, grid, coords, vec_norm, vec_north, azim,
        dist_search * 1000.0, hori_acc, elev_ang_low_lim,
        ray_org_elev)
    if hori_dist_out:
        return np.asarray(hori), np.asarray(hori_dist), azim
    return np.asarray(hori), azim
