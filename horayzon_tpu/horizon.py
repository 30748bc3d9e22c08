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

import time
import warnings

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


def _on_tpu():
    import jax
    try:
        dev = jax.devices()[0]
    except Exception:
        return False
    return "tpu" in (getattr(dev, "device_kind", "") or "").lower() \
        or dev.platform == "tpu"


def _mask_bbox(mask):
    """Bounding box (r0, r1, c0, c1) of unmasked (== 1) cells; the whole
    domain if every cell is unmasked, a 1x1 box if none is (callers fill
    masked cells afterwards, so the value computed there is discarded)."""
    rows = np.flatnonzero(np.asarray(mask).any(axis=1))
    cols = np.flatnonzero(np.asarray(mask).any(axis=0))
    if rows.size == 0:
        return 0, 1, 0, 1
    return rows[0], rows[-1] + 1, cols[0], cols[-1] + 1


#: Measured per-cell wall-time of the fused kernel by lane-tile width,
#: relative to t1=256, keyed by TPU device kind with a conservative
#: fallback (tools/ablate_kernel.py --tile writes updated entries; v5e
#: values measured round 3: 0.2211 s @ 256, 0.1832 s @ 512, 0.1710 s @
#: 1024; 0.1821 s @ 2048 and 0.1753/0.1786 s @ t0=256 were worse).  Wider
#: tiles amortise the aligned-slab roll margins; the table trades that
#: against computing extra padded columns.
_LANE_TILE_COST_TABLES = {
    "TPU v5 lite": {256: 1.0, 512: 0.812, 1024: 0.748},
}
#: Unmeasured devices: the slab-margin geometry (cols rounded up to
#: width + 384 vs width + 128) favours wide tiles on every TPU
#: generation, but by an unmeasured factor — assume a mild one.
_LANE_TILE_COST_FALLBACK = {256: 1.0, 512: 0.93, 1024: 0.90}

#: Measured wall time of the bench-shape sweep (1024^2 inner, 32 azimuths,
#: 20 km / 25 m search) by full kernel tile shape, relative to
#: (128, 1024), keyed by device kind (tools/ablate_kernel.py --tile;
#: round-4 measurements with the ~25 ms tunnel roundtrip latency
#: subtracted from every wall time before forming ratios).  Thin tiles pay
#: aligned-slab margins plus per-(tile, azimuth) mip-phase setup that does
#: not shrink with the tile, hence the steep row scaling.  Drives the
#: masked-run tile chooser (:func:`_masked_tile_choice`).
_TILE_COST_TABLES = {
    # Round-5 `tools/ablate_kernel.py --tile-sweep` on the bench v5e
    # (within ~2% of the round-4 measurements; committed so the built-in
    # and a freshly tuned cache agree on this device kind).
    "TPU v5 lite": {
        (128, 1024): 1.000, (128, 512): 1.085, (128, 256): 1.337,
        (64, 1024): 1.103, (64, 512): 1.307, (64, 256): 1.673,
        (32, 1024): 1.350, (32, 512): 1.731, (32, 256): 2.406,
        (16, 1024): 1.866, (16, 512): 2.594, (16, 256): 4.124,
        (8, 256): 8.02,
    },
}
#: Unmeasured devices: a full-menu fallback with CONSERVATIVE thin-tile
#: ratios (scaled ~1.25x above the v5e measurements below 128 rows, so
#: the chooser only picks a thin tile when the active-tile saving clearly
#: pays even if this device's slab-margin costs are worse than v5e's).
#: Run ``tools/ablate_kernel.py --tile-sweep`` once per device kind to
#: replace these with measurements; _masked_tile_choice prints a one-line
#: hint when it falls back here.
_TILE_COST_FALLBACK = {
    (128, 1024): 1.000, (128, 512): 1.08, (128, 256): 1.29,
    (64, 1024): 1.38, (64, 512): 1.63, (64, 256): 2.08,
    (32, 1024): 1.68, (32, 512): 2.14, (32, 256): 2.97,
    (16, 1024): 2.31, (16, 512): 3.19, (16, 256): 5.05,
}
_TUNE_HINT_PRINTED = False


def _device_kind():
    import jax
    try:
        return (getattr(jax.devices()[0], "device_kind", "") or "").strip()
    except Exception:
        return ""


def _tune_cache_path():
    import os
    base = os.environ.get(
        "HORAYZON_TPU_AUX_DATA",
        os.path.join(os.path.expanduser("~"), ".cache", "horayzon_tpu"))
    return os.path.join(base, "tile_costs.json")


_TUNE_CACHE = None


def _tuned_tables():
    """Device-keyed tables measured by ``tools/ablate_kernel.py
    --tile-sweep`` (the one-command autotune); {} when none cached."""
    global _TUNE_CACHE
    if _TUNE_CACHE is None:
        import json
        try:
            _TUNE_CACHE = json.load(open(_tune_cache_path()))
        except Exception:
            _TUNE_CACHE = {}
    return _TUNE_CACHE.get(_device_kind(), {})


def _lane_tile_cost():
    tuned = _tuned_tables().get("lane_cost")
    if tuned:
        return {int(k): float(v) for k, v in tuned.items()}
    return _LANE_TILE_COST_TABLES.get(_device_kind(),
                                      _LANE_TILE_COST_FALLBACK)


def _tile_cost_table():
    tuned = _tuned_tables().get("tile_cost")
    if tuned:
        return {tuple(int(x) for x in k.split("x")): float(v)
                for k, v in tuned.items()}
    table = _TILE_COST_TABLES.get(_device_kind())
    if table is not None:
        return table
    global _TUNE_HINT_PRINTED
    if not _TUNE_HINT_PRINTED:
        _TUNE_HINT_PRINTED = True
        print(f"horayzon_tpu: no measured kernel tile-cost table for "
              f"device kind '{_device_kind() or 'unknown'}' — using "
              f"conservative fallback ratios for masked-run tiling.  Run "
              f"`python tools/ablate_kernel.py --tile-sweep` once on this "
              f"device to autotune (cached per device kind).")
    return _TILE_COST_FALLBACK


def _masked_tile_choice(outer_shape, offset, inner_shape, mask):
    """Masked-run kernel tile + placement minimising modelled wall time.

    The compute region is first cropped to the bounding box of unmasked
    cells and the tile grid re-based to its corner (grid-origin-aligned
    tiles waste up to a full tile row/column on each side of a compact
    mask).  For each measured tile shape, the tiles with at least one
    unmasked cell are counted (only those launch —
    pallas_sweep.tile_schedule) and scored
    ``active_tiles * t0 * t1 * measured_cost(t0, t1)``.  Thin tiles track
    a mask's shape more closely but cost more per cell (aligned-slab
    margins, per-tile mip setup), so the optimum depends on the mask
    geometry; the measured table settles it per device.

    Returns ``((r0, c0), (b0p, b1p), (t0, t1), use_mask)``: compute the
    padded block ``(b0p, b1p)`` starting at inner-relative cell
    ``(r0, c0)`` with tile ``(t0, t1)``.  ``use_mask`` False means the
    per-tile mask machinery does not pay for this geometry (e.g. a
    scattered mask touching every tile): run the dense kernel over the
    block and let the caller apply the fill value.  None if no candidate
    fits the outer grid, or if no cell is unmasked (callers fill the
    whole output).
    """
    from horayzon_tpu.ops import pallas_sweep as _pallas

    def up(x, m):
        return ((x + m - 1) // m) * m

    table = _tile_cost_table()
    mask = np.asarray(mask)
    rows = np.flatnonzero(mask.any(axis=1))
    cols = np.flatnonzero(mask.any(axis=0))
    if rows.size == 0:
        return None
    r0, c0 = int(rows[0]), int(cols[0])
    b0 = int(rows[-1]) + 1 - r0
    b1 = int(cols[-1]) + 1 - c0
    sub = mask[r0:r0 + b0, c0:c0 + b1]
    best = None
    dense_cost = None
    for (t0, t1), r in table.items():
        b0p, b1p = up(b0, t0), up(b1, t1)
        if (offset[0] + r0 + b0p > outer_shape[0]
                or offset[1] + c0 + b1p > outer_shape[1]):
            continue
        mask_pad = np.zeros((b0p, b1p), dtype=np.uint8)
        mask_pad[:b0, :b1] = sub
        n_total = (b0p // t0) * (b1p // t1)
        n_active = _pallas.tile_schedule((b0p, b1p), (t0, t1),
                                         mask_pad).shape[0]
        cost = n_active * t0 * t1 * r
        if best is None or cost < best[0]:
            best = (cost, (b0p, b1p), (t0, t1))
        d_cost = n_total * t0 * t1 * r
        if dense_cost is None or d_cost < dense_cost[0]:
            dense_cost = (d_cost, (b0p, b1p), (t0, t1))
    if best is None:
        return None
    if best[0] >= 0.95 * dense_cost[0]:
        # masking saves < 5% of modelled work: the per-call mask overhead
        # (host->device transfer, extra input blocks) would eat it
        return (r0, c0), dense_cost[1], dense_cost[2], False
    return (r0, c0), best[1], best[2], True


#: Maximum row bands a masked run may be decomposed into (each band pays
#: one kernel launch; the pyramid build is shared).
_MAX_MASK_BANDS = 4


def _masked_bands_choice(outer_shape, offset, inner_shape, mask,
                         max_bands=_MAX_MASK_BANDS):
    """Masked-run plan: single bbox block or a row-band decomposition.

    Extends :func:`_masked_tile_choice` toward the reference's per-cell
    skip (horizon_comp.cpp:749): the unmasked bbox is optionally split
    into 2..``max_bands`` contiguous row bands (at tile-row boundaries),
    each with its OWN column bbox — a diagonal or round mask (the ocean
    disc) wastes up to ~40% of a single bbox on never-active columns that
    per-band bboxes reclaim.  All candidate (tile, band-count) pairs are
    scored ``sum over bands of active_tiles * t0 * t1 * cost(t0, t1)``
    with the measured cost table; a multi-band plan must beat the best
    single block by >5% (each extra band pays a kernel launch).

    Returns ``None`` (nothing unmasked / nothing fits),
    ``("single", (r0, c0), (b0p, b1p), (t0, t1), use_mask)`` (delegate to
    the single-block path), or ``("bands", [(blk0, shape, tile, band_mask
    or None), ...])``.
    """
    from horayzon_tpu.ops import pallas_sweep as _pallas

    def up(x, m):
        return ((x + m - 1) // m) * m

    single = _masked_tile_choice(outer_shape, offset, inner_shape, mask)
    if single is None:
        return None
    table = _tile_cost_table()
    mask = np.asarray(mask)
    rows = np.flatnonzero(mask.any(axis=1))
    cols = np.flatnonzero(mask.any(axis=0))
    r0, c0 = int(rows[0]), int(cols[0])
    b0 = int(rows[-1]) + 1 - r0
    sub = mask[r0:r0 + b0, c0:int(cols[-1]) + 1]
    single_cost = None
    best = None
    for (t0, t1), r in table.items():
        n_tr = (b0 + t0 - 1) // t0
        for k in range(1, min(max_bands, n_tr) + 1):
            bounds = [round(n_tr * g / k) for g in range(k + 1)]
            cost_k = 0.0
            bands = []
            feasible = True
            for g in range(k):
                tr0, tr1 = bounds[g], bounds[g + 1]
                if tr1 <= tr0:
                    continue
                rr0 = tr0 * t0
                b0p_g = (tr1 - tr0) * t0
                m_rows = sub[rr0:min(rr0 + b0p_g, b0)]
                bcols = np.flatnonzero(m_rows.any(axis=0))
                if bcols.size == 0:
                    continue
                cg0 = int(bcols[0])
                b1p_g = up(int(bcols[-1]) + 1 - cg0, t1)
                if (offset[0] + r0 + rr0 + b0p_g > outer_shape[0]
                        or offset[1] + c0 + cg0 + b1p_g
                        > outer_shape[1]):
                    feasible = False
                    break
                m_pad = np.zeros((b0p_g, b1p_g), dtype=np.uint8)
                blkm = m_rows[:, cg0:cg0 + b1p_g]
                m_pad[:blkm.shape[0], :blkm.shape[1]] = blkm
                n_act = _pallas.tile_schedule(
                    (b0p_g, b1p_g), (t0, t1), m_pad).shape[0]
                cost_k += n_act * t0 * t1 * r
                bands.append(((r0 + rr0, c0 + cg0), (b0p_g, b1p_g),
                              (t0, t1),
                              m_pad if (m_pad == 0).any() else None))
            if not feasible or not bands:
                continue
            if k == 1 and (single_cost is None or cost_k < single_cost):
                single_cost = cost_k
            if best is None or cost_k < best[0]:
                best = (cost_k, bands)
    if best is None or len(best[1]) == 1 or single_cost is None \
            or best[0] >= 0.95 * single_cost:
        return ("single",) + tuple(single)
    return ("bands", best[1])


def _pallas_padded_shape(outer_shape, offset, inner_shape):
    """Inner shape padded up to Pallas tile multiples, or None if the outer
    grid has no room (padded cells are computed and discarded)."""
    def up(x, m):
        return ((x + m - 1) // m) * m
    in0, in1 = inner_shape
    t0 = 128 if in0 >= 128 else up(in0, 8)
    if in1 >= 256:
        lane_cost = _lane_tile_cost()
        t1 = min(lane_cost, key=lambda t: up(in1, t) * lane_cost[t])
    else:
        t1 = up(in1, 128)
    in0p, in1p = up(in0, t0), up(in1, t1)
    if (offset[0] + in0p > outer_shape[0]
            or offset[1] + in1p > outer_shape[1]):
        return None
    return (in0p, in1p), (t0, t1)


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
        verbose=True,
        engine="auto"):
    """Horizon computation for a gridded domain (TPU sweep).

    Signature and semantics mirror reference horizon.pyx:29-197; rays against
    the DEM are replaced by the shifted-slice sweep (ops/sweep.py).

    ``engine``: "auto" uses the fused Pallas kernel
    (:mod:`horayzon_tpu.ops.pallas_sweep`) when the domain is planar, the
    grid regular and a TPU is attached, falling back to the XLA sweep
    otherwise; "sweep" forces the XLA path; "pallas" forces the kernel
    (raises if unsupported).

    Returns
    -------
    hori : ndarray of float32, shape (in0, in1, azim_num) [radian]
    azim : ndarray of float32, shape (azim_num,) [radian]
    """
    if engine not in ("auto", "sweep", "pallas"):
        raise ValueError("engine must be 'auto', 'sweep' or 'pallas'")
    # --- Validation (mirrors horizon.pyx:109-156) -------------------------
    vec_norm = np.asarray(vec_norm, dtype=np.float32)
    vec_north = np.asarray(vec_north, dtype=np.float32)
    if ((offset_0 + vec_norm.shape[0] > dem_dim_0)
            or (offset_1 + vec_norm.shape[1] > dem_dim_1)):
        raise ValueError("inconsistency between input arguments dem_dim_0, "
                         "dem_dim_1, offset_0, offset_1 and vec_norm")
    if vec_norm.size == 0:
        raise ValueError(
            "inner domain is empty (vec_norm has zero size) — the outer "
            "DEM is not larger than twice the search distance; widen the "
            "domain or reduce dist_search")
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
    inner_shape = (vec_norm.shape[0], vec_norm.shape[1])
    azim = azimuth_angles(azim_num)

    if (vert_simp is None) != (tri_ind_simp is None):
        raise ValueError("vert_simp and tri_ind_simp must be provided "
                         "together")
    if vert_simp is not None:
        # Simplified outer TIN (reference horizon.pyx:84-97 /
        # horizon_comp.cpp:199-218): rasterised to a coarse far-field
        # lattice and swept with the multi-resolution engine.
        if grid is None:
            raise ValueError("the simplified outer TIN (vert_simp) is "
                             "only supported on planar regular grids "
                             "(reference usage: gridded_planar_DEM_2m)")
        t0 = time.perf_counter()
        hori = _tin_gridded(
            z, grid, vert_simp, num_vert_simp, tri_ind_simp, num_tri_simp,
            offset=(offset_0, offset_1), inner_shape=inner_shape,
            azim_num=azim_num, dist_search_m=dist_search * 1000.0,
            hori_acc=hori_acc, elev_ang_low_lim=elev_ang_low_lim,
            ray_org_elev=ray_org_elev, engine=engine,
            mask=mask if mask.min() == 0 else None)
    elif grid is None:
        # Curved ENU mesh: planarise onto a regular lattice, sweep there,
        # then sample the horizon back at the original cell positions.
        t0 = time.perf_counter()
        hori = _curved_gridded(x, y, z, vec_norm, vec_north,
                               offset_0, offset_1, azim,
                               dist_search * 1000.0, hori_acc,
                               elev_ang_low_lim, ray_org_elev,
                               engine=engine,
                               mask=mask if mask.min() == 0 else None)
    else:
        planar = _terrain.is_default_planar_vectors(vec_norm, vec_north)
        if planar:
            geom = None
            u_xy = None
        else:
            geom = _terrain.basis_fields(vec_norm, vec_north)
            u_xy = _terrain.mean_marching_directions(azim, vec_norm,
                                                     vec_north)

        pl_shape = None
        use_mask = False
        blk0 = (0, 0)
        band_plan = None
        if engine in ("auto", "pallas") and planar:
            if mask.min() == 0:
                # Masked run: compute block(s) re-based to the unmasked
                # region; tile shape (and an optional row-band
                # decomposition) chosen by the measured cost model — see
                # _masked_tile_choice / _masked_bands_choice.
                choice = _masked_bands_choice(
                    z.shape, (offset_0, offset_1), inner_shape, mask)
                if choice is not None and choice[0] == "bands":
                    band_plan = choice[1]
                    pl_shape = (band_plan[0][1], band_plan[0][2])
                elif choice is not None:
                    _, blk0, shp_s, tile_s, use_mask = choice
                    pl_shape = (shp_s, tile_s)
            else:
                pl_shape = _pallas_padded_shape(
                    z.shape, (offset_0, offset_1), inner_shape)
        use_pallas = (pl_shape is not None
                      and (engine == "pallas"
                           or (engine == "auto" and _on_tpu())))
        if engine == "pallas" and not use_pallas:
            raise ValueError("engine='pallas' requires a planar regular "
                             "grid with room to pad the inner domain to "
                             "tile multiples")
        if engine == "auto" and planar and pl_shape is None and _on_tpu():
            warnings.warn(
                "horizon_gridded: outer grid has no room to pad the inner "
                "domain to Pallas tile multiples — falling back to the "
                "slower XLA sweep.  Widen the outer DEM (offsets) to "
                "enable the fused kernel.", RuntimeWarning, stacklevel=2)

        t0 = time.perf_counter()
        if use_pallas and band_plan is not None:
            from horayzon_tpu.ops import pallas_sweep as _pallas
            outs = _pallas.horizon_sweep_pallas_bands(
                z, dx=grid.dx, dy=grid.dy, offset=(offset_0, offset_1),
                bands=band_plan, azim_num=azim_num,
                dist_search=dist_search * 1000.0, hori_acc=hori_acc,
                elev_ang_low_lim=elev_ang_low_lim,
                ray_org_elev=ray_org_elev)
            hori = jnp.full(inner_shape + (azim_num,),
                            jnp.float32(hori_fill))
            for (bblk, bshape, _bt, _bm), ob in zip(band_plan, outs):
                v0 = min(bshape[0], inner_shape[0] - bblk[0])
                v1 = min(bshape[1], inner_shape[1] - bblk[1])
                hori = hori.at[bblk[0]:bblk[0] + v0,
                               bblk[1]:bblk[1] + v1].set(ob[:v0, :v1])
        elif use_pallas:
            from horayzon_tpu.ops import pallas_sweep as _pallas
            (in0p, in1p), tile = pl_shape
            # Mask-driven work skipping: tiles with no unmasked cell never
            # run (reference horizon_comp.cpp:749 skips masked cells) and
            # partially masked tiles skip chunks/phases from their
            # unmasked cells only (mask-aware init) — unless the chooser
            # found the mask geometry not worth the mask overhead.
            br0, bc0 = blk0
            mask_pad = None
            if use_mask:
                mask_pad = np.zeros((in0p, in1p), dtype=np.uint8)
                sub = mask[br0:, bc0:]
                mask_pad[:sub.shape[0], :sub.shape[1]] = \
                    sub[:in0p, :in1p]
            hori_b = _pallas.horizon_sweep_pallas(
                z, dx=grid.dx, dy=grid.dy,
                offset=(offset_0 + br0, offset_1 + bc0),
                inner_shape=(in0p, in1p), azim_num=azim_num,
                dist_search=dist_search * 1000.0, hori_acc=hori_acc,
                elev_ang_low_lim=elev_ang_low_lim,
                ray_org_elev=ray_org_elev, tile=tile, mask=mask_pad)
            if blk0 == (0, 0) and in0p >= inner_shape[0] \
                    and in1p >= inner_shape[1]:
                hori = hori_b[:inner_shape[0], :inner_shape[1]]
            else:
                # The padded block may be smaller than the inner domain
                # (bbox at the origin but tile padding short of full
                # size), so always paste rather than slice.
                # paste the bbox block into the full inner output; cells
                # outside the block are masked and get hori_fill below
                v0 = min(in0p, inner_shape[0] - br0)
                v1 = min(in1p, inner_shape[1] - bc0)
                hori = jnp.full(inner_shape + (azim_num,),
                                jnp.float32(hori_fill))
                hori = hori.at[br0:br0 + v0, bc0:bc0 + v1].set(
                    hori_b[:v0, :v1])
        else:
            # Mask-driven work reduction (reference skips masked cells,
            # horizon_comp.cpp:749): crop the sweep to the bounding box of
            # unmasked cells; outside-bbox cells get hori_fill below.
            r0, r1, c0, c1 = _mask_bbox(mask)
            if geom is not None and (r0, r1, c0, c1) != (
                    0, inner_shape[0], 0, inner_shape[1]):
                geom_c = {k: v[r0:r1, c0:c1] for k, v in geom.items()}
            else:
                geom_c = geom
            hori_c, _ = _sweep.horizon_sweep(
                z, dx=grid.dx, dy=grid.dy,
                offset=(offset_0 + r0, offset_1 + c0),
                inner_shape=(r1 - r0, c1 - c0), azim=azim,
                dist_search=dist_search * 1000.0,
                hori_acc=hori_acc, elev_ang_low_lim=elev_ang_low_lim,
                ray_org_elev=ray_org_elev, geom=geom_c, u_xy=u_xy)
            if (r0, r1, c0, c1) == (0, inner_shape[0], 0, inner_shape[1]):
                hori = hori_c
            else:
                hori = np.full(inner_shape + (azim_num,),
                               np.float32(hori_fill))
                hori[r0:r1, c0:c1] = np.asarray(hori_c)
    if mask.min() == 0:
        m = jnp.asarray(mask[..., None] == 1)
        hori = jnp.where(m, hori, jnp.float32(hori_fill))
    hori = np.asarray(hori)
    if verbose:
        n_cells = int((mask == 1).sum())
        n_tot = mask.size
        dt = time.perf_counter() - t0
        print(f"Horizon sweep: {inner_shape[0]}x{inner_shape[1]} cells, "
              f"{azim_num} azimuths, {dt:.3f} s "
              f"(incl. compile on first call)")
        # considered-fraction printout mirrors horizon_comp.cpp:685-695
        print(f"Number of grid cells for which horizon is computed: "
              f"{n_cells} ({100.0 * n_cells / n_tot:.2f} % of the domain)")
    return hori, azim


def _tin_gridded(z, grid, vert_simp, num_vert_simp, tri_ind_simp,
                 num_tri_simp, *, offset, inner_shape, azim_num,
                 dist_search_m, hori_acc, elev_ang_low_lim, ray_org_elev,
                 engine, mask=None):
    """Gridded horizon with a simplified outer TIN as the far field.

    The TIN (reference: built by the external ``hmm`` tool and attached to
    the Embree scene, gridded_planar_DEM_2m.py:130-265) is rasterised onto
    a coarse lattice aligned with the fine grid and swept with the
    multi-resolution engine (:mod:`horayzon_tpu.ops.multires`); the
    coarsening ratio is chosen from the TIN's triangle density and reduced
    until the fine-grid halo covers all sub-ratio marching phases.
    """
    import math

    from horayzon_tpu.ops import multires as _multires
    from horayzon_tpu.ops import sweep as _sweep_mod

    verts = np.asarray(vert_simp, dtype=np.float32)
    tris = np.asarray(tri_ind_simp, dtype=np.int32).reshape(-1)
    n_tri = int(min(num_tri_simp, len(tris) // 3))
    tris = tris[:3 * n_tri]

    # Coarsening ratio from the TIN's mean triangle footprint (two
    # triangles per quad of coarse cells), capped by the fine halo.
    vxy = verts.reshape(-1, 3)[:max(1, int(num_vert_simp))]
    bbox_cells = (max(np.ptp(vxy[:, 0]) / abs(grid.dx), 1.0)
                  * max(np.ptp(vxy[:, 1]) / abs(grid.dy), 1.0))
    cells_per_tri = max(bbox_cells / max(n_tri, 1), 2.0)
    ratio_log2 = int(np.clip(round(math.log2(math.sqrt(cells_per_tri
                                                       / 2.0))), 1, 8))

    step = min(abs(grid.dx), abs(grid.dy))
    rel_err = _sweep_mod.default_rel_err(hori_acc)
    schedule = _sweep_mod.build_schedule(step, dist_search_m, rel_err)

    # Decide the engine first: the Pallas path pads the inner domain to
    # tile multiples, which shrinks the fine halo, so the ratio-reduction
    # validation must run against the shape the engine will actually use.
    pl_shape = None
    if engine in ("auto", "pallas"):
        pl_shape = _pallas_padded_shape(z.shape, offset, inner_shape)
    if engine == "pallas" and pl_shape is None:
        raise ValueError("engine='pallas' requires room in the outer grid "
                         "to pad the inner domain to tile multiples")
    use_pallas = (pl_shape is not None
                  and (engine == "pallas"
                       or (engine == "auto" and _on_tpu())))

    def reduce_ratio(r0, shape):
        r = r0
        while r > 1:
            try:
                _multires._validate_fine_halo(schedule, r, step, offset,
                                              shape, z.shape)
                return r
            except ValueError:
                r -= 1
        _multires._validate_fine_halo(schedule, 1, step, offset, shape,
                                      z.shape)
        return 1

    if use_pallas:
        try:
            ratio_log2 = reduce_ratio(ratio_log2, pl_shape[0])
        except ValueError:
            if engine == "pallas":
                raise
            # auto: the padded halo is too small even at ratio 1 — fall
            # back to the XLA sweep (unpadded), which may still fit.
            use_pallas = False
    if not use_pallas:
        # raises with the halo explanation if even ratio 1 fails
        ratio_log2 = reduce_ratio(ratio_log2, inner_shape)

    z_coarse, coarse_offset = _multires.coarse_grid_from_tin(
        verts, tris, grid=grid, fine_shape=z.shape, z_fine=z,
        ratio_log2=ratio_log2, dist_search=dist_search_m)

    kw = dict(ratio_log2=ratio_log2, coarse_offset=coarse_offset,
              dx=grid.dx, dy=grid.dy, offset=offset,
              dist_search=dist_search_m, hori_acc=hori_acc,
              elev_ang_low_lim=elev_ang_low_lim,
              ray_org_elev=ray_org_elev)
    if use_pallas:
        (in0p, in1p), tile = pl_shape
        mask_pad = None
        if mask is not None:
            mask_pad = np.zeros((in0p, in1p), dtype=np.uint8)
            mask_pad[:inner_shape[0], :inner_shape[1]] = mask
        hori = _multires.horizon_sweep_multires_pallas(
            z, z_coarse, inner_shape=(in0p, in1p), azim_num=azim_num,
            tile=tile, mask=mask_pad, **kw)
        return hori[:inner_shape[0], :inner_shape[1]]
    azim = azimuth_angles(azim_num)
    return _multires.horizon_sweep_multires(
        z, z_coarse, inner_shape=inner_shape, azim=azim, **kw)


def _curved_gridded(x, y, z, vec_norm, vec_north, offset_0, offset_1, azim,
                    dist_search_m, hori_acc, elev_ang_low_lim, ray_org_elev,
                    engine="auto", mask=None):
    """Curved-mesh gridded horizon: planarise -> general sweep -> sample back.

    The reference builds an Embree BVH directly over the irregular ENU
    vertex cloud (horizon_comp.cpp:101-231); here the mesh is resampled to a
    regular lattice at native resolution (:mod:`horayzon_tpu.regrid`), the
    sweep runs in general (per-cell tangent frame) mode, and the horizon is
    bilinearly read back at the original inner-cell positions.

    On TPU the fast path runs the *planar* Pallas kernel with a
    per-(cell, azimuth) tilt-ramp correction: in ENU the curvature drop is
    already in the lattice heights, so the local-tangent-frame ratio equals
    the planar ratio plus ``sin(az)*m_x/m_z + cos(az)*m_y/m_z`` to first
    order in the normal tilt (error O(tilt^2) <~ 1e-4 rad at 100 km).
    """
    from horayzon_tpu import regrid as _regrid

    in0, in1 = vec_norm.shape[:2]
    pg = _regrid.planarize(x, y, z)
    hr, wr = pg.grid.shape

    # Positions of the original inner cells on the regular lattice
    x_in = x[offset_0:offset_0 + in0, offset_1:offset_1 + in1]
    y_in = y[offset_0:offset_0 + in0, offset_1:offset_1 + in1]
    fi_in, fj_in = pg.to_regular_indices(x_in, y_in)

    # Regular-lattice inner superset (bounding box + 1-cell margin).  With
    # a mask, only unmasked cells bound the box (the reference skips
    # masked cells per-cell, horizon_comp.cpp:749; here the sweep shrinks
    # to the unmasked bounding box and masked cells outside it read
    # clipped values that the caller overwrites with hori_fill).
    if mask is not None and (mask == 1).any():
        sel = mask == 1
        fi_b, fj_b = fi_in[sel], fj_in[sel]
    else:
        fi_b, fj_b = fi_in, fj_in
    i_lo = max(int(np.floor(fi_b.min())) - 1, 0)
    i_hi = min(int(np.ceil(fi_b.max())) + 2, hr)
    j_lo = max(int(np.floor(fj_b.min())) - 1, 0)
    j_hi = min(int(np.ceil(fj_b.max())) + 2, wr)
    rin0 = i_hi - i_lo
    rin1 = j_hi - j_lo

    # The fused kernel pads the inner lattice block to tile multiples to
    # the right/down; when the lattice has no room there (the inner box
    # hugs its south/east edge), shift the window start up/left instead —
    # the box start is only a lower bound, so enlarging it keeps every
    # read-back position inside and the kernel path available (previously
    # such domains fell back to the slow XLA sweep).
    if (engine == "pallas" or (engine == "auto" and _on_tpu())) \
            and _pallas_padded_shape((hr, wr), (i_lo, j_lo),
                                     (rin0, rin1)) is None:
        def _up(x, m):
            return ((x + m - 1) // m) * m
        t0s = 128 if rin0 >= 128 else _up(rin0, 8)
        t1s = 256 if rin1 >= 256 else _up(rin1, 128)
        p0s, p1s = _up(rin0, t0s), _up(rin1, t1s)
        if p0s <= hr and p1s <= wr:
            i_lo = min(i_lo, hr - p0s)
            j_lo = min(j_lo, wr - p1s)
            i_hi, j_hi = i_lo + p0s, j_lo + p1s
            rin0, rin1 = p0s, p1s

    # Basis vectors at the regular inner cells: interpolate the caller's
    # per-inner-cell fields through original index space.  (fi_src, fj_src)
    # of regular cells come from the planarisation's inverse mapping.
    fi_src = pg.fi[i_lo:i_hi, j_lo:j_hi] - offset_0
    fj_src = pg.fj[i_lo:i_hi, j_lo:j_hi] - offset_1
    fi_src = np.clip(fi_src, 0.0, in0 - 1.0)
    fj_src = np.clip(fj_src, 0.0, in1 - 1.0)
    norm_r = _regrid._bilinear(vec_norm.astype(np.float64), fi_src, fj_src)
    north_r = _regrid._bilinear(vec_north.astype(np.float64), fi_src,
                                fj_src)
    norm_r /= np.linalg.norm(norm_r, axis=-1, keepdims=True)
    north_r -= np.sum(north_r * norm_r, axis=-1, keepdims=True) * norm_r
    north_r /= np.linalg.norm(north_r, axis=-1, keepdims=True)
    norm_r = norm_r.astype(np.float32)
    north_r = north_r.astype(np.float32)

    # Masked curved runs: map the caller's per-cell mask through the
    # planarisation onto the regular lattice (a lattice cell is needed iff
    # an unmasked original cell's bilinear read-back stencil touches it)
    # and engage the same cost-model masked tiling as planar runs — the
    # reference's masked example IS curved (South Georgia,
    # examples/horizon/gridded_curved_DEM_masked.py; per-cell skip at
    # horizon_comp.cpp:749).  Masked tiles never launch; unmasked lattice
    # values are bit-equal to the dense run (mask-aware init skips are
    # value-exact), so the sampled-back horizon of unmasked cells is too.
    lat_mask = None
    if mask is not None and (mask == 1).any():
        lat_mask = np.zeros((rin0, rin1), dtype=np.uint8)
        fi_l = np.clip(fi_b - i_lo, 0.0, rin0 - 1.0)
        fj_l = np.clip(fj_b - j_lo, 0.0, rin1 - 1.0)
        i0m = np.floor(fi_l).astype(np.int64)
        j0m = np.floor(fj_l).astype(np.int64)
        for di in (0, 1):
            for dj in (0, 1):
                lat_mask[np.clip(i0m + di, 0, rin0 - 1),
                         np.clip(j0m + dj, 0, rin1 - 1)] = 1

    pl_shape = None
    use_mask_k = False
    blk0 = (0, 0)
    if engine in ("auto", "pallas"):
        if lat_mask is not None:
            choice = _masked_tile_choice((hr, wr), (i_lo, j_lo),
                                         (rin0, rin1), lat_mask)
            if choice is not None:
                blk0, pl_shape, use_mask_k = (
                    choice[0], choice[1:3], choice[3])
        if pl_shape is None:
            pl_shape = _pallas_padded_shape((hr, wr), (i_lo, j_lo),
                                            (rin0, rin1))
    if pl_shape is not None and (engine == "pallas"
                                 or (engine == "auto" and _on_tpu())):
        from horayzon_tpu.ops import pallas_sweep as _pallas
        (p0, p1), tile = pl_shape
        br0, bc0 = blk0
        mask_pad = None
        if use_mask_k:
            mask_pad = np.zeros((p0, p1), dtype=np.uint8)
            sub = lat_mask[br0:, bc0:]
            mask_pad[:sub.shape[0], :sub.shape[1]] = sub[:p0, :p1]

        def _blk(field):
            f = field[br0:br0 + p0, bc0:bc0 + p1]
            return np.pad(f, ((0, p0 - f.shape[0]), (0, p1 - f.shape[1])),
                          mode="edge")

        ramp_a = _blk((norm_r[..., 0] / norm_r[..., 2]).astype(np.float32))
        ramp_b = _blk((norm_r[..., 1] / norm_r[..., 2]).astype(np.float32))
        hori_blk = _pallas.horizon_sweep_pallas(
            pg.z, dx=pg.grid.dx, dy=pg.grid.dy,
            offset=(i_lo + br0, j_lo + bc0),
            inner_shape=(p0, p1), azim_num=len(azim),
            dist_search=dist_search_m, hori_acc=hori_acc,
            elev_ang_low_lim=elev_ang_low_lim, ray_org_elev=ray_org_elev,
            tile=tile, tilt_ramp=(ramp_a, ramp_b), mask=mask_pad)
        if blk0 == (0, 0) and p0 >= rin0 and p1 >= rin1:
            hori_r = np.asarray(hori_blk[:rin0, :rin1])
        else:
            # paste the computed block; cells outside it are only read
            # back by masked original cells, which get hori_fill upstream
            v0 = min(p0, rin0 - br0)
            v1 = min(p1, rin1 - bc0)
            hori_r = np.zeros((rin0, rin1, len(azim)), dtype=np.float32)
            hori_r[br0:br0 + v0, bc0:bc0 + v1] = \
                np.asarray(hori_blk[:v0, :v1])
    else:
        geom = _terrain.basis_fields(norm_r, north_r)
        u_xy = _terrain.mean_marching_directions(azim, norm_r, north_r)

        hori_r, _ = _sweep.horizon_sweep(
            pg.z, dx=pg.grid.dx, dy=pg.grid.dy, offset=(i_lo, j_lo),
            inner_shape=(rin0, rin1), azim=azim, dist_search=dist_search_m,
            hori_acc=hori_acc, elev_ang_low_lim=elev_ang_low_lim,
            ray_org_elev=ray_org_elev, geom=geom, u_xy=u_xy)
        hori_r = np.asarray(hori_r)

    # Sample back at the original cell positions (masked cells may fall
    # outside the reduced box — clip; their values are replaced by
    # hori_fill in horizon_gridded)
    out = _regrid._bilinear(hori_r.astype(np.float64),
                            np.clip(fi_in - i_lo, 0.0, rin0 - 1.0),
                            np.clip(fj_in - j_lo, 0.0, rin1 - 1.0))
    return jnp.asarray(out.astype(np.float32))


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
        # Curved ENU mesh: planarise; the per-location sweep measures angles
        # in each location's own tangent frame, so it runs unchanged on the
        # resampled lattice (locations keep their exact ENU coordinates).
        from horayzon_tpu import regrid as _regrid
        pg = _regrid.planarize(x, y, z)
        grid = pg.grid
        z = pg.z

    from horayzon_tpu.ops import locations as _locations
    azim = azimuth_angles(azim_num)
    hori, hori_dist = _locations.horizon_locations_sweep(
        z, grid, coords, vec_norm, vec_north, azim,
        dist_search * 1000.0, hori_acc, elev_ang_low_lim,
        ray_org_elev)
    if hori_dist_out:
        return np.asarray(hori), np.asarray(hori_dist), azim
    return np.asarray(hori), azim
