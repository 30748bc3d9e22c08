# Copyright (c) 2026
# MIT License
"""Log-doubling shadow scan: terrain occlusion in O(log N) passes.

The sun-occlusion test is, per cell, ``exists k >= 1:
h(q + k*D*u) - m*k*D > z_org(q)`` — the maximum over the ray of a quantity
that is *linear in the marching distance*.  Unlike the horizon angle (whose
``(h - z0)/s`` is nonlinear in s), this maximum is associative under
concatenation of ray segments:

    S_L(q)   = max_{1 <= k <= L} [ h(q + k D u) - m k D ]
    S_2L(q)  = max( S_L(q),  S_L(q + L D u) - m L D )

so the whole grid's occlusion field is computed with ``ceil(log2 K)``
shifted-max passes (each one bilinear shift + subtract + max) instead of K
marching samples — the parallel-prefix ("shadow heights") formulation.

Trade-offs: the scan fields live on the search-distance-padded grid, so per
pass the arrays are ``(H + 2K)^2`` rather than inner-sized — the approach
wins when the search distance is comparable to the domain (typical for
shadows, tfar = inf in the reference) and when many sun positions batch.
The marching direction and ray slope ``m`` are taken at the domain centre,
and the doubling shifts bilinearly interpolate intermediate max-fields
(log-depth interpolation of maxima can locally under-estimate an occluder
by the within-cell variation; sub-cell effect).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax

from horayzon_tpu.ops import mip as _mip

_NEG = -3.0e37


@functools.partial(jax.jit, static_argnames=("num_doublings", "pad",
                                             "offset", "inner_shape"))
def _shadow_scan_core(z_outer, z_org, m_slope_mean, u_cells, step, *,
                      num_doublings, pad, offset, inner_shape):
    """Suffix-max field via log-doubling; returns occlusion metric
    ``S(q) - z_org(q)`` for the inner cells (positive -> occluded)."""
    zp = _mip.pad_level(jnp.asarray(z_outer, jnp.float32), pad)
    h, w = zp.shape
    off0, off1 = offset
    in0, in1 = inner_shape

    ui = u_cells[0]   # row cells per metre
    uj = u_cells[1]   # col cells per metre

    def shifted(field, dist_m):
        """field(q + dist*u) for every q, by one bilinear whole-grid shift.

        Reads beyond the field resolve to the sentinel (no terrain)."""
        di = dist_m * ui
        dj = dist_m * uj
        fi0 = jnp.floor(di)
        fj0 = jnp.floor(dj)
        fi = di - fi0
        fj = dj - fj0
        # Ephemeral pad so the slice is in-range for any |shift| <= pad
        big = jnp.pad(field, pad + 1, constant_values=_NEG)
        i0 = fi0.astype(jnp.int32) + (pad + 1)
        j0 = fj0.astype(jnp.int32) + (pad + 1)
        win = lax.dynamic_slice(big, (i0, j0), (h + 1, w + 1))
        top = (1 - fj) * win[:-1, :-1] + fj * win[:-1, 1:]
        bot = (1 - fj) * win[1:, :-1] + fj * win[1:, 1:]
        return (1 - fi) * top + fi * bot

    # Base: S_1(q) = h(q + step*u) - m*step
    s_field = shifted(zp, step) - m_slope_mean * step

    def body(j, s_field):
        dist = step * (2.0 ** j)
        return jnp.maximum(s_field,
                           shifted(s_field, dist) - m_slope_mean * dist)

    s_field = lax.fori_loop(0, num_doublings, body, s_field)
    inner = lax.dynamic_slice(s_field, (off0 + pad, off1 + pad),
                              (in0, in1))
    return inner - z_org


def shadow_scan_metric(z_outer, z_org, m_slope_mean, u_cells, step,
                       max_dist, offset, inner_shape):
    """Occlusion metric via the log-doubling scan (positive -> occluded).

    ``m_slope_mean`` is the (traced scalar) domain-mean ray slope dz/ds;
    ``u_cells`` = (uy/dy, ux/dx) traced horizontal direction in cells/m.
    ``max_dist`` [m] bounds the ray length (static).
    """
    k = max(1, int(math.ceil(max_dist / step)))
    num_doublings = max(0, int(math.ceil(math.log2(k))))
    pad = int(math.ceil(max_dist / step)) + 2
    return _shadow_scan_core(
        z_outer, z_org, m_slope_mean, jnp.asarray(u_cells, jnp.float32),
        float(step),
        num_doublings=num_doublings, pad=pad,
        offset=(int(offset[0]), int(offset[1])),
        inner_shape=tuple(inner_shape))
