# Copyright (c) 2026
# MIT License
"""Atmospheric refraction of the sun vector (Saemundsson 1986).

jnp port of the reference's refraction path (shadow_comp.cpp:135-159
``atmos_refrac``, :109-132 ``vec_rot`` Rodrigues rotation, and the reference
atmosphere constants in CppTerrain::initialise, shadow_comp.cpp:348-354).
"""

import jax.numpy as jnp

# Reference atmosphere (shadow_comp.cpp:348-354)
TEMPERATURE_REF = 283.15     # reference sea-level temperature [K]
PRESSURE_REF = 101.0         # reference sea-level pressure [kPa]
LAPSE_RATE = 0.0065          # temperature lapse rate [K m-1]
_G = 9.81                    # gravity [m s-2]
_R_D = 287.0                 # gas constant for dry air [J K-1 kg-1]
BAROMETRIC_EXP = _G / (_R_D * LAPSE_RATE)


def atmos_refrac(elev_ang_true_deg, temp_degc, pressure_kpa):
    """Refraction correction [degree] (shadow_comp.cpp:135-159).

    Saemundsson's formula with the pressure/temperature scaling of Meeus
    (1998, p. 106); input elevation angle clamped to [-1, 90] degrees.
    """
    e = jnp.clip(elev_ang_true_deg, -1.0, 90.0)
    refrac = 1.02 / jnp.tan(jnp.deg2rad(e + 10.3 / (e + 5.11)))
    refrac = refrac + 0.0019279   # R = 0 at h = 90 degrees
    refrac = refrac * (pressure_kpa / 101.0) * (283.0 / (273.0 + temp_degc))
    return refrac / 60.0


def rodrigues_rotate(k, theta, v):
    """Rotate vectors ``v`` about unit axes ``k`` by angle ``theta`` [radian].

    Vectorised Rodrigues rotation (shadow_comp.cpp:109-132); ``k`` and ``v``
    have components in the last dimension, ``theta`` broadcasts.
    """
    cos_t = jnp.cos(theta)[..., None]
    sin_t = jnp.sin(theta)[..., None]
    kdotv = jnp.sum(k * v, axis=-1, keepdims=True)
    return (v * cos_t + jnp.cross(k, v) * sin_t
            + k * kdotv * (1.0 - cos_t))


def refract_sun_vector(sun_vec, vec_norm, elevation):
    """Apply atmospheric refraction to per-cell sun unit vectors.

    Mirrors the in-loop refraction of shadow_comp.cpp:430-446: compute the
    true solar elevation from the surface-normal dot product, evaluate the
    reference-atmosphere temperature/pressure at the cell's elevation, and
    rotate the sun vector upwards (about ``sun x norm``) by the refraction
    angle.

    Parameters
    ----------
    sun_vec : (..., 3) unit vectors towards the sun
    vec_norm : (..., 3) surface-normal (ellipsoid-normal) unit vectors
    elevation : (...,) orthometric elevation [metre]
    """
    dot_ns = jnp.sum(vec_norm * sun_vec, axis=-1)
    elev_true = 90.0 - jnp.rad2deg(jnp.arccos(jnp.clip(dot_ns, -1.0, 1.0)))
    temperature = TEMPERATURE_REF - LAPSE_RATE * elevation
    pressure = PRESSURE_REF * (temperature / TEMPERATURE_REF) ** BAROMETRIC_EXP
    refrac_deg = atmos_refrac(elev_true, temperature - 273.15, pressure)
    axis = jnp.cross(sun_vec, vec_norm)
    axis = axis / jnp.maximum(
        jnp.linalg.norm(axis, axis=-1, keepdims=True), 1.0e-20)
    return rodrigues_rotate(axis, jnp.deg2rad(refrac_deg), sun_vec)
