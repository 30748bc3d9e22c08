# Copyright (c) 2026
# MIT License
"""High-level pipeline models (end-to-end DEM -> terrain parameters)."""

from horayzon_tpu.models.pipeline import CurvedPipeline, PlanarPipeline
