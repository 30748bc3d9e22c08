# Copyright (c) 2026
# MIT License
"""Device meshes and sharded sweep entry points (multi-chip scaling)."""

from horayzon_tpu.parallel import distributed
from horayzon_tpu.parallel import mesh
from horayzon_tpu.parallel import shard
from horayzon_tpu.parallel.distributed import init_distributed
