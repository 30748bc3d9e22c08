# Copyright (c) 2026
# MIT License
"""Native (C++) host-side helpers: fast DEM parsing and a CPU reference
ray-marcher used for validation.  Built lazily via ``build.py``; all
functionality has pure-NumPy fallbacks."""
