# Copyright (c) 2026
# MIT License
"""Host-side utilities (output writers, profiling)."""
