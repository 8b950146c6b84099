"""Profiling and memory accounting helpers.

Replaces the reference's manual MemTracker (cat_seg/gpu_mem_track.py, which
walked gc for live CUDA tensors) with the TPU-native equivalents:
per-device live-buffer accounting and jax.profiler traces.
"""

from __future__ import annotations

import contextlib


def device_memory_stats() -> dict:
    """Per-device live buffer bytes (and peak where the backend reports it)."""
    import jax

    stats = {}
    for d in jax.devices():
        try:
            ms = d.memory_stats() or {}
        except (RuntimeError, AttributeError):
            ms = {}
        stats[str(d)] = {
            "bytes_in_use": ms.get("bytes_in_use"),
            "peak_bytes_in_use": ms.get("peak_bytes_in_use"),
            "bytes_limit": ms.get("bytes_limit"),
        }
    return stats


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context: view with TensorBoard or xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def log_compiles():
    """Context manager: print every XLA compilation (shape-bucket debugging)."""
    import jax

    return jax.log_compiles()
