"""Geometry ops: transform, AABB, broad phase, narrow phase, XLA pipeline."""
from . import aabb, narrow, transform
from .pipeline import CheckResult, CollisionWorld, PipelineConfig, broad_phase

__all__ = [
    "aabb", "narrow", "transform",
    "CollisionWorld", "PipelineConfig", "CheckResult", "broad_phase",
]
