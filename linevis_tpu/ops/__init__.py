"""Reusable accelerated ops (BVH build, Morton codes, prefix utilities)."""
