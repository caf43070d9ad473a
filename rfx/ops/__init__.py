from .intersect import (
    ray_mesh_closest_hit_brute,
    ray_sphere_hit,
    make_env_intersector,
)

__all__ = [
    "ray_mesh_closest_hit_brute",
    "ray_sphere_hit",
    "make_env_intersector",
]
