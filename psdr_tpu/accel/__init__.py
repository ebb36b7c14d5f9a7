from .bruteforce import ray_intersect_brute, HitRecord
