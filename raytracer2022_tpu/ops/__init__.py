"""Compute kernels: vector math, samplers, intersection, shading."""
