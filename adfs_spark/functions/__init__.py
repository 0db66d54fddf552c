"""Scalar functions and large-scale pipeline extensions."""
