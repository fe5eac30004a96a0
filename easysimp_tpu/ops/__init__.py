"""Compute kernels: elements, operators, filters, OC, solvers."""
