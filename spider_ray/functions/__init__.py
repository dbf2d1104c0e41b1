"""Pure, deterministic per-record functions (the reference's scalar ops).

Everything in this package is stateless and picklable; the hot-path entry
points operate on whole Arrow/numpy batches where vectorization is possible.
"""
