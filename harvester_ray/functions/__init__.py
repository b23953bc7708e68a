"""Scalar/per-record functions mirrored from the reference's normalizers."""
