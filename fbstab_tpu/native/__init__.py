"""Native (C) host-side kernels, built lazily by utils/native_ldl.py."""
