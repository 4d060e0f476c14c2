"""Pure column-expression kernels — no UDFs, no Python in the hot path.

Everything here compiles to Catalyst expressions inside whole-stage
codegen, so these normalizers cost the same as built-ins at 100 TB.
"""
