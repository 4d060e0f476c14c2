"""Pure column-expression kernels — no UDFs, no Python in the hot path —
plus the executor-side pure-Python codec/algorithm kernels the E4/X2
Arrow surfaces call (``png_codec``, ``wav_codec``, ``abbrev``).

The normalizer/identifier modules compile to Catalyst expressions inside
whole-stage codegen, so they cost the same as built-ins at 100 TB; the
codec kernels are stdlib-only and run inside Arrow-batched mapInPandas.
"""
