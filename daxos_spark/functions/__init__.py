"""Scalar/vector function surface (JVM-side Column expressions).

Everything here returns pyspark Column expressions built from builtin
functions — no Python UDFs — so the whole surface stays inside
whole-stage codegen and is usable at 100 TB.
"""
