"""Column-expression function libraries (text, vectors).

Everything here returns Spark Column expressions built from
`pyspark.sql.functions` — JVM-side, codegen-friendly, no Python UDFs — so
Catalyst can optimize through them and they cost the same at 100 TB as any
built-in.
"""
