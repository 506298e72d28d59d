"""Scalar/expression-level functions shared by the engine's operators.

Everything in this package is a *Catalyst expression builder* — pure
JVM-side `pyspark.sql.functions` compositions, no Python UDFs — plus,
for each construct, a DuckDB-SQL twin used by the correctness oracles.
Keeping the Spark expression and its SQL twin side by side in one
module is what keeps them in lockstep.
"""
