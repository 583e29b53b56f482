"""Driver-literal DataFrames with a JVM-resident scan.

``spark.createDataFrame(list_of_rows, schema)`` parallelizes the rows
into a PYTHON RDD: every ACTION on any plan containing that relation
re-runs a Python scan job, which on the bench box costs ~0.2-0.4 s of
Python-worker dispatch — per execution, per literal relation (measured
r11: the 10-row bucket dimension of ``join_range_theta`` accounted for
0.43 s of its 0.63 s gate median).

``local_df`` routes the same rows through one pyarrow Table instead:
Spark ingests the Arrow batches once at session side and the scan is
JVM-only at every execution.  Values are bit-identical to the classic
path — ``from_pandas=False`` keeps a float NaN a VALUE (never coerced
to null, at top level or inside arrays; verified element-wise against
the classic path, tests/test_localdata.py) — and any schema or value
Arrow cannot represent falls back to the classic path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Drop-in for ``spark.createDataFrame(rows, schema)`` for
    driver-side literal fixtures (rows = iterable of tuples, schema =
    DDL string or StructType)."""
    rows = list(rows)
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        st = (StructType.fromDDL(schema) if isinstance(schema, str)
              else schema)
        asch = to_arrow_schema(st)
        if rows:
            cols = list(zip(*[tuple(r) for r in rows]))
            if len(cols) != len(asch):
                raise ValueError("row arity != schema arity")
        else:
            cols = [[] for _ in asch]
        arrs = [pa.array(list(c), type=f.type, from_pandas=False)
                for c, f in zip(cols, asch)]
        tbl = pa.Table.from_arrays(arrs, schema=asch)
        return spark.createDataFrame(tbl, schema=st)
    except Exception:
        return spark.createDataFrame(rows, schema)
