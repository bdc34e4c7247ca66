"""Order-insensitive DataFrame comparison mirroring the driver's t2 gate."""

from __future__ import annotations

import math

import pandas as pd


def canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]

    def cell(v):
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return tuple(cell(x) for x in v)
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)
        return str(v)

    return sorted(tuple(cell(v) for v in row) for row in df.itertuples(index=False))


def assert_matches_oracle(spark_df, duck_con, oracle: str, name: str = "query"):
    spark_pd = spark_df.toPandas()
    duck_pd = duck_con.sql(oracle).df()
    assert sorted(spark_pd.columns) == sorted(duck_pd.columns), (
        f"{name}: columns {sorted(spark_pd.columns)} != {sorted(duck_pd.columns)}"
    )
    assert len(spark_pd) == len(duck_pd), (
        f"{name}: rowcount {len(spark_pd)} != {len(duck_pd)}"
    )
    cs, cd = canon(spark_pd), canon(duck_pd)
    if cs != cd:
        bad = next(i for i, (a, b) in enumerate(zip(cs, cd)) if a != b)
        raise AssertionError(f"{name}: row {bad}\nspark={cs[bad]}\nduck ={cd[bad]}")
