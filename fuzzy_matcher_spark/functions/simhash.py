"""SimHash fingerprints (Charikar 2002) + Hamming-distance buckets.

64-bit SimHash over the same JVM-computed shingle hashes as MinHash:
bit j of the fingerprint is the sign of sum over shingles of
(2*bit_j(h) - 1). numpy-vectorized pandas UDF (one hop).

Near-dup candidates: two fingerprints within Hamming distance r.
Bucketing uses the standard bit-slicing scheme: split 64 bits into
``tables`` contiguous slices; by pigeonhole, any pair within Hamming
distance (tables - 1) agrees exactly on at least one slice, so an
equi-join per slice finds all such pairs. Verification then computes
bit_count(a XOR b) <= r — a pure JVM expression.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BITS = 64


@F.pandas_udf(T.LongType())
def simhash64_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    shifts = np.arange(_BITS, dtype=np.uint64)
    for hashes in it:
        out = np.zeros(len(hashes), dtype=np.int64)
        for i, h in enumerate(hashes):
            if h is None or len(h) == 0:
                continue
            x = np.asarray(h, dtype=np.int64).astype(np.uint64)
            bits = (x[:, None] >> shifts[None, :]) & np.uint64(1)
            votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
            fp = np.uint64(0)
            for j in range(_BITS):
                if votes[j] > 0:
                    fp |= np.uint64(1) << np.uint64(j)
            out[i] = np.int64(fp.astype(np.int64))
        yield pd.Series(out)


def hamming_col(a: Column | str, b: Column | str) -> Column:
    """bit_count(a XOR b) — whole-stage-codegen'd."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.bit_count(ca.bitwiseXOR(cb))


def simhash_slices_col(fp: Column | str, tables: int) -> Column:
    """array<struct<table_id int, slice_key long>> — contiguous bit
    slices of the fingerprint, each tagged with its table id."""
    c = F.col(fp) if isinstance(fp, str) else fp
    width = _BITS // tables
    mask = (1 << width) - 1
    return F.array(
        *[
            F.struct(
                F.lit(t).cast("int").alias("table_id"),
                F.shiftrightunsigned(c, t * width)
                .bitwiseAND(F.lit(mask))
                .alias("slice_key"),
            )
            for t in range(tables)
        ]
    )


def explode_slices(df: DataFrame, id_col: str, fp_col: str, tables: int) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.col(fp_col),
        F.explode(simhash_slices_col(fp_col, tables)).alias("s"),
    ).select(id_col, fp_col, F.col("s.table_id"), F.col("s.slice_key"))
