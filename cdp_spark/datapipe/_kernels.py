"""Vectorized Arrow kernels for the hash-fold primitives
(optimization r16).  The original formulations folded a num_perm-wide
(resp. 64-wide) lambda through Catalyst higher-order functions:
aggregate/zip_with bodies are evaluated INTERPRETED per array element,
allocating a fresh accumulator array per step — O(elements x width)
interpreted expression evaluations per document, measured as the
dominant cost of every minhash/simhash operator (guide §4.2: hand
whole batches to vectorized native kernels instead).  String hashing
stays JVM-side (md5/xxhash64, codegen); only the wide arithmetic fold
crosses to Arrow+numpy, as exact int64 math — results are
bit-identical to the Column folds (tests/test_round16_kernels.py).

The kernels run through ``mapInPandas`` (``attach_kernel_column``), a
plan NODE, deliberately NOT through scalar pandas UDF expressions:
Spark 4.1.2's ExtractPythonUDFs intermittently fails to extract a
scalar Python UDF whose projection sits above another operator
(Repartition/Union/cache) with a Generate downstream — execution dies
with "Cannot evaluate expression: PythonUDF", and the outcome is
in-session order-dependent (measured: the same query passes alone and
fails after other queries ran).  A mapInPandas node needs no
extraction, composes under Generate/explode, and works identically in
batch and streaming plans.

NOTE: no ``from __future__ import annotations`` here — mapInPandas
infers the eval type from REAL type hints.
"""

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql.types import StructField, StructType

_MERSENNE = (1 << 31) - 1

_SIG_ROW_FNS: dict = {}
_SIMHASH_ROW_FN: list = []


def attach_kernel_column(df, carry, input_expr, out_field: StructField, row_fn):
    """``df.select(*carry, row_fn(input_expr) AS out_field.name)`` with
    the row function evaluated in ONE mapInPandas pass: ``input_expr``
    is computed JVM-side into a temp column, only ``carry`` +- that
    input cross the Arrow boundary (guide §4.1: pass the columns the
    function needs, nothing else), and the output schema is
    ``carry + [out_field]``."""
    src = df.select(*carry, input_expr.alias("__kernel_in"))
    carry_fields = [src.schema[c] for c in carry]
    schema = StructType(carry_fields + [out_field])
    out_name = out_field.name

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[list(carry)].copy()
            out[out_name] = [row_fn(v) for v in pdf["__kernel_in"]]
            yield out

    return src.mapInPandas(run, schema)


def minhash_sig_row_fn(num_perm: int, seed: int, permutation_params):
    """Cached row kernel: list of shingle hashes (already mod p) ->
    int64 signature array = per-permutation min of (a*x + b) mod p.
    Exact int64 arithmetic: a, x < 2^31 so a*x + b < 2^62.  None ->
    None, empty -> [p]*num_perm (the Column fold's semantics)."""
    key = (num_perm, seed)
    fn = _SIG_ROW_FNS.get(key)
    if fn is None:
        params = permutation_params(num_perm, seed)
        A = np.array([a for a, _ in params], dtype=np.int64)
        B = np.array([b for _, b in params], dtype=np.int64)
        empty_sig = np.full(num_perm, _MERSENNE, dtype=np.int64)

        def fn(h):
            if h is None:
                return None
            if len(h) == 0:
                return empty_sig
            hh = np.asarray(h, dtype=np.int64)
            return ((hh[:, None] * A[None, :] + B[None, :]) % _MERSENNE).min(
                axis=0
            )

        _SIG_ROW_FNS[key] = fn
    return fn


def simhash_row_fn():
    """Cached row kernel: list of token hashes -> int64 SimHash
    fingerprint.  Exact twin of the original 64-wide aggregate/zip_with
    Column fold (votes = +1/-1 per bit per token, sign -> bit), i.e.
    bit b is set iff strictly more than half the token hashes have bit
    b set; an empty token list yields 0, None yields None."""
    if not _SIMHASH_ROW_FN:
        shifts = np.arange(64, dtype=np.uint64)

        def fn(h):
            if h is None:
                return None
            n = len(h)
            if n == 0:
                return 0
            hh = np.asarray(h, dtype=np.int64).astype(np.uint64)
            bits = (hh[:, None] >> shifts[None, :]) & np.uint64(1)
            votes = 2 * bits.sum(axis=0).astype(np.int64) - n
            word = np.uint64(0)
            for b in np.nonzero(votes > 0)[0]:
                word |= np.uint64(1) << np.uint64(b)
            return int(word.astype(np.int64))

        _SIMHASH_ROW_FN.append(fn)
    return _SIMHASH_ROW_FN[0]
