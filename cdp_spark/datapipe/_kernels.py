"""Vectorized Arrow kernels for the hash-fold primitives
(optimization r16).  The original formulations folded a num_perm-wide
(resp. 64-wide) lambda through Catalyst higher-order functions:
aggregate/zip_with bodies are evaluated INTERPRETED per array element,
allocating a fresh accumulator array per step — O(elements x width)
interpreted expression evaluations per document, measured as the
dominant cost of every minhash/simhash operator (guide §4.2:
hand whole batches to vectorized native kernels instead).  String
hashing stays JVM-side (md5/xxhash64, codegen); only the wide
arithmetic fold crosses to Arrow+numpy, as exact int64 math — results
are bit-identical (tests/test_round16_kernels.py).

NOTE: no ``from __future__ import annotations`` here — pandas_udf
infers the eval type from REAL type hints.

Every kernel is returned ``asNondeterministic()`` even though each is
a pure function: the optimizer fence (guide §4.4) stops (a)
CollapseProject inlining the UDF into a Generate's generator — where
ExtractPythonUDFs cannot extract it and execution dies with
"Cannot evaluate expression: PythonUDF" (measured on
candidate_pairs_from_signatures' explode) — and (b) pushed-down
filters duplicating the evaluation.  Determinism of RESULTS is
unaffected (fixed seeds, exact integer math).
"""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

_MERSENNE = (1 << 31) - 1

_SIG_KERNELS: dict = {}
_SIMHASH_KERNEL: list = []


def minhash_sig_kernel(num_perm: int, seed: int, permutation_params):
    """Cached pandas UDF: array<long> shingle hashes (already mod p)
    -> array<long> signature = per-permutation min of (a*x + b) mod p.
    Exact int64 arithmetic: a, x < 2^31 so a*x + b < 2^62."""
    key = (num_perm, seed)
    fn = _SIG_KERNELS.get(key)
    if fn is None:
        params = permutation_params(num_perm, seed)
        A = np.array([a for a, _ in params], dtype=np.int64)
        B = np.array([b for _, b in params], dtype=np.int64)
        empty_sig = np.full(num_perm, _MERSENNE, dtype=np.int64)

        @F.pandas_udf(ArrayType(LongType()))
        def sig(hashes: pd.Series) -> pd.Series:
            out = []
            for h in hashes:
                if h is None:
                    out.append(None)
                elif len(h) == 0:
                    out.append(empty_sig)
                else:
                    hh = np.asarray(h, dtype=np.int64)
                    out.append(
                        ((hh[:, None] * A[None, :] + B[None, :]) % _MERSENNE)
                        .min(axis=0)
                    )
            return pd.Series(out)

        fn = sig.asNondeterministic()
        _SIG_KERNELS[key] = fn
    return fn


def simhash_fp_kernel():
    """Cached pandas UDF: array<long> token hashes -> int64 SimHash
    fingerprint.  Exact twin of the original 64-wide aggregate/zip_with
    Column fold (votes = +1/-1 per bit per token, sign -> bit), i.e.
    bit b is set iff strictly more than half the token hashes have bit
    b set; an empty token array yields 0, NULL yields NULL."""
    if not _SIMHASH_KERNEL:
        shifts = np.arange(64, dtype=np.uint64)

        @F.pandas_udf(LongType())
        def fp(hashes: pd.Series) -> pd.Series:
            out = []
            for h in hashes:
                if h is None:
                    out.append(None)
                    continue
                n = len(h)
                if n == 0:
                    out.append(0)
                    continue
                hh = np.asarray(h, dtype=np.int64).astype(np.uint64)
                bits = (hh[:, None] >> shifts[None, :]) & np.uint64(1)
                votes = 2 * bits.sum(axis=0).astype(np.int64) - n
                word = np.uint64(0)
                for b in np.nonzero(votes > 0)[0]:
                    word |= np.uint64(1) << np.uint64(b)
                out.append(int(word.astype(np.int64)))
            return pd.Series(out, dtype="object")

        _SIMHASH_KERNEL.append(fp.asNondeterministic())
    return _SIMHASH_KERNEL[0]
