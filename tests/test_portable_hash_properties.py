"""Property-based cross-engine checks for the portable hash family
(text/dedup.py md5+LCG): the arithmetic must agree byte-for-byte
between a pure-Python reference, DuckDB SQL (the oracle engine), and
the constants module — over ARBITRARY unicode strings, not just the
test corpus. (The Spark side is proven equal to DuckDB end-to-end by
the gated t_minhash_lsh_dedup / t_simhash_near_pairs oracles.)"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from radiant_portal_pipeline_spark.text.dedup import (  # noqa: E402
    N_HASHES,
    PORTABLE_M,
    portable_coeffs,
)

_CON = duckdb.connect()

_TOKEN = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),  # no lone surrogates
    min_size=1,
    max_size=24,
)


def _py_md5_int48(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:12], 16)


def _py_minhash(s: str, i: int) -> int:
    a, b = portable_coeffs(i)
    return (a * (_py_md5_int48(s) % PORTABLE_M) + b) % PORTABLE_M


@settings(max_examples=150, deadline=None)
@given(_TOKEN, st.integers(min_value=0, max_value=N_HASHES - 1))
def test_minhash_permutation_matches_duckdb(token: str, i: int):
    a, b = portable_coeffs(i)
    (got,) = _CON.execute(
        f"""
        SELECT ({a} * (CAST(LIST_SUM(LIST_TRANSFORM(RANGE(0, 12),
            j -> (STRPOS('0123456789abcdef', SUBSTR(MD5(?), (j+1)::INT, 1)) - 1)
                 * POWER(16, 11 - j))) AS BIGINT) % {PORTABLE_M}) + {b})
             % {PORTABLE_M}
        """,
        [token],
    ).fetchone()
    assert int(got) == _py_minhash(token, i), token


@settings(max_examples=100, deadline=None)
@given(_TOKEN)
def test_simhash_bits_match_duckdb(token: str):
    """Bit i of a token's hash = bit i%4 of md5-hex nibble i//4 — the
    definition both engines' SimHash implementations share."""
    hexpfx = hashlib.md5(token.encode("utf-8")).hexdigest()[:16]
    py_bits = [
        (int(hexpfx[i // 4], 16) >> (i % 4)) & 1 for i in range(64)
    ]
    rows = _CON.execute(
        """
        SELECT u.i,
               ((STRPOS('0123456789abcdef', SUBSTR(SUBSTR(MD5(?), 1, 16),
                        (u.i // 4 + 1)::INT, 1)) - 1) >> (u.i % 4)::INT) & 1
        FROM UNNEST(RANGE(0, 64)) AS u(i) ORDER BY u.i
        """,
        [token],
    ).fetchall()
    assert [int(v) for _, v in rows] == py_bits, token


def test_portable_coeffs_are_nondegenerate():
    """Every permutation's multiplier must be nonzero mod the prime
    (a zero multiplier collapses the permutation to a constant)."""
    seen = set()
    for i in range(N_HASHES):
        a, b = portable_coeffs(i)
        assert 0 < a < PORTABLE_M and 0 <= b < PORTABLE_M
        seen.add((a, b))
    assert len(seen) == N_HASHES  # pairwise distinct maps
