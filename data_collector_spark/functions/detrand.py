"""Deterministic pseudo-random constants shared by Spark plans AND the
DuckDB oracle strings.

The sketch operators (MinHash permutations, SimHash, LSH hyperplane signs,
Bloom probes) need fixed "random" parameters that (a) never change between
runs and (b) can be embedded verbatim into the oracle SQL the driver
executes — so they are generated here with splitmix64 (public-domain
constants, Steele et al., "Fast Splittable Pseudorandom Number
Generators", OOPSLA 2014) instead of ``random``/``numpy.random`` state.
"""

from __future__ import annotations

_MASK = (1 << 64) - 1


def splitmix64(i: int, seed: int = 0) -> int:
    """The i-th splitmix64 output for a seed — pure function of (i, seed)."""
    x = (seed + (i + 1) * 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return (x ^ (x >> 31)) & _MASK


MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime): a*x+b stays < 2^62


def minhash_params(n_perm: int, seed: int = 7) -> list[tuple[int, int]]:
    """(a, b) per permutation for the universal hash (a*x + b) mod P,
    a in [1, P-1], b in [0, P-1]."""
    out = []
    for i in range(n_perm):
        a = splitmix64(2 * i, seed) % (MINHASH_P - 1) + 1
        b = splitmix64(2 * i + 1, seed) % MINHASH_P
        out.append((a, b))
    return out


def plane_signs(n_planes: int, dim: int, seed: int = 42) -> list[list[int]]:
    """±1 hyperplane entries for sign-LSH (Charikar, STOC 2002: random
    ±1 projections preserve cosine just like gaussians)."""
    return [
        [1 if splitmix64(p * dim + d, seed) & 1 else -1 for d in range(dim)]
        for p in range(n_planes)
    ]
