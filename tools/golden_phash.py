"""Golden constants for the img_phash_neardup oracle — computed WITHOUT
Spark: regenerate the deterministic corpus (600 base rows + 60 planted
near-dup variants), do the ALL-PAIRS popcount in numpy, and aggregate
per hamming distance. Prints the VALUES SQL to embed in
plans/relational.py ORACLE_SQL["img_phash_neardup"].

The independence argument: the Spark query finds pairs via pigeonhole
BAND BLOCKING + bit_count verify (operators/dedup.hamming_pairs) over
the distributed mapInPandas corpus; this path enumerates every pair
exhaustively in-process. Agreement proves the banding join loses no
pair (recall guarantee) and invents none (the bit_count verify), plus
the whole Arrow/synthesis plumbing.

Usage: python tools/golden_phash.py [n_rows] [step]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from mobility_lakehouse_project_spark import synth  # noqa: E402


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy<2 has no bitwise_count)."""
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    step = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    dims = (8, 16, 32, 64)
    base = synth.synth_batch(np.arange(n, dtype=np.int64), seed=42, dims=dims)
    var = synth.phash_variant_batch(
        np.arange(0, n, step, dtype=np.int64), seed=42, dims=dims
    )
    ids = np.array(list(base["image_id"]) + list(var["image_id"]))
    ph = np.concatenate(
        [base["phash"].to_numpy(), var["phash"].to_numpy()]
    ).view(np.uint64)
    m = len(ids)
    ii, jj = np.triu_indices(m, k=1)
    ham = popcount64(ph[ii] ^ ph[jj])
    keep = ham <= 3
    ii, jj, ham = ii[keep], jj[keep], ham[keep]
    # order each pair lexicographically by image_id, as the Spark join does
    a = np.where(ids[ii] < ids[jj], ids[ii], ids[jj])
    b = np.where(ids[ii] < ids[jj], ids[jj], ids[ii])
    rows = []
    for h in sorted(set(ham.tolist())):
        sel = ham == h
        rows.append(
            f"({h}::BIGINT, {int(sel.sum())}::BIGINT, "
            f"{len(set(a[sel].tolist()))}::BIGINT, "
            f"'{min(a[sel])}', '{max(b[sel])}')"
        )
    body = ",\n            ".join(rows)
    print(
        "        SELECT * FROM (VALUES\n"
        f"            {body}\n"
        "        ) AS t(hamming, n_pairs, n_left, min_ida, max_idb)\n"
        "        ORDER BY hamming"
    )


if __name__ == "__main__":
    main()
