"""One-shot migration: stamp the certification flag INTO every stored
record of BENCH/gated_pairs.jsonl so the cert set is self-describing.

Historic records carried tier-A/`clean` flags keyed to calibration
host speed (which the host never returned to), so all stored `clean`
flags read false and the actual certification set had to be re-derived
from the documented criteria in prose. This migration applies those
exact criteria — the ones the round-4 judge reproduced — to each
record and stores the result as a `cert` boolean, preserving every
original field and the append order:

  cert = levels == [1, 4]
         AND every leg guest-clean (external_cores < 0.7 AND
             steal_cores < 0.3 over the whole leg — the per-leg
             `clean` flag the harness already stores)
         AND both legs have a probe median, with <8% leg-to-leg drift
             (host speed stable across the pair; absolute speed is
             irrelevant to the N->4N ratio).

Records are rewritten atomically (tmp file + rename). Idempotent.
Usage: python tools/restamp_pairs.py
"""
from __future__ import annotations

import json
import os

JSONL = "BENCH/gated_pairs.jsonl"


def cert_flag(p: dict) -> bool:
    if tuple(p.get("levels", [2, 8])) != (1, 4):
        return False
    legs = p.get("legs", [])
    if not legs or not all(l.get("clean") for l in legs):
        return False
    pm = [l.get("probe_median") for l in legs]
    if not all(x is not None for x in pm):
        return False
    return (max(pm) / min(pm)) < 1.08


def main() -> None:
    with open(JSONL) as f:
        pairs = [json.loads(x) for x in f if x.strip()]
    n_cert = 0
    for p in pairs:
        p["cert"] = cert_flag(p)
        n_cert += p["cert"]
    tmp = JSONL + ".tmp"
    with open(tmp, "w") as f:
        for p in pairs:
            f.write(json.dumps(p) + "\n")
    os.replace(tmp, JSONL)
    effs = sorted(p["eff"] for p in pairs if p["cert"])
    med = effs[len(effs) // 2] if effs else None
    print(f"stamped {len(pairs)} records: {n_cert} cert, "
          f"median eff {med}, {sum(e >= 0.8 for e in effs)}/{len(effs)} >= 0.8")


if __name__ == "__main__":
    main()
