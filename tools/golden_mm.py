"""Golden constants for the mm_image_features oracle — computed WITHOUT
Spark: a plain numpy loop over the deterministic generative model
(synth.synth_batch + imagecodec), replicating what
operators/multimodal.validation_summary measures. Prints the VALUES SQL
to embed in plans/relational.py ORACLE_SQL["mm_image_features"].

The independence argument: the Spark query decodes the ACTUAL encoded
bytes flowing through mapInPandas/Arrow; this path regenerates and
aggregates in-process. Agreement proves the whole Spark plumbing chain
(synthesis -> encode -> Arrow batches -> decode -> aggregate) end to
end; the in-query regeneration cross-check additionally pins decode
against the generative model per row.

Usage: python tools/golden_mm.py [n_rows]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from mobility_lakehouse_project_spark import synth  # noqa: E402
from mobility_lakehouse_project_spark.functions import imagecodec as ic  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    pdf = synth.synth_batch(np.arange(n, dtype=np.int64), seed=42, dims=(8, 16, 32, 64))
    acc: dict[str, list[int]] = {}
    for i in range(n):
        w, h, fmt = int(pdf["w"][i]), int(pdf["h"][i]), pdf["fmt"][i]
        px = ic.decode(pdf["bytes"][i], w, h, fmt)
        regen = ic.regenerate_decoded(i, w, h, fmt)
        mism = int(ic.average_hash(px) != ic.average_hash(regen))
        viol = int(ic.psnr(px, ic.synth_pixels(i, w, h)) < 40.0)
        a = acc.setdefault(fmt, [0, 0, 0, 0])
        a[0] += 1
        a[1] += ic.luma_milli(px)
        a[2] += mism
        a[3] += viol
    rows = ",\n            ".join(
        f"('{fmt}', {a[0]}::BIGINT, {a[1]}::BIGINT, {a[2]}::BIGINT, {a[3]}::BIGINT)"
        for fmt, a in sorted(acc.items())
    )
    print(
        "        SELECT * FROM (VALUES\n"
        f"            {rows}\n"
        "        ) AS t(fmt, n_images, luma_milli_sum, n_ahash_mismatch, n_psnr_violations)\n"
        "        ORDER BY fmt"
    )


if __name__ == "__main__":
    main()
