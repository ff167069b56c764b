"""Property-based tests (hypothesis) for the pure kernels whose
correctness the distributed operators inherit — the reference's
spot-check strategy (SURVEY.md §5) upgraded to generated inputs."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from mobility_lakehouse_project_spark.functions import imagecodec as ic
from mobility_lakehouse_project_spark.streaming.stateful import _fold
from mobility_lakehouse_project_spark.tableformat.distribute import (
    murmur3_long,
    slot_tokens,
)
from mobility_lakehouse_project_spark.tableformat.paths import (
    join_path,
    relativize,
)

_seg = st.text(
    alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz0123456789_-"),
    min_size=1, max_size=8,
)


@given(base_segs=st.lists(_seg, min_size=1, max_size=4),
       rel_segs=st.lists(_seg, min_size=1, max_size=4),
       scheme=st.sampled_from(["", "file:///", "s3a://bkt/", "hdfs://nn/"]))
@settings(max_examples=200)
def test_relativize_roundtrips_join(base_segs, rel_segs, scheme):
    """relativize(join(base, rel), base) == rel for every scheme."""
    base = (scheme or "/") + "/".join(base_segs)
    rel = "/".join(rel_segs)
    assert relativize(join_path(base, rel), base) == rel
    # the Spark case: input_file_name reports file:///abs while the
    # table location is the bare /abs
    if scheme == "file:///":
        bare = "/" + "/".join(base_segs)
        assert relativize(join_path(base, rel), bare) == rel


@given(st.lists(st.tuples(st.integers(0, 10_000), st.floats(0, 100)),
                min_size=0, max_size=60),
       st.integers(1, 50))
@settings(max_examples=200)
def test_stateful_fold_matches_naive_sessionizer(events, gap):
    """streaming.stateful._fold == a naive one-shot sessionizer, for any
    event multiset and gap — including fold INCREMENTALITY: folding the
    sorted events in two arbitrary splits gives the same sessions."""
    ts = sorted(t for t, _ in events)
    by_t = {}
    vals = []
    evs = sorted(events)
    ts = [t for t, _ in evs]
    vals = [v for _, v in evs]

    def naive():
        sessions = []
        cur = None
        for t, v in zip(ts, vals):
            if cur is None:
                cur = [t, t, 1, v]
            elif t - cur[1] > gap:
                sessions.append(tuple(cur))
                cur = [t, t, 1, v]
            else:
                cur[1], cur[2], cur[3] = t, cur[2] + 1, cur[3] + v
        return sessions, tuple(cur) if cur else (None, None, 0, 0.0)

    def fold_split(k):
        st_ = (None, None, 0, 0.0)
        closed = []
        for chunk in (evs[:k], evs[k:]):
            if not chunk:
                continue
            pdf = pd.DataFrame({
                "ts": pd.to_datetime([t for t, _ in chunk], unit="us"),
                "value": [v for _, v in chunk],
            })
            c, st_ = _fold(pdf, st_, gap)
            closed.extend(c)
        return closed, st_

    expect_closed, expect_open = naive()
    for k in (0, len(evs) // 2, len(evs)):
        closed, open_ = fold_split(k)
        got = [(a, b, n, round(tv, 9)) for a, b, n, tv in closed]
        want = [(a, b, n, round(tv, 9)) for a, b, n, tv in expect_closed]
        assert got == want
        if expect_open[0] is None:
            assert open_[0] is None
        else:
            assert (open_[0], open_[1], open_[2], round(open_[3], 9)) == (
                expect_open[0], expect_open[1], expect_open[2], round(expect_open[3], 9))


@given(st.integers(1, 400))
@settings(max_examples=30, deadline=None)
def test_slot_tokens_bijective_for_any_n(n):
    toks = slot_tokens(None, n)
    slots = murmur3_long(np.array(toks, dtype=np.int64)) % n
    assert sorted(slots.tolist()) == list(range(n))


@given(st.integers(0, 2**31), st.sampled_from([(8, 8), (16, 8), (32, 16)]),
       st.sampled_from(["raw", "png", "jpeg"]))
@settings(max_examples=60, deadline=None)
def test_codec_roundtrip_psnr_gate(i, wh, fmt):
    """encode->decode of any synthetic image: lossless fmts roundtrip
    exactly; jpeg stays above the 40dB gate and re-encoding is
    idempotent (the recompression invariant MERGE/compaction rely on)."""
    w, h = wh
    px = ic.synth_pixels(i, w, h)
    blob = ic.encode(px, fmt)
    dec = ic.decode(blob, w, h, fmt)
    if fmt in ("raw", "png"):
        assert (dec == px).all()
    else:
        assert ic.psnr(px, dec) >= 40.0
        # idempotent quantization: second roundtrip is pixel-exact
        assert (ic.decode(ic.encode(dec, "jpeg"), w, h, "jpeg") == dec).all()
    assert ic.regenerate_decoded(i, w, h, fmt).tobytes() == dec.tobytes()


def test_metadata_previous_versions_max(spark, tmp_table_dir):
    """write.metadata.previous-versions-max: version files older than
    the newest K previous are unlinked at commit; current state, time
    travel, and refs (all inside the current metadata) survive."""
    import glob
    import os

    from mobility_lakehouse_project_spark.tableformat import LakehouseTable

    df = spark.createDataFrame([(i,) for i in range(10)], "id long")
    t = LakehouseTable.create(
        tmp_table_dir, df.schema,
        properties={"write.metadata.previous-versions-max": "2"})
    first = None
    for _ in range(8):
        snap = t.append(df)
        first = first or snap.snapshot_id
    files = sorted(glob.glob(os.path.join(t.meta_dir, "v*.metadata.json")))
    assert len(files) == 3  # current + 2 previous
    assert t.scan(spark).count() == 80
    assert t.scan(spark, snapshot_id=first).count() == 10  # time travel OK
    # unset property -> versions accumulate again
    t.update_properties({"write.metadata.previous-versions-max": None})
    t.append(df)
    t.append(df)
    files2 = glob.glob(os.path.join(t.meta_dir, "v*.metadata.json"))
    assert len(files2) >= len(files) + 2


def test_dictionary_property_disables_dictionary(spark, tmp_table_dir):
    """write.parquet.dictionary-enabled=false: data files carry no
    dictionary-encoded pages (blob columns never dictionary-hit; the
    abandoned per-page dictionary build is pure CPU waste), and the
    scan roundtrip is unchanged."""
    import glob
    import os

    import pyarrow.parquet as pq

    from mobility_lakehouse_project_spark import synth
    from mobility_lakehouse_project_spark.tableformat import LakehouseTable

    df = synth.images_df(spark, 60, partitions=1)
    t = LakehouseTable.create(
        tmp_table_dir, df.schema,
        properties={"write.parquet.dictionary-enabled": "false"})
    t.append(df, n_files=1)
    files = glob.glob(os.path.join(t.data_dir, "**", "*.parquet"),
                      recursive=True)
    assert files
    for fp in files:
        md = pq.ParquetFile(fp).metadata
        for rg in range(md.num_row_groups):
            for ci in range(md.row_group(rg).num_columns):
                encs = md.row_group(rg).column(ci).encodings
                assert not any("DICTIONARY" in e for e in encs), (fp, encs)
    assert t.scan(spark).count() == 60
