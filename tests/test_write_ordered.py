"""Two-phase order-restoring writer: output equals the groupby-based
restore_order path, with stable (conv_id, turn_idx) order per partition."""

import pyarrow.dataset as pads

from lingua_ray.pipelines.quality_filter import (PipelineOptions,
                                                 apply_stages, write_ordered)
from lingua_ray.sources.transcripts import ensure_transcripts


def test_write_ordered(ray_session, tmp_path):
    ray = ray_session
    turns = ensure_transcripts(tmp_path / "turns", n_turns=3000, seed=42,
                               n_shards=4)
    opts = PipelineOptions(langid_concurrency=2, num_output_partitions=8)
    ds = ray.data.read_parquet(str(turns))
    out_dir = tmp_path / "out"
    rows = write_ordered(apply_stages(ds, opts), str(out_dir), opts)
    assert rows == 3000

    files = sorted(out_dir.glob("part-*.parquet"))
    assert 1 <= len(files) <= 8
    seen_convs = set()
    total = 0
    for f in files:
        t = pads.dataset(str(f)).to_table()
        total += t.num_rows
        conv = t.column("conv_id").to_pylist()
        tix = t.column("turn_idx").to_pylist()
        last = {}
        for c, i in zip(conv, tix):
            if c in last:
                assert i > last[c]
            last[c] = i
        # each conversation must live wholly inside one partition
        assert not (set(conv) & seen_convs)
        seen_convs |= set(conv)
    assert total == 3000
