"""Global ordered prefix sum (functions/prefix.py): must equal the
pandas sort+cumsum oracle for any range count / sample size, since
boundaries may only affect load balance, never values."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _make(n=500, seed=3):
    rng = np.random.RandomState(seed)
    keys = [f"k{int(i):06d}" for i in rng.permutation(n * 3)[:n]]
    vals = rng.randint(0, 1000, size=n).astype(np.int64)
    return pa.table({"key": pa.array(keys), "v": pa.array(vals)})


def _oracle(tbl: pa.Table) -> pd.DataFrame:
    df = tbl.to_pandas().sort_values("key", ignore_index=True)
    df["cum"] = df["v"].cumsum()
    return df


@pytest.mark.parametrize("n_ranges,sample", [(1, 4), (4, 8), (64, 64),
                                             (1000, 64)])
def test_global_cumsum_matches_oracle(ray_session, n_ranges, sample):
    import ray.data

    from lingua_ray.functions.prefix import global_cumsum

    tbl = _make()
    ds = ray.data.from_arrow(tbl).repartition(7)
    got = global_cumsum(ds, "key", "v", n_ranges=n_ranges,
                        sample_per_block=sample).to_pandas()
    got = got.sort_values("key", ignore_index=True)
    want = _oracle(tbl)
    assert len(got) == len(want)
    assert (got["key"].values == want["key"].values).all()
    assert (got["cum"].values == want["cum"].values).all()
    assert (got["v"].values == want["v"].values).all()


def test_global_cumsum_single_row(ray_session):
    import ray.data

    from lingua_ray.functions.prefix import global_cumsum

    ds = ray.data.from_arrow(pa.table({"key": ["only"], "v": [7]}))
    got = global_cumsum(ds, "key", "v").to_pandas()
    assert got["cum"].tolist() == [7]
