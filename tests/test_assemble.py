"""Conversation assembly vs a pandas oracle: turn order restored from
shuffled input, separators exact, nulls treated as empty turns."""

import numpy as np
import pyarrow as pa

from lingua_ray.stages.assemble import assemble_conversations


def test_assemble_matches_pandas(ray_session):
    import ray.data
    rng = np.random.default_rng(71)
    rows = []
    for conv in range(60):
        for turn in range(int(rng.integers(1, 9))):
            rows.append((conv, turn, f"c{conv}t{turn}"))
    rng.shuffle(rows)
    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.int64()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int64()),
        "text": pa.array([r[2] for r in rows]),
    })
    out = {r["conv_id"]: r for r in assemble_conversations(
        ray.data.from_arrow(t).repartition(7)).take_all()}
    df = t.to_pandas()
    for conv, g in df.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        assert out[conv]["text"] == "\n".join(g["text"])
        assert out[conv]["n_turns"] == len(g)


def test_assemble_null_turn(ray_session):
    import ray.data
    t = pa.table({"conv_id": pa.array([1, 1], pa.int64()),
                  "turn_idx": pa.array([1, 0], pa.int64()),
                  "text": pa.array(["b", None])})
    out = assemble_conversations(ray.data.from_arrow(t)).take_all()
    assert out[0]["text"] == "\nb"
